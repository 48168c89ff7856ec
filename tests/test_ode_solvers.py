import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ode_rl_tpu.ode import odeint, odeint_aux


def exp_decay(t, y):
    return -y


TS = jnp.linspace(0.0, 2.0, 11)


@pytest.mark.parametrize(
    "method,tol",
    [("dopri5", 5e-5), ("rk4", 1e-5), ("midpoint", 5e-4),
     ("euler", 2e-2), ("adams", 5e-4)],
)
def test_closed_form_linear(method, tol):
    ys = odeint(exp_decay, jnp.ones((2, 3)), TS, method=method, substeps=4)
    exact = jnp.exp(-TS)[:, None, None]
    assert jnp.max(jnp.abs(ys - exact)) < tol


def test_dopri5_nonlinear_tight_tol():
    # dy/dt = y², y0 = 0.5 → y(t) = 1 / (2 - t)
    ts = jnp.linspace(0.0, 1.5, 7)
    ys, stats = odeint_aux(lambda t, y: y * y, jnp.array(0.5), ts,
                           method="dopri5", rtol=1e-6, atol=1e-8)
    exact = 1.0 / (2.0 - ts)
    assert jnp.max(jnp.abs(ys - exact)) < 1e-5
    assert bool(stats.converged)
    assert int(stats.nfe) > 0


def test_time_dependent_field():
    # dy/dt = t → y = y0 + t²/2 (exposes bugs that drop the t argument)
    ts = jnp.linspace(0.0, 1.0, 5)
    ys = odeint(lambda t, y: jnp.broadcast_to(t, y.shape), jnp.zeros(()), ts,
                method="dopri5", rtol=1e-7, atol=1e-9)
    assert jnp.max(jnp.abs(ys - ts**2 / 2)) < 1e-5


def test_first_output_is_y0():
    y0 = jnp.array([1.7, -0.3])
    ys = odeint(exp_decay, y0, TS)
    np.testing.assert_allclose(np.asarray(ys[0]), np.asarray(y0))


def test_gradient_wrt_params_matches_analytic():
    # y' = -a y ⇒ d y(T) / d a = -T y0 e^{-aT}
    def terminal(a):
        ys = odeint(lambda t, y: -a * y, jnp.array(1.0),
                    jnp.array([0.0, 1.0]), rtol=1e-7, atol=1e-9)
        return ys[-1]

    a = 0.7
    g = jax.grad(terminal)(jnp.array(a))
    assert abs(float(g) - (-np.exp(-a))) < 1e-4


def test_gradient_through_fixed_step():
    def terminal(a):
        ys = odeint(lambda t, y: -a * y, jnp.array(1.0),
                    jnp.array([0.0, 1.0]), method="rk4", substeps=20)
        return ys[-1]

    g = jax.grad(terminal)(jnp.array(0.7))
    assert abs(float(g) - (-np.exp(-0.7))) < 1e-4


def test_pytree_state():
    f = lambda t, y: {"a": -y["a"], "b": 2.0 * y["b"]}
    ys = odeint(f, {"a": jnp.ones(2), "b": jnp.ones(2)},
                jnp.linspace(0.0, 1.0, 5))
    assert abs(float(ys["a"][-1, 0]) - np.exp(-1)) < 1e-3
    assert abs(float(ys["b"][-1, 0]) - np.exp(2)) < 2e-3


def test_against_scipy_reference():
    """Numerics parity against an independent adaptive RK45 (stiff-ish
    nonlinear oscillator)."""
    from scipy.integrate import solve_ivp

    def field_np(t, y):
        return np.array([y[1], -np.sin(y[0]) - 0.1 * y[1]])

    def field_jax(t, y):
        return jnp.stack([y[1], -jnp.sin(y[0]) - 0.1 * y[1]])

    ts = np.linspace(0.0, 5.0, 11)
    ref = solve_ivp(field_np, (0, 5), [1.2, 0.0], t_eval=ts,
                    rtol=1e-8, atol=1e-10).y.T
    ys = odeint(field_jax, jnp.array([1.2, 0.0]), jnp.asarray(ts),
                method="dopri5", rtol=1e-6, atol=1e-8, max_steps=512)
    assert np.max(np.abs(np.asarray(ys) - ref)) < 1e-4


def test_single_time_point_returns_y0():
    ys, stats = odeint_aux(exp_decay, jnp.ones(3), jnp.array([0.3]))
    assert ys.shape == (1, 3)
    np.testing.assert_allclose(np.asarray(ys[0]), 1.0)


def test_max_steps_exhaustion_reports_nonconverged():
    ys, stats = odeint_aux(lambda t, y: y * y, jnp.array(0.5),
                           jnp.array([0.0, 1.0]), method="dopri5",
                           rtol=1e-10, atol=1e-12, max_steps=3)
    assert not bool(stats.converged)


def test_zero_error_field_has_finite_gradients():
    """Regression: a field with ~zero local error drives the controller's
    error ratio to 0, where the untaken jnp.where branch ratio**(-1/5)
    has an infinite derivative — gradients through the solve must stay
    finite (the controller is control flow, not a differentiable path)."""
    def loss(scale):
        # f ≡ scale · 0 — exactly representable, err = 0 every step.
        ys, _ = odeint_aux(lambda t, y: scale * jnp.zeros_like(y),
                           jnp.ones(4), jnp.linspace(0.0, 1.0, 5))
        return jnp.sum(ys) + scale

    g = jax.grad(loss)(jnp.array(1.0))
    assert np.isfinite(float(g))


def test_exhausted_solve_emits_last_state_not_zeros():
    """Budget-exhausted solves fill unreached output slots with the final
    carried state (graceful truncation) instead of zero initialization."""
    ys, stats = odeint_aux(lambda t, y: y * y, jnp.array(0.5),
                           jnp.linspace(0.0, 1.0, 6), method="dopri5",
                           rtol=1e-10, atol=1e-12, max_steps=3)
    assert not bool(stats.converged)
    assert float(ys[-1]) > 0.0  # last reached state, not the zero init


def test_jit_and_vmap_compose():
    f = lambda t, y: -y

    @jax.jit
    def solve(y0):
        return odeint(f, y0, jnp.linspace(0, 1, 4))

    batched = jax.vmap(solve)(jnp.ones((5, 2)))
    assert batched.shape == (5, 4, 2)


def test_nfe_scales_with_tolerance():
    f = lambda t, y: jnp.stack([y[1], -y[0]])
    y0 = jnp.array([1.0, 0.0])
    ts = jnp.linspace(0.0, 6.0, 4)
    _, loose = odeint_aux(f, y0, ts, rtol=1e-3, atol=1e-4)
    _, tight = odeint_aux(f, y0, ts, rtol=1e-8, atol=1e-10, max_steps=1024)
    assert int(tight.nfe) > int(loose.nfe)


# ------------------------- O(NFE) fast adjoint -----------------------------

@pytest.mark.slow
def test_fast_adjoint_matches_scan_solver():
    """The while_loop + custom-VJP solver (ode/fast.py) must match the
    differentiable-scan solver in both values and gradients."""
    from ode_rl_tpu.ode.fast import odeint_fast

    func = lambda t, y, p: -p * y + jnp.sin(3.0 * y)
    ts = jnp.linspace(0.0, 2.0, 9)
    y0 = jnp.linspace(0.5, 1.5, 8).reshape(2, 4)
    a = jnp.array(0.8)

    ys_fast, stats = odeint_fast(func, y0, ts, a, rtol=1e-6, atol=1e-8,
                                 max_steps=512)
    ys_ref = odeint(lambda t, y: func(t, y, a), y0, ts, rtol=1e-6,
                    atol=1e-8, max_steps=512)
    np.testing.assert_allclose(np.asarray(ys_fast), np.asarray(ys_ref),
                               atol=1e-6)
    assert bool(stats.converged)

    w = jnp.arange(1.0, 10.0)[:, None, None]

    def loss_fast(y0, p):
        ys, _ = odeint_fast(func, y0, ts, p, rtol=1e-6, atol=1e-8,
                            max_steps=512)
        return jnp.sum(jnp.sin(ys) * w)

    def loss_ref(y0, p):
        ys = odeint(lambda t, y: func(t, y, p), y0, ts, rtol=1e-6,
                    atol=1e-8, max_steps=512)
        return jnp.sum(jnp.sin(ys) * w)

    gf = jax.jit(jax.grad(loss_fast, argnums=(0, 1)))(y0, a)
    gr = jax.grad(loss_ref, argnums=(0, 1))(y0, a)
    np.testing.assert_allclose(np.asarray(gf[0]), np.asarray(gr[0]),
                               atol=1e-4)
    np.testing.assert_allclose(float(gf[1]), float(gr[1]), rtol=1e-5)


def test_fast_adjoint_truncated_solve_grad_matches_scan():
    """Budget-exhausted solves: the forward hands unreached output slots
    the final carried state, so those slots' cotangents must flow into
    the state gradient. Regression for the round-2 bug where the fast
    path's ct_y_end stayed zero and truncated frames silently got zero
    gradient (diverging from the AD-differentiated scan solver)."""
    from ode_rl_tpu.ode.fast import odeint_fast

    func = lambda t, y, p: p * y * y
    ts = jnp.linspace(0.0, 1.0, 6)
    y0 = jnp.array([0.4, 0.6])
    a = jnp.array(1.0)
    # Tight tolerance + tiny budget forces truncation mid-span.
    kw = dict(rtol=1e-10, atol=1e-12, max_steps=3)

    _, stats = odeint_fast(func, y0, ts, a, **kw)
    assert not bool(stats.converged)

    # Weight ONLY the tail slots so the whole gradient rides the
    # unreached-slot path.
    w = (jnp.arange(6) >= 3).astype(jnp.float32)[:, None]

    def loss_fast(y0, p):
        ys, _ = odeint_fast(func, y0, ts, p, **kw)
        return jnp.sum(ys * w)

    def loss_ref(y0, p):
        ys = odeint(lambda t, y: func(t, y, p), y0, ts, **kw)
        return jnp.sum(ys * w)

    gf = jax.grad(loss_fast, argnums=(0, 1))(y0, a)
    gr = jax.grad(loss_ref, argnums=(0, 1))(y0, a)
    assert float(jnp.abs(gf[0]).sum()) > 0  # not silently zero
    np.testing.assert_allclose(np.asarray(gf[0]), np.asarray(gr[0]),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(gf[1]), float(gr[1]),
                               rtol=1e-4, atol=1e-6)


def test_fast_adjoint_pytree_params():
    from ode_rl_tpu.ode.fast import odeint_fast

    func = lambda t, y, p: p["a"] * y + p["b"]
    params = {"a": jnp.array(-0.5), "b": jnp.array(0.2)}
    ts = jnp.linspace(0.0, 1.0, 5)

    def loss(p):
        ys, _ = odeint_fast(func, jnp.ones(3), ts, p)
        return jnp.sum(ys)

    g = jax.grad(loss)(params)
    assert np.isfinite(float(g["a"])) and abs(float(g["a"])) > 0
    assert np.isfinite(float(g["b"])) and abs(float(g["b"])) > 0


def test_fast_windowed_fill_dense_output_grid():
    """Window-cap regime of the O(NFE·W) fill (ode/fast.py _FILL_W): at
    loose tolerance a single accepted step would span many output slots;
    dt must cap at the window edge and every one of a DENSE output grid
    still gets a correct interpolated value (oracle: the analytic
    solution of dy/dt = -a·y), with finite, accurate gradients."""
    from ode_rl_tpu.ode.fast import odeint_fast

    a = jnp.array(1.3)
    func = lambda t, y, p: -p * y
    ts = jnp.linspace(0.0, 2.0, 33)        # dense grid, loose tol
    y0 = jnp.array([1.0, 0.5])

    ys, stats = odeint_fast(func, y0, ts, a, rtol=1e-3, atol=1e-6,
                            max_steps=256)
    exact = y0[None] * jnp.exp(-a * ts)[:, None]
    np.testing.assert_allclose(np.asarray(ys), np.asarray(exact),
                               rtol=2e-3, atol=1e-5)
    assert bool(stats.converged)

    # d/da sum(y(t)) = sum(-t · y(t)) analytically.
    g = jax.grad(lambda p: jnp.sum(
        odeint_fast(func, y0, ts, p, rtol=1e-3, atol=1e-6,
                    max_steps=256)[0]))(a)
    g_exact = float(jnp.sum(-ts[:, None] * exact))
    np.testing.assert_allclose(float(g), g_exact, rtol=5e-3)


def test_fast_windowed_fill_dense_grid_small_budget():
    """The fill window widens with n_out so the dt cap never exhausts a
    small step budget on dense output grids: 200 output points with
    max_steps=48 must still converge (with _FILL_W fixed at 4 this would
    need ≥50 accepted steps and silently truncate)."""
    from ode_rl_tpu.ode.fast import odeint_fast

    a = jnp.array(0.9)
    func = lambda t, y, p: -p * y
    ts = jnp.linspace(0.0, 1.0, 200)
    y0 = jnp.array([1.0])
    ys, stats = odeint_fast(func, y0, ts, a, rtol=1e-4, atol=1e-6,
                            max_steps=48)
    assert bool(stats.converged), int(stats.naccept)
    exact = y0[None] * jnp.exp(-a * ts)[:, None]
    np.testing.assert_allclose(np.asarray(ys), np.asarray(exact),
                               rtol=2e-3, atol=1e-5)
