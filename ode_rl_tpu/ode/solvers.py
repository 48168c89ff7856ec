"""On-device ODE solver suite: euler, midpoint, rk4, adams, dopri5.

Replaces the reference's torchdiffeq dependency (the reference calls
``torchdiffeq.odeint`` with method ∈ {dopri5, euler, adams, rk4} at
/root/reference/modules/DiffEqSolver.py:9,45 and
/root/reference/Vid-ODE/models/ode_func.py:5; rtol/atol defaults 1e-4/1e-5).

TPU-first design, not a port:
  * the adaptive dopri5 stepper is a **bounded ``lax.scan``** over
    ``max_steps`` attempts with masked no-ops after completion — the whole
    solve compiles into one XLA program with a static trip count, so
    stepping never escapes to the host (the reference pays a Python→CUDA
    round-trip per RK stage);
  * gradients are exact backprop-through-the-solver (discrete adjoint),
    matching the reference semantics (it uses ``odeint``, not
    ``odeint_adjoint``); each step body is ``jax.checkpoint``-ed so the
    backward pass rematerializes stages instead of storing all of them;
  * requested output times are hit by quartic dense-output interpolation
    (see ode/interp.py), so the adaptive step sequence is unconstrained;
  * step acceptance is batch-wide: one scalar RMS error norm over the whole
    state (same policy as the reference's backend), which keeps control
    flow scalar and SPMD-friendly;
  * error control runs in fp32 even under bf16 state.

State ``y`` may be any pytree of arrays.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ode_rl_tpu.ode.interp import interp_eval, interp_fit

Pytree = Any
ODEFunc = Callable[[jnp.ndarray, Pytree], Pytree]

# Dormand–Prince 5(4) Butcher tableau (public constants).
_C = jnp.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0])
_A = [
    [],
    [1 / 5],
    [3 / 40, 9 / 40],
    [44 / 45, -56 / 15, 32 / 9],
    [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729],
    [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656],
    [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84],
]
_B = [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0]
_B_ERR = [  # b5 - b4: weights of the embedded error estimate
    35 / 384 - 5179 / 57600,
    0.0,
    500 / 1113 - 7571 / 16695,
    125 / 192 - 393 / 640,
    -2187 / 6784 + 92097 / 339200,
    11 / 84 - 187 / 2100,
    -1 / 40,
]
# Midpoint weights for the quartic dense-output fit (Shampine).
_C_MID = [
    0.5 * 6025192743 / 30085553152,
    0.0,
    0.5 * 51252292925 / 65400821598,
    0.5 * -2691868925 / 45128329728,
    0.5 * 187940372067 / 1594534317056,
    0.5 * -1776094331 / 19743644256,
    0.5 * 11237099 / 235043384,
]

_SAFETY = 0.9
_IFACTOR = 10.0
_DFACTOR = 0.2
_ORDER = 5.0


class ODEStats(NamedTuple):
    nfe: jnp.ndarray        # number of dynamics-function evaluations
    naccept: jnp.ndarray    # accepted steps
    nreject: jnp.ndarray    # rejected steps
    converged: jnp.ndarray  # True iff t reached ts[-1] within max_steps


def _tree_axpy(alpha, xs, y, scale=None):
    """y + scale * sum(w_i * x_i); statically-zero weights are elided."""
    def leaf(yl, *xls):
        acc = None
        for w, xl in zip(alpha, xls):
            if isinstance(w, (int, float)) and w == 0.0:
                continue  # statically-zero tableau entry
            acc = w * xl if acc is None else acc + w * xl
        if acc is None:
            return yl
        return yl + (acc if scale is None else scale * acc)
    return jax.tree_util.tree_map(leaf, y, *xs)


def _rms_norm(tree) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    total = sum(jnp.sum(jnp.square(l.astype(jnp.float32))) for l in leaves)
    n = sum(l.size for l in leaves)
    return jnp.sqrt(total / n)


def _error_ratio(err, y0, y1, rtol, atol) -> jnp.ndarray:
    def scaled(e, a, b):
        scale = atol + rtol * jnp.maximum(jnp.abs(a), jnp.abs(b))
        return (e / scale).astype(jnp.float32)
    return _rms_norm(jax.tree_util.tree_map(scaled, err, y0, y1))


def _initial_step(func, t0, y0, f0, rtol, atol) -> jnp.ndarray:
    """Hairer–Nørsett–Wanner automatic initial step size (2 extra evals)."""
    scale = jax.tree_util.tree_map(
        lambda y: atol + rtol * jnp.abs(y), y0)
    d0 = _rms_norm(jax.tree_util.tree_map(lambda y, s: y / s, y0, scale))
    d1 = _rms_norm(jax.tree_util.tree_map(lambda f, s: f / s, f0, scale))
    small = (d0 < 1e-5) | (d1 < 1e-5)
    h0 = jnp.where(small, 1e-6, 0.01 * d0 / jnp.maximum(d1, 1e-30))

    y1 = jax.tree_util.tree_map(lambda y, f: y + h0 * f, y0, f0)
    f1 = func(t0 + h0, y1)
    d2 = _rms_norm(
        jax.tree_util.tree_map(lambda a, b, s: (a - b) / s, f1, f0, scale)
    ) / h0
    d_max = jnp.maximum(d1, d2)
    h1 = jnp.where(
        d_max <= 1e-15,
        jnp.maximum(1e-6, h0 * 1e-3),
        (0.01 / d_max) ** (1.0 / _ORDER),
    )
    return jnp.minimum(100.0 * h0, h1)


def _dopri5_step(func, t, y, f0, dt):
    """One Dormand–Prince attempt. Returns (y1, f7, err, y_mid)."""
    ks = [f0]
    for i in range(1, 7):
        ti = t + _C[i] * dt
        yi = _tree_axpy(_A[i], ks, y, scale=dt)
        ks.append(func(ti, yi))
    y1 = _tree_axpy(_B, ks, y, scale=dt)   # == stage-7 state (FSAL)
    err = _tree_axpy(_B_ERR, ks,
                     jax.tree_util.tree_map(jnp.zeros_like, y), scale=dt)
    y_mid = _tree_axpy(_C_MID, ks, y, scale=dt)
    # Keep the scan carry in the state's compute dtype (dt is fp32, so the
    # axpy promotes under bf16 states; error stays fp32 for the norm).
    cast = lambda t: jax.tree_util.tree_map(
        lambda a, ref: a.astype(ref.dtype), t, y)
    return cast(y1), cast(ks[6]), err, cast(y_mid)


def _dopri5(func, y0, ts, rtol, atol, max_steps, first_step, remat):
    n_out = ts.shape[0]
    t0, t_end = ts[0], ts[-1]
    f0 = func(t0, y0)
    nfe0 = jnp.asarray(1, jnp.int32)
    if first_step is None:
        dt0 = _initial_step(func, t0, y0, f0, rtol, atol)
        nfe0 = nfe0 + 2
    else:
        dt0 = jnp.asarray(first_step, jnp.float32)
    # Never open with a step beyond the integration span (the HNW
    # heuristic knows nothing about t_end), and keep dt0 out of the
    # gradient graph like the in-loop controller.
    dt0 = jax.lax.stop_gradient(jnp.minimum(dt0, t_end - t0))

    # Output buffer; slot 0 is y0 by definition of the IVP.
    ys0 = jax.tree_util.tree_map(
        lambda y: jnp.zeros((n_out,) + y.shape, y.dtype).at[0].set(y), y0)

    def attempt(carry):
        t, y, f, dt, ys, nfe, nacc, nrej = carry
        dt_used = jnp.minimum(dt, t_end - t)
        dt_used = jnp.maximum(dt_used, 1e-12)
        # The controller is CONTROL FLOW, not a differentiable quantity:
        # step sizes/times carry no gradient (the loss depends on dt only
        # through which discrete steps were taken — same semantics as
        # torchdiffeq's backprop-through-accepted-steps). Differentiating
        # the dt←error-norm chain couples every step to every parameter
        # through clip/power/min ops whose partial derivatives blow up at
        # the clamp boundaries (ratio→0 gives d/dx x^{-1/5} → −∞; a 0·∞
        # from the untaken jnp.where branch then NaNs the whole backward).
        dt_used = jax.lax.stop_gradient(dt_used)
        y1, f7, err, y_mid = _dopri5_step(func, t, y, f, dt_used)
        ratio = jax.lax.stop_gradient(_error_ratio(err, y, y1, rtol, atol))
        accept = ratio <= 1.0

        # Dense-output fill for requested times inside the accepted span.
        t_new = t + dt_used
        coeffs = interp_fit(y, y1, y_mid, f, f7, dt_used)
        theta = jnp.clip((ts - t) / dt_used, 0.0, 1.0)
        fill = (ts > t) & (ts <= t_new + 1e-12) & accept

        def write(buf, a, b, c, d, e):
            # Evaluate the interpolant at every output fraction at once;
            # masked-select into the buffer (cheap vs one dynamics eval).
            vals = jax.vmap(
                lambda th: interp_eval((a, b, c, d, e), th))(theta)
            mask = fill.reshape((-1,) + (1,) * (buf.ndim - 1))
            return jnp.where(mask, vals.astype(buf.dtype), buf)

        ys = jax.tree_util.tree_map(write, ys, *coeffs)

        # Step-size controller (I-controller with safety clamps).
        factor = jnp.where(
            ratio <= 1e-10,
            _IFACTOR,
            jnp.clip(_SAFETY * jnp.maximum(ratio, 1e-10) ** (-1.0 / _ORDER),
                     _DFACTOR, _IFACTOR),  # max() keeps the untaken branch
        )                                  # finite (0^-0.2 = inf)
        factor = jnp.where(accept, factor, jnp.minimum(factor, 1.0))
        dt_next = dt_used * factor

        t = jnp.where(accept, t_new, t)
        y = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, b, a), y, y1)
        f = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, b, a), f, f7)
        nfe = nfe + jnp.asarray(6, jnp.int32)
        nacc = nacc + accept.astype(jnp.int32)
        nrej = nrej + (~accept).astype(jnp.int32)
        return (t, y, f, dt_next, ys, nfe, nacc, nrej)

    def body(carry, _):
        # The scan has a static trip count (max_steps); once the solve
        # reaches t_end the predicate is a SCALAR, so lax.cond actually
        # skips the six dynamics evaluations instead of masking them —
        # converged iterations cost ~nothing (batch-wide acceptance keeps
        # the predicate scalar by construction).
        active = carry[0] < t_end - 1e-12
        carry = jax.lax.cond(active, attempt, lambda c: c, carry)
        return carry, None

    if remat:
        body = jax.checkpoint(body)
    zero = jnp.asarray(0, jnp.int32)
    carry0 = (t0, y0, f0, dt0, ys0, nfe0, zero, zero)
    (t_f, y_f, _, _, ys, nfe, nacc, nrej), _ = jax.lax.scan(
        body, carry0, None, length=max_steps)
    # Graceful degradation on budget exhaustion: output slots the solve
    # never reached hold their zero initialization — hand those the final
    # carried state instead, so a truncated trajectory decodes to the
    # last reached frame rather than to zeros (and its gradient routes to
    # the real state, not to nothing).
    unreached = ts > t_f + 1e-12
    ys = jax.tree_util.tree_map(
        lambda buf, yf: jnp.where(
            unreached.reshape((-1,) + (1,) * (buf.ndim - 1)),
            yf.astype(buf.dtype)[None], buf),
        ys, y_f)
    stats = ODEStats(nfe=nfe, naccept=nacc, nreject=nrej,
                     converged=t_f >= t_end - 1e-10)
    return ys, stats


# ----------------------------- fixed-step ---------------------------------

def _fixed_grid(func, y0, ts, stepper, substeps):
    """Scan over the output grid, `substeps` equal micro-steps per interval."""
    def interval(y, t_pair):
        t_a, t_b = t_pair
        h = (t_b - t_a) / substeps

        def micro(y, i):
            t = t_a + i * h
            y_new = stepper(func, t, y, h)
            # keep the carry in the state's compute dtype (h is fp32)
            y_new = jax.tree_util.tree_map(
                lambda a, ref: a.astype(ref.dtype), y_new, y)
            return y_new, None

        y, _ = jax.lax.scan(micro, y, jnp.arange(substeps))
        return y, y

    _, ys_tail = jax.lax.scan(interval, y0, (ts[:-1], ts[1:]))
    ys = jax.tree_util.tree_map(
        lambda y, tail: jnp.concatenate([y[None], tail], axis=0), y0, ys_tail)
    evals = {"euler": 1, "midpoint": 2, "rk4": 4}
    n = (ts.shape[0] - 1) * substeps * evals.get(getattr(stepper, "_name", ""), 1)
    stats = ODEStats(
        nfe=jnp.asarray(n, jnp.int32),
        naccept=jnp.asarray((ts.shape[0] - 1) * substeps, jnp.int32),
        nreject=jnp.asarray(0, jnp.int32),
        converged=jnp.asarray(True),
    )
    return ys, stats


def _euler_step(func, t, y, h):
    f = func(t, y)
    return jax.tree_util.tree_map(lambda y, f: y + h * f, y, f)
_euler_step._name = "euler"


def _midpoint_step(func, t, y, h):
    f1 = func(t, y)
    y_mid = jax.tree_util.tree_map(lambda y, f: y + 0.5 * h * f, y, f1)
    f2 = func(t + 0.5 * h, y_mid)
    return jax.tree_util.tree_map(lambda y, f: y + h * f, y, f2)
_midpoint_step._name = "midpoint"


def _rk4_step(func, t, y, h):
    k1 = func(t, y)
    k2 = func(t + 0.5 * h, _tree_axpy([0.5 * h], [k1], y))
    k3 = func(t + 0.5 * h, _tree_axpy([0.5 * h], [k2], y))
    k4 = func(t + h, _tree_axpy([h], [k3], y))
    return _tree_axpy([h / 6, h / 3, h / 3, h / 6], [k1, k2, k3, k4], y)
_rk4_step._name = "rk4"


def _adams(func, y0, ts, substeps):
    """Explicit 4-step Adams–Bashforth on the (uniform) output grid with an
    RK4 bootstrap. Covers the reference's ``method='adams'`` config choice
    on its uniform ``arange(0,T)/T`` time grids."""
    h_all = ts[1:] - ts[:-1]

    def interval(carry, x):
        y, hist = carry           # hist: stacked last-4 f values, newest last
        t_a, h = x
        f = func(t_a, y)
        hist = jax.tree_util.tree_map(
            lambda s, fl: jnp.concatenate([s[1:], fl[None]], axis=0), hist, f)
        # AB4 weights (newest first: 55, -59, 37, -9) / 24
        def ab4(yl, sl):
            return yl + h * (55 * sl[3] - 59 * sl[2] + 37 * sl[1] - 9 * sl[0]) / 24
        y_ab = jax.tree_util.tree_map(ab4, y, hist)
        return (y_ab, hist), y_ab

    # Bootstrap: first 3 intervals with RK4 (also records their f values).
    ys = [y0]
    y = y0
    fs = []
    n_boot = min(3, ts.shape[0] - 1)
    for i in range(n_boot):
        fs.append(func(ts[i], y))
        y = _rk4_step(func, ts[i], y, h_all[i])
        ys.append(y)
    if ts.shape[0] - 1 > n_boot:
        pad = [fs[0]] * (4 - len(fs)) + fs
        hist0 = jax.tree_util.tree_map(
            lambda *leaves: jnp.stack(leaves), *pad[-4:])
        (_, _), ys_tail = jax.lax.scan(
            interval, (y, hist0), (ts[n_boot:-1], h_all[n_boot:]))
        full = jax.tree_util.tree_map(
            lambda *leaves: jnp.stack(leaves), *ys)
        ys_out = jax.tree_util.tree_map(
            lambda head, tail: jnp.concatenate([head, tail], axis=0),
            full, ys_tail)
    else:
        ys_out = jax.tree_util.tree_map(lambda *leaves: jnp.stack(leaves), *ys)
    stats = ODEStats(
        nfe=jnp.asarray((ts.shape[0] - 1) * 2, jnp.int32),
        naccept=jnp.asarray(ts.shape[0] - 1, jnp.int32),
        nreject=jnp.asarray(0, jnp.int32),
        converged=jnp.asarray(True),
    )
    return ys_out, stats


# ------------------------------- public API --------------------------------

def odeint_aux(
    func: ODEFunc,
    y0: Pytree,
    ts: jnp.ndarray,
    *,
    method: str = "dopri5",
    rtol: float = 1e-4,
    atol: float = 1e-5,
    max_steps: int = 256,
    substeps: int = 1,
    first_step: Optional[float] = None,
    remat: bool = True,
) -> Tuple[Pytree, ODEStats]:
    """Integrate ``dy/dt = func(t, y)`` from ``ts[0]``, reporting the
    solution at every ``ts[i]`` (time-leading axis) plus solver stats.

    Matches the reference backend's contract: ``ys[0] == y0``; ``ts`` must
    be increasing; gradients flow through the discrete solver steps.
    """
    ts = jnp.asarray(ts, jnp.float32)
    if ts.ndim != 1:
        raise ValueError("ts must be 1-D")
    if ts.shape[0] == 1:
        ys = jax.tree_util.tree_map(lambda y: y[None], y0)
        z = jnp.asarray(0, jnp.int32)
        return ys, ODEStats(z, z, z, jnp.asarray(True))

    if method == "dopri5":
        return _dopri5(func, y0, ts, rtol, atol, max_steps, first_step, remat)
    if method == "euler":
        return _fixed_grid(func, y0, ts, _euler_step, substeps)
    if method == "midpoint":
        return _fixed_grid(func, y0, ts, _midpoint_step, substeps)
    if method == "rk4":
        return _fixed_grid(func, y0, ts, _rk4_step, substeps)
    if method == "adams":
        return _adams(func, y0, ts, substeps)
    raise ValueError(f"unknown method {method!r} "
                     "(supported: dopri5, euler, midpoint, rk4, adams)")


@functools.wraps(odeint_aux)
def odeint(func, y0, ts, **kwargs):
    ys, _ = odeint_aux(func, y0, ts, **kwargs)
    return ys
