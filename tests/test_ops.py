import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ode_rl_tpu.ops import channelnorm, correlation, grid_sample, resample2d
from ode_rl_tpu.ops.gru_gates import fused_gru_blend, fused_gru_gates


# ------------------------------ channelnorm -------------------------------

def test_channelnorm_matches_formula():
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 16))
    out = channelnorm(x, impl="xla")
    ref = jnp.linalg.norm(x, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)


def test_channelnorm_pallas_interpret_matches_xla():
    x = jax.random.normal(jax.random.key(1), (2, 8, 16, 8))
    np.testing.assert_allclose(
        np.asarray(channelnorm(x, impl="interpret")),
        np.asarray(channelnorm(x, impl="xla")), rtol=1e-5)


# ------------------------------- warping ----------------------------------

def test_resample2d_zero_flow_is_identity():
    img = jax.random.uniform(jax.random.key(0), (2, 16, 16, 3))
    flow = jnp.zeros((2, 16, 16, 2))
    np.testing.assert_allclose(np.asarray(resample2d(img, flow)),
                               np.asarray(img), atol=1e-6)


def test_resample2d_integer_shift():
    img = jax.random.uniform(jax.random.key(0), (1, 8, 8, 1))
    flow = jnp.full((1, 8, 8, 2), 0.0).at[..., 0].set(1.0)  # u=+1 → sample x+1
    out = resample2d(img, flow)
    np.testing.assert_allclose(np.asarray(out[0, :, :-1, 0]),
                               np.asarray(img[0, :, 1:, 0]), atol=1e-6)
    # border clamp on the last column
    np.testing.assert_allclose(np.asarray(out[0, :, -1, 0]),
                               np.asarray(img[0, :, -1, 0]), atol=1e-6)


def test_resample2d_subpixel_bilinear():
    img = jnp.arange(16.0).reshape(1, 1, 16, 1).repeat(4, axis=1)
    flow = jnp.zeros((1, 4, 16, 2)).at[..., 0].set(0.5)
    out = resample2d(img, flow)
    # sampling a linear ramp at +0.5 gives the midpoint values
    np.testing.assert_allclose(np.asarray(out[0, 0, :-1, 0]),
                               np.arange(15) + 0.5, atol=1e-5)


def test_grid_sample_identity_grid():
    img = jax.random.uniform(jax.random.key(2), (2, 12, 12, 3))
    h = w = 12
    # align_corners=False identity grid: centers of pixels
    xs = (jnp.arange(w) + 0.5) * 2.0 / w - 1.0
    ys = (jnp.arange(h) + 0.5) * 2.0 / h - 1.0
    grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)
    grid = jnp.broadcast_to(grid, (2, h, w, 2))
    np.testing.assert_allclose(np.asarray(grid_sample(img, grid)),
                               np.asarray(img), atol=1e-5)


def test_grid_sample_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    img = rng.rand(2, 3, 10, 14).astype(np.float32)          # NCHW for torch
    grid = (rng.rand(2, 10, 14, 2).astype(np.float32) - 0.5) * 2.2  # beyond border

    ref = F.grid_sample(torch.from_numpy(img), torch.from_numpy(grid),
                        padding_mode="border", align_corners=False).numpy()
    ours = grid_sample(jnp.asarray(img.transpose(0, 2, 3, 1)),
                       jnp.asarray(grid))
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), ref,
                               atol=1e-5)


def test_warp_is_differentiable():
    img = jax.random.uniform(jax.random.key(3), (1, 8, 8, 1))

    def loss(flow):
        return jnp.sum(resample2d(img, flow) ** 2)

    g = jax.grad(loss)(jnp.full((1, 8, 8, 2), 0.3))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


# ----------------------------- correlation --------------------------------

def _corr_numpy(f1, f2, d, stride):
    b, h, w, c = f1.shape
    n = 2 * d // stride + 1
    f2p = np.pad(f2, ((0, 0), (d, d), (d, d), (0, 0)))
    out = np.zeros((b, h, w, n * n), f1.dtype)
    for i in range(n * n):
        dy, dx = (i // n) * stride, (i % n) * stride
        win = f2p[:, dy:dy + h, dx:dx + w]
        out[..., i] = (f1 * win).mean(-1)
    return out


def test_correlation_xla_matches_numpy():
    rng = np.random.RandomState(0)
    f1 = rng.randn(2, 6, 6, 4).astype(np.float32)
    f2 = rng.randn(2, 6, 6, 4).astype(np.float32)
    out = correlation(jnp.asarray(f1), jnp.asarray(f2), max_displacement=2,
                      stride=1, impl="xla")
    np.testing.assert_allclose(np.asarray(out), _corr_numpy(f1, f2, 2, 1),
                               rtol=1e-5, atol=1e-6)


def test_correlation_pallas_interpret_matches_xla():
    rng = np.random.RandomState(1)
    f1 = jnp.asarray(rng.randn(2, 8, 8, 8).astype(np.float32))
    f2 = jnp.asarray(rng.randn(2, 8, 8, 8).astype(np.float32))
    a = correlation(f1, f2, max_displacement=4, stride=2, impl="interpret")
    b = correlation(f1, f2, max_displacement=4, stride=2, impl="xla")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-6)


def test_correlation_finds_known_shift():
    """With f2 a shifted copy of f1, the cost volume must peak at that
    displacement (Cauchy–Schwarz: f·f ≥ f·g pointwise)."""
    f1 = jax.random.normal(jax.random.key(0), (1, 10, 10, 16))
    dy0, dx0 = 1, 2
    # f2 shifted so that f2[y + dy0, x + dx0] == f1[y, x]
    f2 = jnp.roll(jnp.roll(f1, dy0, axis=1), dx0, axis=2)
    out = correlation(f1, f2, max_displacement=2, stride=1, impl="xla")
    n = 5
    expected = (dy0 + 2) * n + (dx0 + 2)
    inner = np.asarray(out[0, 3:-3, 3:-3])  # away from padding/roll wrap
    assert (inner.argmax(-1) == expected).all()


# ------------------------------ gru gates ---------------------------------

def test_fused_gates_interpret_matches_xla():
    rng = jax.random.key(0)
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    c = 32
    gates_raw = jax.random.normal(k1, (2, 8, 8, 2 * c))
    h = jax.random.normal(k2, (2, 8, 8, c))
    scale = jax.random.uniform(k3, (2 * c,), minval=0.5, maxval=1.5)
    bias = jax.random.normal(k4, (2 * c,)) * 0.1
    za, rha = fused_gru_gates(gates_raw, h, scale, bias, groups=2,
                              impl="interpret")
    zb, rhb = fused_gru_gates(gates_raw, h, scale, bias, groups=2, impl="xla")
    np.testing.assert_allclose(np.asarray(za), np.asarray(zb), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rha), np.asarray(rhb), atol=1e-5)


def test_fused_blend_interpret_matches_xla():
    rng = jax.random.key(5)
    k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
    c = 32
    cand_raw = jax.random.normal(k1, (2, 8, 8, c))
    z = jax.nn.sigmoid(jax.random.normal(k2, (2, 8, 8, c)))
    h = jax.random.normal(k3, (2, 8, 8, c))
    scale = jax.random.uniform(k4, (c,), minval=0.5, maxval=1.5)
    bias = jax.random.normal(k5, (c,)) * 0.1
    a = fused_gru_blend(cand_raw, z, h, scale, bias, groups=1,
                        impl="interpret")
    b = fused_gru_blend(cand_raw, z, h, scale, bias, groups=1, impl="xla")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_fused_gates_match_flax_groupnorm():
    """The fused op must reproduce flax GroupNorm + sigmoid semantics."""
    import flax.linen as nn

    c = 32
    x = jax.random.normal(jax.random.key(1), (2, 8, 8, 2 * c))
    h = jax.random.normal(jax.random.key(2), (2, 8, 8, c))
    gn = nn.GroupNorm(num_groups=2)
    params = gn.init(jax.random.key(3), x)
    ref = jax.nn.sigmoid(gn.apply(params, x))
    z_ref, r_ref = jnp.split(ref, 2, axis=-1)

    scale = params["params"]["scale"]
    bias = params["params"]["bias"]
    z, rh = fused_gru_gates(x, h, scale, bias, groups=2, impl="xla")
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rh), np.asarray(r_ref * h),
                               atol=1e-5)


# --------------------------- gradients through ops ------------------------

def test_correlation_gradient_matches_xla():
    f1 = jax.random.normal(jax.random.key(0), (1, 6, 6, 4))
    f2 = jax.random.normal(jax.random.key(1), (1, 6, 6, 4))

    def loss(impl):
        return lambda a, b: jnp.sum(
            correlation(a, b, max_displacement=2, stride=1, impl=impl) ** 2)

    g_int = jax.grad(loss("interpret"), argnums=(0, 1))(f1, f2)
    g_xla = jax.grad(loss("xla"), argnums=(0, 1))(f1, f2)
    for a, b in zip(g_int, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_channelnorm_gradient():
    x = jax.random.normal(jax.random.key(2), (1, 8, 8, 8)) + 2.0
    g_int = jax.grad(lambda x: jnp.sum(channelnorm(x, impl="interpret")))(x)
    g_xla = jax.grad(lambda x: jnp.sum(channelnorm(x, impl="xla")))(x)
    np.testing.assert_allclose(np.asarray(g_int), np.asarray(g_xla), atol=1e-5)


def test_channelnorm_gradient_finite_at_zero():
    """Regression: exactly-zero pixels (MNIST background through the
    FlowNet2 brightness-error stacking) must not NaN the backward —
    plain AD of sqrt(sum x²) gives 0/0 there; the hand-written VJP
    uses the 0 subgradient. This NaN'd a full FlowNet2 training run."""
    x = jnp.zeros((1, 4, 4, 3))
    for impl in ("xla", "interpret"):
        g = jax.grad(lambda x, i=impl: jnp.sum(channelnorm(x, impl=i)))(x)
        assert np.isfinite(np.asarray(g)).all()
    # Mixed case: one zero pixel inside an otherwise-normal image keeps
    # the nonzero-pixel gradients exact.
    y = jax.random.normal(jax.random.key(3), (1, 4, 4, 3)) + 2.0
    y = y.at[0, 0, 0].set(0.0)
    g = jax.grad(lambda y: jnp.sum(channelnorm(y, impl="xla")))(y)
    assert np.isfinite(np.asarray(g)).all()
    norm = np.sqrt((np.asarray(y) ** 2).sum(-1, keepdims=True))
    expect = np.where(norm > 0, np.asarray(y) / np.maximum(norm, 1e-12), 0.0)
    np.testing.assert_allclose(np.asarray(g), expect, atol=1e-5)


def test_fused_gates_gradient():
    c = 16
    gates_raw = jax.random.normal(jax.random.key(0), (1, 8, 8, 2 * c))
    h = jax.random.normal(jax.random.key(1), (1, 8, 8, c))
    scale = jnp.ones(2 * c)
    bias = jnp.zeros(2 * c)

    def loss(impl):
        def f(g, hh, s, b):
            z, rh = fused_gru_gates(g, hh, s, b, groups=1, impl=impl)
            return jnp.sum(z * rh)
        return f

    g_int = jax.grad(loss("interpret"), argnums=(0, 1, 2, 3))(
        gates_raw, h, scale, bias)
    g_xla = jax.grad(loss("xla"), argnums=(0, 1, 2, 3))(
        gates_raw, h, scale, bias)
    for a, b in zip(g_int, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


# ------------------------------ conv3x3 ------------------------------------

def test_conv3x3_module_params_interchange_with_nn_conv():
    """Conv3x3 defines the same param tree ('kernel' HWIO + 'bias') as
    nn.Conv, so checkpoints interchange freely, and its default (XLA)
    path computes the identical conv."""
    import flax.linen as nn
    from ode_rl_tpu.nn.conv_stacks import Conv3x3

    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 4))
    ours = Conv3x3(features=6)
    ref = nn.Conv(6, (3, 3), padding=1)
    p_ours = ours.init(jax.random.key(1), x)
    p_ref = ref.init(jax.random.key(1), x)
    assert (jax.tree_util.tree_structure(p_ours)
            == jax.tree_util.tree_structure(p_ref))
    # swap params across implementations: outputs must agree
    np.testing.assert_allclose(
        np.asarray(ours.apply(p_ref, x)), np.asarray(ref.apply(p_ref, x)),
        atol=1e-5)


def test_conv3x3_same_matches_lax_conv_and_grads():
    from ode_rl_tpu.ops.conv3x3 import conv3x3_same

    x = jax.random.normal(jax.random.key(0), (2, 6, 6, 4))
    w = jax.random.normal(jax.random.key(1), (3, 3, 4, 8)) * 0.1
    b = jax.random.normal(jax.random.key(2), (8,))
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    np.testing.assert_allclose(np.asarray(conv3x3_same(x, w, b)),
                               np.asarray(ref), atol=1e-5)

    g = jax.grad(lambda xx: jnp.sum(conv3x3_same(xx, w, b) ** 2))(x)
    gr = jax.grad(lambda xx: jnp.sum((jax.lax.conv_general_dilated(
        xx, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr), atol=1e-4)
