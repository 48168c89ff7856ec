import jax
import jax.numpy as jnp
import numpy as np

from ode_rl_tpu.train.metrics import mse, per_frame_metrics, psnr, ssim


def test_identical_images():
    x = jax.random.uniform(jax.random.key(0), (2, 32, 32, 1)) * 255
    assert abs(float(ssim(x, x)) - 1.0) < 1e-5
    assert float(mse(x, x)) == 0.0


def test_ssim_decreases_with_noise():
    key = jax.random.key(1)
    x = jax.random.uniform(key, (2, 32, 32, 1)) * 255
    small = x + 5 * jax.random.normal(jax.random.key(2), x.shape)
    big = x + 60 * jax.random.normal(jax.random.key(3), x.shape)
    assert float(ssim(x, small)) > float(ssim(x, big))


def test_psnr_formula():
    x = jnp.zeros((1, 8, 8, 1))
    y = jnp.full((1, 8, 8, 1), 0.1)
    expected = 10 * np.log10(1.0 / 0.01)
    assert abs(float(psnr(x, y)) - expected) < 1e-4


def test_ssim_matches_scipy_gaussian_reference():
    """Cross-check against a direct NumPy implementation of the same
    formula (gaussian window σ=1.5, 11×11, no sample covariance)."""
    from scipy.ndimage import gaussian_filter

    rng = np.random.RandomState(0)
    x = rng.rand(40, 40).astype(np.float32) * 255
    y = (x + rng.randn(40, 40).astype(np.float32) * 20).clip(0, 255)

    def ref_ssim(a, b, data_range=255.0, sigma=1.5):
        filt = lambda im: gaussian_filter(im, sigma, truncate=3.5, mode="constant")
        pad = int(3.5 * sigma + 0.5)
        ux, uy = filt(a), filt(b)
        uxx, uyy, uxy = filt(a * a), filt(b * b), filt(a * b)
        vx, vy, vxy = uxx - ux * ux, uyy - uy * uy, uxy - ux * uy
        c1, c2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2
        s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
            (ux**2 + uy**2 + c1) * (vx + vy + c2))
        return s[pad:-pad, pad:-pad].mean()

    ours = float(ssim(x[None, :, :, None], y[None, :, :, None]))
    theirs = ref_ssim(x, y)
    assert abs(ours - theirs) < 5e-3


def test_per_frame_metrics_shapes():
    pred = jax.random.uniform(jax.random.key(0), (2, 4, 32, 32, 1))
    tgt = jax.random.uniform(jax.random.key(1), (2, 4, 32, 32, 1))
    m = per_frame_metrics(pred, tgt)
    assert m["mse"].shape == (4,)
    assert m["psnr"].shape == (4,)
    assert m["ssim"].shape == (4,)


def test_lpips_horizon_fn_in_eval_sweep():
    """The test() metric sweep computes a per-horizon LPIPS curve for the
    VidODE family (reference Vid-ODE/evaluate.py:22-68): enabled on
    'auto' for VidODE, off for ConvGRU, identical-frames → ~0, and a (T,)
    curve on grayscale (tiled to RGB) inputs."""
    from ode_rl_tpu.core.config import Config
    from ode_rl_tpu.train.loop import _make_lpips_horizon_fn

    assert _make_lpips_horizon_fn(Config({"model": "ConvGRU"})) is None
    fn = _make_lpips_horizon_fn(Config({"model": "VidODE"}))
    assert fn is not None

    pred = jax.random.uniform(jax.random.key(0), (2, 3, 32, 32, 1))
    gt = jax.random.uniform(jax.random.key(1), (2, 3, 32, 32, 1))
    curve = np.asarray(fn(pred, gt))
    assert curve.shape == (3,)
    assert np.isfinite(curve).all() and (curve > 0).all()
    same = np.asarray(fn(pred, pred))
    assert np.abs(same).max() < 1e-5

    # Explicit override beats the family default.
    assert _make_lpips_horizon_fn(
        Config({"model": "VidODE", "eval_lpips": False})) is None
    assert _make_lpips_horizon_fn(
        Config({"model": "ConvGRU", "eval_lpips": True})) is not None
