"""Numerics parity against the reference's OWN TensorFlow source
(/root/reference/ModelBasedRL_TF_V2 — the spatial-DreamerV2 fork).

TF 2.x is in this image, so tools.py / networks.py load directly with
three env shims, none of which touch the math under test:
  * tensorflow_probability is absent → a minimal tfd shim provides the
    BASE classes the reference subclasses at import time. The only shim
    class that executes in a test is Bernoulli, whose ``sample`` returns
    its probs — the same determinization trick the torch oracles use
    (_det_normal in test_reference_parity.py) so both sides evaluate
    identical deterministic dataflow.
  * tf.keras.mixed_precision.experimental was removed in TF 2.x →
    global_policy() shim returning compute_dtype float32.
  * classification_models.tfkeras (ResNet zoo) is absent → unused shim.

Oracles covered:
  * tools.lambda_return (+ static_scan)       ↔ wm/tools.lambda_return
  * tools.schedule                            ↔ wm/tools.schedule
  * networks.ConvGRUCell (spatial, no norm)   ↔ wm.spatial_rssm.TFConvGRUCell
  * networks.StochasticConvGRUCell (per-channel Bernoulli skip gates
    with cumulative update probability)       ↔ wm.spatial_rssm.StochasticConvGRUCell
"""

import importlib.util
import pathlib
import sys
import types

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax
import jax.numpy as jnp

REF = pathlib.Path("/root/reference/ModelBasedRL_TF_V2")


def _install_tfd_shim():
    if "tensorflow_probability" in sys.modules:
        return
    tfp = types.ModuleType("tensorflow_probability")
    tfd = types.ModuleType("tensorflow_probability.distributions")

    class _Base:
        def __init__(self, *a, **k):
            pass

    class Bernoulli(_Base):
        """Deterministic stand-in: sample ≡ probs (value-wise)."""

        def __init__(self, logits=None, probs=None, dtype=None):
            self._probs = probs if probs is not None else tf.sigmoid(logits)

        def probs_parameter(self):
            return self._probs

        def mode(self):
            return tf.cast(self._probs > 0.5, tf.float32)

        def sample(self, sample_shape=(), seed=None):
            return self._probs

    class Independent:
        def __init__(self, dist, n):
            self._dist = dist

        def sample(self, *a, **k):
            return self._dist.sample()

    for name in ("OneHotCategorical", "RelaxedOneHotCategorical", "Normal",
                 "TruncatedNormal", "Categorical", "MixtureSameFamily",
                 "BatchReshape"):
        setattr(tfd, name, type(name, (_Base,), {}))
    tfd.Bernoulli = Bernoulli
    tfd.Independent = Independent
    tfd.kl_divergence = None

    bij = types.ModuleType("tensorflow_probability.bijectors")
    bij.Bijector = type("Bijector", (), {"__init__": lambda self, **k: None})
    tfp.distributions = tfd
    tfp.bijectors = bij
    sys.modules["tensorflow_probability"] = tfp
    sys.modules["tensorflow_probability.distributions"] = tfd
    sys.modules["tensorflow_probability.bijectors"] = bij


def _install_misc_shims():
    import importlib

    mp = importlib.import_module("tensorflow.keras.mixed_precision")
    if not hasattr(mp, "experimental"):
        exp = types.ModuleType("tensorflow.keras.mixed_precision.experimental")
        exp.global_policy = lambda: types.SimpleNamespace(
            compute_dtype="float32")
        exp.LossScaleOptimizer = lambda opt, *a, **k: opt
        mp.experimental = exp
        sys.modules["tensorflow.keras.mixed_precision.experimental"] = exp
    layers_mod = importlib.import_module("tensorflow.keras.layers")
    if not hasattr(layers_mod, "AbstractRNNCell"):
        # Removed in Keras 3; the reference only uses it as a base class.
        layers_mod.AbstractRNNCell = layers_mod.Layer
    if "classification_models" not in sys.modules:
        cm = types.ModuleType("classification_models")
        tk = types.ModuleType("classification_models.tfkeras")
        tk.Classifiers = types.SimpleNamespace(get=lambda *a: (None, None))
        cm.tfkeras = tk
        sys.modules["classification_models"] = cm
        sys.modules["classification_models.tfkeras"] = tk


@pytest.fixture(scope="module")
def ref_tf():
    _install_tfd_shim()
    _install_misc_shims()
    sys.path.insert(0, str(REF))

    def load(name, rel):
        spec = importlib.util.spec_from_file_location(name, REF / rel)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    # networks.py does `import tools` — must resolve to the reference's.
    tools = load("tools", "tools.py")
    networks = load("ref_tf_networks", "networks.py")
    sys.path.remove(str(REF))
    return {"tools": tools, "networks": networks}


def test_lambda_return_vs_tf_reference(ref_tf):
    """λ-return (reference tools.py:564-586, via its static_scan) over
    both time axes, with scalar and per-step pcont."""
    from ode_rl_tpu.wm.tools import lambda_return

    rng = np.random.RandomState(0)
    t, b = 7, 3
    reward = rng.randn(t, b).astype(np.float32)
    value = rng.randn(t, b).astype(np.float32)
    pcont_arr = rng.rand(t, b).astype(np.float32)
    boot = rng.randn(b).astype(np.float32)

    for pcont in (0.97, pcont_arr):
        for lam in (0.0, 0.95, 1.0):
            ref = ref_tf["tools"].lambda_return(
                tf.constant(reward), tf.constant(value),
                pcont if isinstance(pcont, float) else tf.constant(pcont),
                tf.constant(boot), lam, axis=0).numpy()
            ours = np.asarray(lambda_return(
                jnp.asarray(reward), jnp.asarray(value),
                (pcont if isinstance(pcont, float)
                 else jnp.asarray(pcont)) * jnp.ones_like(reward),
                jnp.asarray(boot), lam, axis=0))
            np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)

    # batch-major (axis=1)
    ref = ref_tf["tools"].lambda_return(
        tf.constant(reward.T), tf.constant(value.T), 0.9,
        tf.constant(boot), 0.95, axis=1).numpy()
    ours = np.asarray(lambda_return(
        jnp.asarray(reward.T), jnp.asarray(value.T),
        0.9 * jnp.ones_like(reward.T), jnp.asarray(boot), 0.95, axis=1))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_schedule_vs_tf_reference(ref_tf):
    """Schedule specs (reference tools.py:817-843) at several steps."""
    from ode_rl_tpu.wm.tools import schedule

    for spec in ("0.3", "linear(1,0.1,100)", "warmup(50,2.0)",
                 "exp(1,0.05,30)", "horizon(5,50,200)"):
        for step in (0, 7, 49, 150, 1000):
            ref = float(ref_tf["tools"].schedule(spec, step))
            ours = float(schedule(spec, step))
            np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def _copy_conv(flax_kernel, flax_bias, keras_conv):
    """flax Conv (HWIO kernel) → Keras Conv2D (same layout)."""
    weights = [np.asarray(flax_kernel)]
    if flax_bias is not None:
        weights.append(np.asarray(flax_bias))
    keras_conv.set_weights(weights)


def test_tf_convgru_cell_vs_reference(ref_tf):
    """Spatial ConvGRU (reference networks.py:598-623): separate
    update/reset/out convs, candidate on [x, h·r], h' = z·cand+(1−z)·h,
    no normalization."""
    from ode_rl_tpu.wm.spatial_rssm import TFConvGRUCell

    s, cin, depth, b = 6, 4, 8, 2
    rng = np.random.RandomState(1)
    x = rng.randn(b, s, s, cin).astype(np.float32)
    h = rng.randn(b, s, s, depth).astype(np.float32)

    ours = TFConvGRUCell(hidden_dim=depth, kernel_size=3)
    params = ours.init(jax.random.key(0), jnp.asarray(h),
                       jnp.asarray(x))["params"]
    out_ours = np.asarray(ours.apply({"params": params}, jnp.asarray(h),
                                     jnp.asarray(x)))

    cell = ref_tf["networks"].ConvGRUCell(spatial=s, depth=depth, kernel=3)
    _ = cell(tf.constant(x), [tf.constant(h)])   # build weights
    for name, layer in (("update", cell._update), ("reset", cell._reset),
                        ("out", cell._out)):
        _copy_conv(params[name]["kernel"], params[name]["bias"], layer)
    out_ref, _ = cell(tf.constant(x), [tf.constant(h)])
    np.testing.assert_allclose(out_ours, out_ref.numpy(), rtol=1e-5,
                               atol=1e-5)


def test_stochastic_convgru_cell_vs_reference(ref_tf):
    """Skip-gate cell (reference networks.py:625-677): ConvGRU candidate,
    per-channel Dense gate head, cumulative skip probability
    u_sample·p̃ + (1−u_sample)·(u_prob + min(1−u_prob, p̃)), Bernoulli
    sample gating h̃ vs h per channel. Both sides run the deterministic
    sample≡probs path, so every tensor matches."""
    from ode_rl_tpu.wm.spatial_rssm import StochasticConvGRUCell

    s, cin, depth, b = 5, 3, 8, 2
    rng = np.random.RandomState(2)
    x = rng.randn(b, s, s, cin).astype(np.float32)
    h = rng.randn(b, s, s, depth).astype(np.float32)
    u_sample = (rng.rand(b, depth) > 0.5).astype(np.float32)
    u_prob = rng.rand(b, depth).astype(np.float32)

    ours = StochasticConvGRUCell(hidden_dim=depth, kernel_size=3)
    params = ours.init(jax.random.key(0), jnp.asarray(h),
                       jnp.asarray(u_sample), jnp.asarray(u_prob),
                       jnp.asarray(x), None)["params"]
    h_n, us_n, up_n, ul_n = ours.apply(
        {"params": params}, jnp.asarray(h), jnp.asarray(u_sample),
        jnp.asarray(u_prob), jnp.asarray(x), None)

    cell = ref_tf["networks"].StochasticConvGRUCell(spatial=s, depth=depth,
                                                    kernel=3)
    states = [tf.constant(h), tf.constant(u_sample), tf.constant(u_prob),
              tf.constant(np.zeros_like(u_prob))]
    _ = cell.call(tf.constant(x), states)        # build weights
    for name, layer in (("update", cell._update), ("reset", cell._reset),
                        ("out", cell._out)):
        _copy_conv(params[name]["kernel"], params[name]["bias"], layer)
    cell._update_u1.set_weights([np.asarray(params["update_u1"]["kernel"]),
                                 np.asarray(params["update_u1"]["bias"])])
    cell._update_u2.set_weights([np.asarray(params["update_u2"]["kernel"]),
                                 np.asarray(params["update_u2"]["bias"])])
    out_ref, (h_r, us_r, up_r, ul_r) = cell.call(tf.constant(x), states)

    np.testing.assert_allclose(np.asarray(h_n), h_r.numpy(), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(us_n), us_r.numpy(), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(up_n), up_r.numpy(), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ul_n), ul_r.numpy(), rtol=1e-5,
                               atol=1e-5)


@pytest.fixture(scope="module")
def ref_dv2_tools(ref_tf):
    """dreamerv2/tools.py (the CATER-classifier fork's tools) — same
    import surface as ModelBasedRL's, so the shims are already in."""
    dv2 = pathlib.Path("/root/reference/dreamerv2")
    spec = importlib.util.spec_from_file_location("ref_dv2_tools",
                                                  dv2 / "tools.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_dv2_tools"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_reference_map_metric_vs_tf_reference(ref_dv2_tools):
    """The reference's tools.mAP (dreamerv2/tools.py:355-377) is a
    running threshold-0.5 precision averaged over classes; our
    reference_map_precision must reproduce it exactly (single update)."""
    from ode_rl_tpu.wm.classifier import reference_map_precision

    rng = np.random.RandomState(5)
    b, c = 32, 14
    logits = (3.0 * rng.randn(b, c)).astype(np.float32)
    labels = (rng.rand(b, c) > 0.6).astype(np.float32)

    m = ref_dv2_tools.mAP(c, logits=True)
    m.update_state(tf.constant(labels), tf.constant(logits))
    ref = float(m.result())
    ours = float(reference_map_precision(jnp.asarray(logits),
                                         jnp.asarray(labels)))
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-7)
