"""Numerics parity against the REFERENCE'S OWN SOURCE.

These tests import the actual modules from /root/reference (file-level
importlib load with a skimage shim — skimage/torchdiffeq are not in this
image) and assert our flax modules produce identical outputs under
identical weights. This replaces hand-written torch replicas as the
oracle (VERDICT round-1 weakness #9): the code being compared against is
the reference's, byte for byte.

Covered oracles:
  * modules/ConvGRUCell.py  — fused gate conv + GroupNorm GRU update
  * modules/ODEConvGRUCell.py — backward Euler+GRU z0 inference incl. the
    -0.01 bootstrap-dt quirk and the (mu, |std|) head
  * helpers/utils.create_convnet via modules/DiffEqSolver.ODEFunc — the
    ODE dynamics field
"""

import importlib.util
import pathlib
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

REF = pathlib.Path("/root/reference")


@pytest.fixture(scope="module")
def ref_modules():
    """Load the reference modules directly from /root/reference with the
    minimal import shims the env requires (skimage absent; torchdiffeq
    absent — only needed by DiffEqSolver.forward, which we don't call)."""
    if "skimage" not in sys.modules:
        sk = types.ModuleType("skimage")
        met = types.ModuleType("skimage.metrics")
        met.structural_similarity = lambda *a, **k: 0.0
        sk.metrics = met
        sys.modules["skimage"] = sk
        sys.modules["skimage.metrics"] = met
    if "torchdiffeq" not in sys.modules:
        td = types.ModuleType("torchdiffeq")
        td.odeint = None  # imported by DiffEqSolver.py, unused here
        sys.modules["torchdiffeq"] = td
    sys.path.insert(0, str(REF))

    def load(name, rel):
        spec = importlib.util.spec_from_file_location(name, REF / rel)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    mods = {
        "cgru": load("ref_convgrucell", "modules/ConvGRUCell.py"),
        "ode_cgru": load("ref_odeconvgrucell", "modules/ODEConvGRUCell.py"),
        "solver": load("ref_diffeqsolver", "modules/DiffEqSolver.py"),
        "utils": load("ref_helpers_utils", "helpers/utils.py"),
    }
    sys.path.remove(str(REF))
    return mods


def _t(x):  # NHWC numpy → NCHW torch
    return torch.from_numpy(np.moveaxis(np.asarray(x), -1, 1).copy())


def _copy_cell_weights(params, ref_cell):
    """Our ConvGRUCell params → reference ConvGRUCell (conv + GroupNorm)."""
    with torch.no_grad():
        ref_cell.conv_gates[0].weight.copy_(torch.from_numpy(np.transpose(
            np.asarray(params["conv_gates"]["kernel"]), (3, 2, 0, 1))))
        ref_cell.conv_gates[0].bias.copy_(torch.from_numpy(
            np.asarray(params["conv_gates"]["bias"])))
        ref_cell.conv_gates[1].weight.copy_(torch.from_numpy(
            np.asarray(params["gates_scale"])))
        ref_cell.conv_gates[1].bias.copy_(torch.from_numpy(
            np.asarray(params["gates_bias"])))
        ref_cell.conv_can[0].weight.copy_(torch.from_numpy(np.transpose(
            np.asarray(params["conv_cand"]["kernel"]), (3, 2, 0, 1))))
        ref_cell.conv_can[0].bias.copy_(torch.from_numpy(
            np.asarray(params["conv_cand"]["bias"])))
        ref_cell.conv_can[1].weight.copy_(torch.from_numpy(
            np.asarray(params["cand_scale"])))
        ref_cell.conv_can[1].bias.copy_(torch.from_numpy(
            np.asarray(params["cand_bias"])))


def _copy_convnet_weights(params, ref_seq, n_layers):
    """Our ConvNet params (in/mid_i/out) → reference create_convnet
    Sequential (conv at positions 0, 2, 4, …)."""
    convs = [m for m in ref_seq if isinstance(m, torch.nn.Conv2d)]
    names = ["in"] + [f"mid_{i}" for i in range(n_layers)] + ["out"]
    assert len(convs) == len(names)
    with torch.no_grad():
        for conv, name in zip(convs, names):
            conv.weight.copy_(torch.from_numpy(np.transpose(
                np.asarray(params[name]["kernel"]), (3, 2, 0, 1))))
            conv.bias.copy_(torch.from_numpy(np.asarray(params[name]["bias"])))


def test_convgru_cell_single_step_vs_reference(ref_modules):
    from ode_rl_tpu.nn.convgru import ConvGRUCell

    c, b, h, w = 32, 2, 8, 8
    rng = np.random.RandomState(0)
    x = rng.randn(b, h, w, c).astype(np.float32)
    h0 = rng.randn(b, h, w, c).astype(np.float32)

    cell = ConvGRUCell(hidden_dim=c, kernel_size=5, gate_impl="xla")
    variables = cell.init(jax.random.key(0), jnp.asarray(h0), jnp.asarray(x))
    ours = np.asarray(cell.apply(variables, jnp.asarray(h0), jnp.asarray(x)))

    ref_cell = ref_modules["cgru"].ConvGRUCell(
        input_size=(h, w), input_dim=c, hidden_dim=c, kernel_size=5,
        dtype=torch.FloatTensor)
    _copy_cell_weights(variables["params"], ref_cell)
    with torch.no_grad():
        _, h_next = ref_cell(input_tensor=_t(x)[None], h_cur=_t(h0),
                             seq_len=1)
    np.testing.assert_allclose(
        ours, np.moveaxis(h_next.numpy(), 1, -1), atol=2e-5)


def test_convgru_cell_sequence_vs_reference(ref_modules):
    """Multi-step recurrence: every intermediate hidden state matches the
    reference's Python loop (ConvGRUCell.forward, :55-86)."""
    from ode_rl_tpu.nn.convgru import ConvGRUCell

    c, b, h, w, t = 32, 2, 8, 8, 5
    rng = np.random.RandomState(1)
    xs = rng.randn(t, b, h, w, c).astype(np.float32)
    h0 = rng.randn(b, h, w, c).astype(np.float32)

    cell = ConvGRUCell(hidden_dim=c, kernel_size=5, gate_impl="xla")
    variables = cell.init(jax.random.key(0), jnp.asarray(h0),
                          jnp.asarray(xs[0]))
    h_cur, ours = jnp.asarray(h0), []
    for i in range(t):
        h_cur = cell.apply(variables, h_cur, jnp.asarray(xs[i]))
        ours.append(np.asarray(h_cur))

    ref_cell = ref_modules["cgru"].ConvGRUCell(
        input_size=(h, w), input_dim=c, hidden_dim=c, kernel_size=5,
        dtype=torch.FloatTensor)
    _copy_cell_weights(variables["params"], ref_cell)
    xs_t = torch.from_numpy(np.moveaxis(xs, -1, 2).copy())   # (t,b,c,h,w)
    with torch.no_grad():
        stack, _ = ref_cell(input_tensor=xs_t, h_cur=_t(h0), seq_len=t)
    for i in range(t):
        np.testing.assert_allclose(
            ours[i], np.moveaxis(stack[i].numpy(), 1, -1), atol=5e-5)


def test_ode_convgru_z0_inference_vs_reference(ref_modules):
    """Full backward z0 pass against modules/ODEConvGRUCell.py: the Euler
    bootstrap dt=-0.01, the reversed-grid spacing, the GRU fuse, and the
    (mu, |std|) head must all line up."""
    from ode_rl_tpu.nn.odeconvgru import ODEConvGRUEncoder

    c, b, h, w, t = 32, 2, 8, 8, 4
    n_layers, n_units = 2, 32
    rng = np.random.RandomState(2)
    xs = rng.randn(b, t, h, w, c).astype(np.float32) * 0.1
    ts = np.arange(t, dtype=np.float32) / (2 * t)

    enc = ODEConvGRUEncoder(ch=c, ode_n_layers=n_layers, ode_n_units=n_units)
    variables = enc.init(jax.random.key(0), jnp.asarray(xs),
                         jnp.asarray(ts))
    mu, std, latents = enc.apply(variables, jnp.asarray(xs),
                                 jnp.asarray(ts))
    params = variables["params"]

    # torch dynamics net with OUR weights, handed to the REFERENCE cell
    tnet = ref_modules["utils"].create_convnet(
        c, c, n_layers=n_layers, n_units=n_units, nonlinear="relu",
        final_act=False)
    _copy_convnet_weights(params["step"]["ode_func"], tnet, n_layers)
    ref_cell = ref_modules["ode_cgru"].ODEConvGRUCell(
        ode_func=lambda tt, y: tnet(y), opt=None, resolution=(h, w), ch=c,
        device=None, kernel_size=5)
    _copy_cell_weights(params["step"]["cgru_cell"], ref_cell.cgru_cell)
    with torch.no_grad():
        ref_cell.transform_z0[0].weight.copy_(torch.from_numpy(np.transpose(
            np.asarray(params["head_0"]["kernel"]), (3, 2, 0, 1))))
        ref_cell.transform_z0[0].bias.copy_(torch.from_numpy(
            np.asarray(params["head_0"]["bias"])))
        ref_cell.transform_z0[2].weight.copy_(torch.from_numpy(np.transpose(
            np.asarray(params["head_1"]["kernel"]), (3, 2, 0, 1))))
        ref_cell.transform_z0[2].bias.copy_(torch.from_numpy(
            np.asarray(params["head_1"]["bias"])))

    xs_t = torch.from_numpy(np.moveaxis(xs, -1, 2).copy()).permute(
        1, 0, 2, 3, 4)                                     # (t, b, c, h, w)
    with torch.no_grad():
        ref_mu, ref_std = ref_cell(xs_t, torch.from_numpy(ts))
        _, ref_latents = ref_cell.run_ode_conv_gru(
            xs_t, torch.from_numpy(ts))

    np.testing.assert_allclose(np.asarray(mu),
                               np.moveaxis(ref_mu.numpy(), 1, -1),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(std),
                               np.moveaxis(ref_std.numpy(), 1, -1),
                               atol=5e-5)
    # latent trajectory: both stacks are in iteration order (reversed
    # time — latest frame first); reference permutes to (b, t, c, h, w)
    ref_lat = np.moveaxis(ref_latents.numpy(), 2, -1)       # (b, t, h, w, c)
    np.testing.assert_allclose(np.asarray(latents), ref_lat, atol=5e-5)


def test_ode_dynamics_field_vs_reference(ref_modules):
    """Our ConvNet vs the reference's ODEFunc(create_convnet) under the
    same weights — including the backwards gradient-negation flag."""
    from ode_rl_tpu.nn.conv_stacks import ConvNet

    c, b, h, w = 16, 2, 8, 8
    n_layers, n_units = 3, 24
    rng = np.random.RandomState(3)
    y = rng.randn(b, h, w, c).astype(np.float32)

    net = ConvNet(out_ch=c, n_layers=n_layers, n_units=n_units,
                  activation="relu", final_tanh=False)
    variables = net.init(jax.random.key(0), jnp.asarray(y))
    ours = np.asarray(net.apply(variables, jnp.asarray(y)))

    ref_fn = ref_modules["solver"].ODEFunc(
        n_inputs=c, n_outputs=c, n_layers=n_layers, n_units=n_units,
        nonlinear="relu", final_act=False)
    _copy_convnet_weights(variables["params"], ref_fn.gradient_net,
                          n_layers)
    with torch.no_grad():
        ref_out = ref_fn(0.0, _t(y))
        ref_back = ref_fn(0.0, _t(y), backwards=True)
    np.testing.assert_allclose(ours, np.moveaxis(ref_out.numpy(), 1, -1),
                               atol=2e-5)
    np.testing.assert_allclose(-ours, np.moveaxis(ref_back.numpy(), 1, -1),
                               atol=2e-5)


@pytest.mark.slow
def test_create_convnet_final_tanh_vs_reference(ref_modules):
    """final_act=True appends a Tanh (reference helpers/utils.py:179-181)
    — our final_tanh flag must match."""
    from ode_rl_tpu.nn.conv_stacks import ConvNet

    c = 8
    rng = np.random.RandomState(4)
    y = rng.randn(1, 6, 6, c).astype(np.float32)
    net = ConvNet(out_ch=c, n_layers=1, n_units=12, activation="tanh",
                  final_tanh=True)
    variables = net.init(jax.random.key(0), jnp.asarray(y))
    ours = np.asarray(net.apply(variables, jnp.asarray(y)))

    ref_seq = ref_modules["utils"].create_convnet(
        c, c, n_layers=1, n_units=12, nonlinear="tanh", final_act=True)
    _copy_convnet_weights(variables["params"], ref_seq, 1)
    with torch.no_grad():
        ref_out = ref_seq(_t(y))
    np.testing.assert_allclose(ours, np.moveaxis(ref_out.numpy(), 1, -1),
                               atol=2e-5)


# ----------------------- S3VAE loss-stack oracles --------------------------

@pytest.fixture(scope="module")
def ref_s3vae_cls(ref_modules):
    """Load the reference's S3VAE class itself (models/S3VAE.py). wandb is
    absent in-image → shimmed; the class is instantiated via __new__ with
    only the attributes each loss method reads, so no nets are built."""
    if "wandb" not in sys.modules:
        wb = types.ModuleType("wandb")
        wb.log = lambda *a, **k: None
        sys.modules["wandb"] = wb
    sys.path.insert(0, str(REF))
    spec = importlib.util.spec_from_file_location(
        "ref_s3vae", REF / "models/S3VAE.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_s3vae"] = mod
    spec.loader.exec_module(mod)
    sys.path.remove(str(REF))
    return mod.S3VAE


def _det_normal(loc):
    """torch Normal whose (r)sample is exactly its loc — makes the
    reference's internally-sampling loss methods deterministic so both
    sides evaluate the same math on the same 'samples'."""
    d = torch.distributions.Normal(loc=loc, scale=torch.ones_like(loc))
    d.rsample = lambda *a, **k: loc
    d.sample = lambda *a, **k: loc
    return d


def test_s3vae_scc_triplet_vs_reference(ref_s3vae_cls):
    """SCC term (reference S3VAE.py:365-379 + nn.TripletMarginLoss at
    :51): torch's pairwise distance reduces only the LAST tensor axis
    (W for conv features) — our scc_triplet_loss must match that exact
    reduction on both 4D conv features and 2D vector latents."""
    from ode_rl_tpu.models.s3vae import scc_triplet_loss

    rng = np.random.RandomState(0)
    for shape_t, nhwc in [((3, 8, 6, 5), True), ((4, 16), False)]:
        a = rng.randn(*shape_t).astype(np.float32)
        p = (a + 0.3 * rng.randn(*shape_t)).astype(np.float32)
        n = rng.randn(*shape_t).astype(np.float32)

        m = ref_s3vae_cls.__new__(ref_s3vae_cls)
        torch.nn.Module.__init__(m)  # skip S3VAE.__init__ (builds nets)
        m.opt = types.SimpleNamespace(slot_att=False, encoder="cgru")
        m._triplet_loss = torch.nn.TripletMarginLoss(margin=1.0)
        m.q_zf_xT = _det_normal(torch.from_numpy(a))
        m.get_scc_loss(_det_normal(torch.from_numpy(p)),
                       _det_normal(torch.from_numpy(n)))
        ref = float(m.scc_loss)

        to_ours = (lambda x: jnp.asarray(np.moveaxis(x, 1, -1))
                   if nhwc else jnp.asarray(x))
        ours = float(scc_triplet_loss(to_ours(a), to_ours(p), to_ours(n),
                                      margin=1.0))
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_s3vae_dfp_bce_vs_reference(ref_s3vae_cls):
    """DFP term (reference S3VAE.py:381-389): BCE of sigmoid(dfp logits)
    against the motion-magnitude grid labels; dfp_net := Identity so the
    oracle is exactly the BCE-vs-grid math."""
    from ode_rl_tpu.models.s3vae import dfp_bce_loss

    rng = np.random.RandomState(1)
    logits = rng.randn(4, 9, 9).astype(np.float32) * 2.0
    labels = (rng.rand(4, 9, 9) > 0.7).astype(np.float32)

    m = ref_s3vae_cls.__new__(ref_s3vae_cls)
    torch.nn.Module.__init__(m)  # skip S3VAE.__init__ (builds nets)
    m.opt = types.SimpleNamespace(extrapolate=True, reconstruct=False)
    m.dfp_net = torch.nn.Identity()
    m.out_flow_labels = torch.from_numpy(labels)
    m.get_dfp_loss(torch.from_numpy(logits))
    ref = float(m.dfp_loss)

    ours = float(dfp_bce_loss(jnp.asarray(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)


def test_s3vae_mi_estimate_vs_reference(ref_s3vae_cls):
    """MI term (reference S3VAE.py:391-449): minibatch-weighted
    logsumexp entropy estimate H(zf)+H(zt)-H(zf,zt), conv-encoder branch
    (6D log-prob tensors summed over C,H,W). Reference samples := locs
    via _det_normal; ours receives the same samples explicitly."""
    from ode_rl_tpu.models.s3vae import mi_estimate

    b, t, c, h, w = 4, 3, 2, 5, 5
    rng = np.random.RandomState(2)
    mu_t = rng.randn(b, t, c, h, w).astype(np.float32)
    std_t = (0.3 + rng.rand(b, t, c, h, w)).astype(np.float32)
    mu_f = rng.randn(b, c, h, w).astype(np.float32)
    std_f = (0.3 + rng.rand(b, c, h, w)).astype(np.float32)

    m = ref_s3vae_cls.__new__(ref_s3vae_cls)
    torch.nn.Module.__init__(m)  # skip S3VAE.__init__ (builds nets)
    m.opt = types.SimpleNamespace(
        batch_size=b, phase="train", train_test_split=0.8,
        data_points=10000, encoder="cgru")
    q_zt = torch.distributions.Normal(torch.from_numpy(mu_t),
                                      torch.from_numpy(std_t))
    q_zf = torch.distributions.Normal(torch.from_numpy(mu_f),
                                      torch.from_numpy(std_f))
    # The reference builds fresh Normals from .loc/.scale inside dist_op
    # and samples those — patch the class-level rsample for the call.
    orig_rsample = torch.distributions.Normal.rsample
    torch.distributions.Normal.rsample = lambda self, *a, **k: self.loc
    try:
        m.q_zt_xt, m.q_zf_xT = q_zt, q_zf
        m.get_mi_loss()
        ref = float(m.mi_loss)
    finally:
        torch.distributions.Normal.rsample = orig_rsample

    # Ours: time-first NHWC stats, samples = locs, same log(N·M).
    tf = lambda x: jnp.asarray(np.moveaxis(np.moveaxis(x, 1, 0), 2, -1))
    bf = lambda x: jnp.asarray(np.moveaxis(x, 1, -1))
    log_nm = float(np.log(0.8 * 10000 * b))
    ours = float(mi_estimate(tf(mu_t), tf(std_t), tf(mu_t),
                             bf(mu_f), bf(std_f), bf(mu_f), log_nm))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)


# ----------------------- Vid-ODE GAN oracles --------------------------------

@pytest.fixture(scope="module")
def ref_vidode_gan():
    """Load the Vid-ODE sub-repo's gan.py (reference
    Vid-ODE/models/gan.py) directly — the Discriminator class carries the
    rearrangement and LSGAN loss logic we pin against."""
    spec = importlib.util.spec_from_file_location(
        "ref_vidode_gan", REF / "Vid-ODE/models/gan.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_vidode_gan"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_vidode_model_mod():
    """Load Vid-ODE/models/conv_odegru.py as package 'models' member so
    its intra-package imports resolve; torchdiffeq is shimmed (only
    DiffeqSolver.forward uses it, which these tests never call)."""
    vidode_root = REF / "Vid-ODE"
    if "torchdiffeq" not in sys.modules:
        td = types.ModuleType("torchdiffeq")
        td.odeint = None
        sys.modules["torchdiffeq"] = td
    pkg = types.ModuleType("models")
    pkg.__path__ = [str(vidode_root / "models")]
    sys.modules["models"] = pkg
    sys.path.insert(0, str(vidode_root))
    try:
        spec = importlib.util.spec_from_file_location(
            "models.conv_odegru", vidode_root / "models/conv_odegru.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules["models.conv_odegru"] = mod
        spec.loader.exec_module(mod)
    finally:
        sys.path.remove(str(vidode_root))
    return mod


def _nchw(x_nhwc):
    return np.moveaxis(np.asarray(x_nhwc), -1, 1)


def test_gan_rearrange_seq_extrap_vs_reference(ref_vidode_gan, monkeypatch):
    """Extrapolation windows (reference gan.py:93-136): window i is
    [input_real[i:], fake[:i+1]] — t_ctx+1 frames, frame-major channel
    packing, windows-major batch stacking. Equal and unequal (zero-pad)
    both pinned."""
    from ode_rl_tpu.nn.discriminators import rearrange_seq_extrap

    # get_real_fake_seqs calls input_real.get_device() and .to(device) in
    # the pad branch — route both to CPU for the oracle run.
    monkeypatch.setattr(torch.Tensor, "get_device",
                        lambda self: torch.device("cpu"))

    rng = np.random.RandomState(0)
    for t_ctx, t in [(4, 4), (2, 5)]:   # equal; unequal with zero-pad
        b, c, h, w = 2, 3, 6, 6
        real = rng.randn(b, t, h, w, c).astype(np.float32)
        fake = rng.randn(b, t, h, w, c).astype(np.float32)
        ctx = rng.randn(b, t_ctx, h, w, c).astype(np.float32)

        d = ref_vidode_gan.Discriminator.__new__(ref_vidode_gan.Discriminator)
        torch.nn.Module.__init__(d)
        d.seq, d.is_extrap, d.device = True, True, torch.device("cpu")
        # torch side is (B, T, C, H, W)
        tt = lambda x: torch.from_numpy(np.moveaxis(x, -1, 2).copy())
        ref_real, ref_fake = d.rearrange_seq(
            tt(real), tt(fake), tt(ctx), only_fake=False)

        ours_fake = _nchw(rearrange_seq_extrap(jnp.asarray(fake),
                                               jnp.asarray(ctx)))
        ours_real = _nchw(rearrange_seq_extrap(jnp.asarray(real),
                                               jnp.asarray(ctx)))
        np.testing.assert_allclose(ours_fake, ref_fake.numpy(), atol=1e-6)
        np.testing.assert_allclose(ours_real, ref_real.numpy(), atol=1e-6)


def test_gan_rearrange_seq_interp_vs_reference(ref_vidode_gan, monkeypatch):
    """Interpolation windows (reference gan.py:138-159): identity-masked
    single-frame swaps of the real context."""
    from ode_rl_tpu.nn.discriminators import rearrange_seq_interp

    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)

    rng = np.random.RandomState(1)
    b, t, c, h, w = 2, 4, 3, 6, 6
    fake = rng.randn(b, t, h, w, c).astype(np.float32)
    real = rng.randn(b, t, h, w, c).astype(np.float32)
    ctx = rng.randn(b, t, h, w, c).astype(np.float32)

    d = ref_vidode_gan.Discriminator.__new__(ref_vidode_gan.Discriminator)
    torch.nn.Module.__init__(d)
    d.seq, d.is_extrap, d.device = True, False, torch.device("cpu")
    tt = lambda x: torch.from_numpy(np.moveaxis(x, -1, 2).copy())
    ref_real, ref_fake = d.rearrange_seq_interp(
        tt(real), tt(fake), tt(ctx), only_fake=False)

    ours_fake = _nchw(rearrange_seq_interp(jnp.asarray(fake),
                                           jnp.asarray(ctx)))
    ours_real = _nchw(rearrange_seq_interp(jnp.asarray(real),
                                           jnp.asarray(ctx)))
    np.testing.assert_allclose(ours_fake, ref_fake.numpy(), atol=1e-6)
    np.testing.assert_allclose(ours_real, ref_real.numpy(), atol=1e-6)


def _copy_disc_weights(params, ref_d):
    """Our PatchDiscriminator params → reference Discriminator layers."""
    pairs = [("l1", ref_d.layer_1[0]), ("l2", ref_d.layer_2.main[0]),
             ("l3", ref_d.layer_3.main[0]), ("l4", ref_d.layer_4.main[0]),
             ("last", ref_d.last_conv)]
    with torch.no_grad():
        for name, conv in pairs:
            conv.weight.copy_(torch.from_numpy(np.transpose(
                np.asarray(params[name]["kernel"]), (3, 2, 0, 1))))
            if conv.bias is not None:
                conv.bias.copy_(torch.from_numpy(
                    np.asarray(params[name]["bias"])))


def test_gan_adv_losses_vs_reference(ref_vidode_gan, monkeypatch):
    """Full netD/netG LSGAN losses under identical discriminator weights
    (reference gan.py:51-91), both the per-sequence (extrap windows) and
    the per-image discriminator paths."""
    import jax as _jax

    from ode_rl_tpu.nn.discriminators import (
        PatchDiscriminator, frames_to_images, lsgan_d_loss, lsgan_g_loss,
        rearrange_seq_extrap)

    monkeypatch.setattr(torch.Tensor, "get_device",
                        lambda self: torch.device("cpu"))

    rng = np.random.RandomState(2)
    b, t, c, h, w = 2, 3, 1, 16, 16
    real = rng.rand(b, t, h, w, c).astype(np.float32)
    fake = rng.rand(b, t, h, w, c).astype(np.float32)
    ctx = rng.rand(b, t, h, w, c).astype(np.float32)
    tt = lambda x: torch.from_numpy(np.moveaxis(x, -1, 2).copy())

    disc = PatchDiscriminator()
    for seq_mode in (True, False):
        in_ch = (t + 1) * c if seq_mode else c
        sample = (rearrange_seq_extrap(jnp.asarray(fake), jnp.asarray(ctx))
                  if seq_mode else frames_to_images(jnp.asarray(fake)))
        params = disc.init(_jax.random.key(0), sample)["params"]

        ref_d = ref_vidode_gan.Discriminator(
            in_ch=in_ch, device=torch.device("cpu"), seq=seq_mode,
            is_extrap=True)
        _copy_disc_weights(params, ref_d)
        ref_d.eval()

        with torch.no_grad():
            ref_dl = float(ref_d.netD_adv_loss(tt(real), tt(fake),
                                               tt(ctx) if seq_mode else None))
            ref_gl = float(ref_d.netG_adv_loss(tt(real), tt(fake),
                                               tt(ctx) if seq_mode else None))

        rearr = (lambda v: rearrange_seq_extrap(v, jnp.asarray(ctx))) \
            if seq_mode else frames_to_images
        pr = disc.apply({"params": params}, rearr(jnp.asarray(real)))
        pf = disc.apply({"params": params}, rearr(jnp.asarray(fake)))
        np.testing.assert_allclose(float(lsgan_d_loss(pr, pf)), ref_dl,
                                   rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(float(lsgan_g_loss(pf)), ref_gl,
                                   rtol=2e-5, atol=1e-6)


def test_vidode_warp_chain_vs_reference(ref_vidode_model_mod):
    """Recursive flow warping (reference conv_odegru.py:388-413
    get_warped_images): per-step flow normalization by (w-1)/2,(h-1)/2,
    grid_sample border padding, each warp feeding the next. The reference
    method reads nothing from self → called unbound."""
    from ode_rl_tpu.ops.warp import grid_sample as our_grid_sample

    rng = np.random.RandomState(3)
    b, t, c, h, w = 2, 4, 3, 9, 11
    flows = (2.0 * rng.randn(b, t, h, w, 2)).astype(np.float32)
    start = rng.rand(b, h, w, c).astype(np.float32)

    # reference grid (conv_odegru.py:253-256): linspace(-1, 1) lattice,
    # NHW2 xy order; grid_sample runs at torch's DEFAULT
    # align_corners=False — the reference mixes the (w-1)/2 flow
    # normalization with align_corners=False sampling, and we reproduce
    # that mix exactly (models/vidode.py does the same).
    xs = np.linspace(-1.0, 1.0, w, dtype=np.float32)
    ys = np.linspace(-1.0, 1.0, h, dtype=np.float32)
    gx, gy = np.meshgrid(xs, ys)
    grid = np.broadcast_to(np.stack([gx, gy], -1), (b, h, w, 2)).copy()

    VidODE = ref_vidode_model_mod.VidODE
    ref_out = VidODE.get_warped_images(
        None,
        torch.from_numpy(np.moveaxis(flows, -1, 2).copy()),
        torch.from_numpy(np.moveaxis(start, -1, 1).copy()),
        torch.from_numpy(grid))
    ref_seq = torch.cat(ref_out, dim=1).numpy()      # (B, T, C, H, W)

    # ours: the lax.scan warp chain exactly as models/vidode.py runs it
    norm = jnp.array([(w - 1.0) / 2.0, (h - 1.0) / 2.0], jnp.float32)
    base = jnp.asarray(grid)

    def step(last, fl):
        warped = our_grid_sample(last, base + fl / norm, padding="border")
        return warped, warped

    _, ours_seq = jax.lax.scan(step, jnp.asarray(start),
                               jnp.moveaxis(jnp.asarray(flows), 0, 1))
    ours = np.moveaxis(np.asarray(jnp.moveaxis(ours_seq, 0, 1)), -1, 2)
    np.testing.assert_allclose(ours, ref_seq, rtol=1e-4, atol=1e-5)


def test_vidode_flowmap_shifted_latents_vs_reference(ref_vidode_model_mod):
    """get_flowmaps (reference conv_odegru.py:361-386) feeds the decoder
    [sol_out[t], prev] with prev = previous latent (seeded by the last
    observed embed) — our batched shifted-latent concat must produce the
    identical decoder input stream. Oracle runs with a linear 'decoder'
    so outputs pin the input construction exactly."""
    rng = np.random.RandomState(4)
    b, t, c, h, w = 2, 5, 4, 3, 3
    sol = rng.randn(b, t, c, h, w).astype(np.float32)
    first_prev = rng.randn(b, c, h, w).astype(np.float32)
    mask = torch.ones(b, t, 1)

    dec = torch.nn.Conv2d(2 * c, 2, 1, bias=False)
    ns = types.SimpleNamespace(decoder=dec)
    VidODE = ref_vidode_model_mod.VidODE
    with torch.no_grad():
        ref_flows = torch.cat(VidODE.get_flowmaps(
            ns, torch.from_numpy(sol), torch.from_numpy(first_prev), mask),
            dim=1).numpy()                            # (B, T, 2, H, W)

    # ours (models/vidode.py:134-140): prev_seq = [skip_embed, sol[:-1]]
    prev = np.concatenate([first_prev[:, None], sol[:, :-1]], axis=1)
    dec_in = np.concatenate([sol, prev], axis=2).reshape(b * t, 2 * c, h, w)
    with torch.no_grad():
        ours = dec(torch.from_numpy(dec_in)).numpy().reshape(b, t, 2, h, w)
    np.testing.assert_allclose(ours, ref_flows, rtol=1e-5, atol=1e-6)


# ----------------------- ConvLSTM sub-repo oracle ---------------------------

@pytest.fixture(scope="module")
def ref_convrnn():
    """Load the ConvLSTM-PyTorch sub-repo's ConvRNN.py (CLSTM_cell with
    the fused 4-gate conv + GroupNorm)."""
    spec = importlib.util.spec_from_file_location(
        "ref_convrnn", REF / "ConvLSTM-PyTorch/ConvRNN.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_convrnn"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_convlstm_cell_sequence_vs_reference(ref_convrnn):
    """Our ConvLSTMCell scan vs the reference CLSTM_cell.forward
    (ConvRNN.py:70-120): fused conv → GroupNorm(4F/32) → i,f,g,o split,
    c' = f·c + i·g, h' = o·tanh(c'), over a 4-step sequence with explicit
    initial state (avoids the .cuda() zero-init path)."""
    from ode_rl_tpu.models.convlstm import ConvLSTMCell

    f, cin, b, hw, t = 32, 32, 2, 8, 4
    rng = np.random.RandomState(0)
    xs = rng.randn(t, b, hw, hw, cin).astype(np.float32) * 0.5
    h0 = rng.randn(b, hw, hw, f).astype(np.float32) * 0.1
    c0 = rng.randn(b, hw, hw, f).astype(np.float32) * 0.1

    cell = ConvLSTMCell(num_features=f, filter_size=5)
    params = cell.init(jax.random.key(0),
                       (jnp.asarray(h0), jnp.asarray(c0)),
                       jnp.asarray(xs[0]))["params"]

    carry = (jnp.asarray(h0), jnp.asarray(c0))
    ours = []
    for i in range(t):
        carry, h = cell.apply({"params": params}, carry, jnp.asarray(xs[i]))
        ours.append(np.asarray(h))
    ours = np.stack(ours)                          # (T, B, H, W, F)

    ref_cell = ref_convrnn.CLSTM_cell(shape=(hw, hw), input_channels=cin,
                                      filter_size=5, num_features=f)
    with torch.no_grad():
        ref_cell.conv[0].weight.copy_(torch.from_numpy(np.transpose(
            np.asarray(params["gates"]["kernel"]), (3, 2, 0, 1))))
        ref_cell.conv[0].bias.copy_(torch.from_numpy(
            np.asarray(params["gates"]["bias"])))
        ref_cell.conv[1].weight.copy_(torch.from_numpy(
            np.asarray(params["norm"]["scale"])))
        ref_cell.conv[1].bias.copy_(torch.from_numpy(
            np.asarray(params["norm"]["bias"])))
        xs_t = torch.from_numpy(np.moveaxis(xs, -1, 2).copy())
        h0_t = torch.from_numpy(np.moveaxis(h0, -1, 1).copy())
        c0_t = torch.from_numpy(np.moveaxis(c0, -1, 1).copy())
        outs, _ = ref_cell(inputs=xs_t, hidden_state=(h0_t, c0_t),
                           seq_len=t)
    ref = np.moveaxis(outs.numpy(), 2, -1)         # (T, B, H, W, F)
    # conv-backend accumulation noise compounds over the recurrence
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


# ----------------------- code_sprite DS-VAE oracle --------------------------

@pytest.fixture(scope="module")
def ref_dsvae_cls():
    """Load code_sprite/models/DS_VAE.py and return the
    DisentangledVAE_ICLR_V1 class (instantiated via __new__ with only the
    prior attributes in the test)."""
    spec = importlib.util.spec_from_file_location(
        "ref_dsvae", REF / "code_sprite/models/DS_VAE.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_dsvae"] = mod
    spec.loader.exec_module(mod)
    return mod.DisentangledVAE_ICLR_V1


def _flax_lstm_to_torch(p, t_cell):
    """flax OptimizedLSTMCell params (ii/if/ig/io input denses, hi/hf/hg/ho
    hidden denses with bias) → torch LSTMCell (weight_ih/hh rows i,f,g,o;
    flax keeps the bias on the hidden side, torch adds bias_ih+bias_hh so
    bias_ih := 0)."""
    order = ["i", "f", "g", "o"]
    w_ih = np.concatenate([np.asarray(p[f"i{g}"]["kernel"]).T
                           for g in order])
    w_hh = np.concatenate([np.asarray(p[f"h{g}"]["kernel"]).T
                           for g in order])
    b_hh = np.concatenate([np.asarray(p[f"h{g}"]["bias"]) for g in order])
    with torch.no_grad():
        t_cell.weight_ih.copy_(torch.from_numpy(w_ih))
        t_cell.weight_hh.copy_(torch.from_numpy(w_hh))
        t_cell.bias_ih.zero_()
        t_cell.bias_hh.copy_(torch.from_numpy(b_hh))


def test_dsvae_prior_rollout_vs_reference(ref_dsvae_cls, monkeypatch):
    """Teacher-forced learned LSTM prior (reference DS_VAE.py
    sample_z_prior_train, :430-465): two stacked LSTMCells fed z_post
    with zero initial states, mean/logvar heads per step. Teacher forcing
    makes the (means, logvars) stream sample-independent, so it pins the
    whole rollout deterministically."""
    from ode_rl_tpu.sprite.dsvae import DisentangledVAE

    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)

    z_dim, hidden, b, t = 6, 10, 3, 5
    rng = np.random.RandomState(7)
    z_post = rng.randn(b, t, z_dim).astype(np.float32)

    model = DisentangledVAE(f_dim=8, z_dim=z_dim, g_dim=8, channels=1,
                            hidden_dim=hidden)
    v = model.init(jax.random.key(0), t, jax.random.key(1),
                   jnp.asarray(z_post), method=model._prior_rollout)
    means, logvars, _ = model.apply(v, t, jax.random.key(2),
                                    jnp.asarray(z_post),
                                    method=model._prior_rollout)
    params = v["params"]

    m = ref_dsvae_cls.__new__(ref_dsvae_cls)
    torch.nn.Module.__init__(m)
    m.z_dim, m.hidden_dim, m.frames = z_dim, hidden, t
    m.z_prior_lstm_ly1 = torch.nn.LSTMCell(z_dim, hidden)
    m.z_prior_lstm_ly2 = torch.nn.LSTMCell(hidden, hidden)
    m.z_prior_mean = torch.nn.Linear(hidden, z_dim)
    m.z_prior_logvar = torch.nn.Linear(hidden, z_dim)
    _flax_lstm_to_torch(params["prior_ly1"], m.z_prior_lstm_ly1)
    _flax_lstm_to_torch(params["prior_ly2"], m.z_prior_lstm_ly2)
    with torch.no_grad():
        m.z_prior_mean.weight.copy_(torch.from_numpy(np.asarray(
            params["z_prior_mean"]["kernel"]).T))
        m.z_prior_mean.bias.copy_(torch.from_numpy(np.asarray(
            params["z_prior_mean"]["bias"])))
        m.z_prior_logvar.weight.copy_(torch.from_numpy(np.asarray(
            params["z_prior_logvar"]["kernel"]).T))
        m.z_prior_logvar.bias.copy_(torch.from_numpy(np.asarray(
            params["z_prior_logvar"]["bias"])))
        ref_means, ref_logvars, _ = m.sample_z_prior_train(
            torch.from_numpy(z_post), random_sampling=False)

    np.testing.assert_allclose(np.asarray(means), ref_means.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(logvars), ref_logvars.numpy(),
                               rtol=1e-5, atol=1e-6)


# ----------------------- flownet2 loss oracles -------------------------------

@pytest.fixture(scope="module")
def ref_fn2_losses():
    spec = importlib.util.spec_from_file_location(
        "ref_fn2_losses", REF / "flownet2-pytorch/losses.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_fn2_losses"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_flow_losses_vs_reference(ref_fn2_losses):
    """EPE / L1 / L2 (flownet2-pytorch/losses.py:11-27) on random flows."""
    from ode_rl_tpu.flow.losses import epe, l1_loss, l2_loss

    rng = np.random.RandomState(8)
    a = rng.randn(2, 12, 16, 2).astype(np.float32)
    b = rng.randn(2, 12, 16, 2).astype(np.float32)
    at, bt = _t(a), _t(b)

    np.testing.assert_allclose(float(epe(jnp.asarray(a), jnp.asarray(b))),
                               float(ref_fn2_losses.EPE(at, bt)), rtol=1e-5)
    np.testing.assert_allclose(
        float(l1_loss(jnp.asarray(a), jnp.asarray(b))),
        float(ref_fn2_losses.L1()(at, bt)), rtol=1e-5)
    np.testing.assert_allclose(
        float(l2_loss(jnp.asarray(a), jnp.asarray(b))),
        float(ref_fn2_losses.L2()(at, bt)), rtol=1e-5)


def test_multiscale_loss_reference_vs_reference(ref_fn2_losses):
    """multiscale_loss_reference reproduces the reference MultiScale
    (losses.py:52-80) exactly: div_flow target scaling, avg-pool pyramid,
    l_weight/2^i weights, weighted EPE side-channel. (The training path's
    multiscale_loss uses a per-scale pixel-units convention — documented
    deviation.)"""
    from ode_rl_tpu.flow.losses import multiscale_loss_reference

    rng = np.random.RandomState(9)
    h, w = 64, 64
    target = (4.0 * rng.randn(2, h, w, 2)).astype(np.float32)
    pyramid = [rng.randn(2, h // (4 * 2 ** i), w // (4 * 2 ** i), 2
                         ).astype(np.float32) * 0.1 for i in range(5)]

    for norm in ("L1", "L2"):
        ref_ms = ref_fn2_losses.MultiScale(args=None, norm=norm)
        ref_loss, ref_epe = ref_ms(tuple(_t(p) for p in pyramid),
                                   _t(target))
        ours_loss, ours_epe = multiscale_loss_reference(
            [jnp.asarray(p) for p in pyramid], jnp.asarray(target),
            norm=norm.lower())
        np.testing.assert_allclose(float(ours_loss), float(ref_loss),
                                   rtol=1e-4)
        np.testing.assert_allclose(float(ours_epe), float(ref_epe),
                                   rtol=1e-4)


def test_s2vae_vae_loss_vs_reference(ref_modules):
    """S2VAE ELBO terms (reference models/S2VAE.py:204-220): sum-MSE/B·T
    reconstruction + closed-form Gaussian KL via log-variances, both
    evaluated by the reference's own get_vae_loss under identical
    tensors. (ref_modules provides the skimage/torchdiffeq shims the
    helpers import chain needs.)"""
    if "wandb" not in sys.modules:
        wb = types.ModuleType("wandb")
        wb.log = lambda *a, **k: None
        sys.modules["wandb"] = wb
    sys.path.insert(0, str(REF))
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_s2vae", REF / "models/S2VAE.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules["ref_s2vae"] = mod
        spec.loader.exec_module(mod)
    finally:
        sys.path.remove(str(REF))

    from ode_rl_tpu.models.s2vae import s2vae_vae_loss

    rng = np.random.RandomState(10)
    b, t, c, h, w = 2, 4, 1, 8, 8
    slots, sdim = 3, 6
    x = rng.rand(b, t, c, h, w).astype(np.float32)
    x_hat = rng.rand(b, t, c, h, w).astype(np.float32)
    post_mu = rng.randn(b, slots, t, sdim).astype(np.float32)
    post_std = (0.2 + rng.rand(b, slots, t, sdim)).astype(np.float32)
    pri_mu = rng.randn(b, slots, t, sdim).astype(np.float32)
    pri_std = (0.2 + rng.rand(b, slots, t, sdim)).astype(np.float32)

    m = mod.S2VAE.__new__(mod.S2VAE)
    torch.nn.Module.__init__(m)
    m.opt = types.SimpleNamespace(batch_size=b)
    m.ground_truth = torch.from_numpy(x)
    m.slot_z_post = torch.distributions.Normal(torch.from_numpy(post_mu),
                                               torch.from_numpy(post_std))
    m.slot_z_prior = torch.distributions.Normal(torch.from_numpy(pri_mu),
                                                torch.from_numpy(pri_std))
    m.get_vae_loss(torch.from_numpy(x_hat))
    ref_recon, ref_kl = float(m.recon_loss), float(m.z_KL_div_loss)

    # ours is layout-agnostic (sum reductions) — feed the same tensors
    recon, kl = s2vae_vae_loss(
        jnp.asarray(x_hat), jnp.asarray(x), jnp.asarray(post_mu),
        jnp.asarray(post_std), jnp.asarray(pri_mu), jnp.asarray(pri_std))
    np.testing.assert_allclose(float(recon), ref_recon, rtol=1e-5)
    np.testing.assert_allclose(float(kl), ref_kl, rtol=1e-5)


def test_disagreement_metrics_vs_reference():
    """Disagreement-score metrics (reference code_sprite/
    test_DS_VAE_Sprite_Cls_disagree.py:233-263). The module's import
    surface is broken in-image (argv parsing at import, scipy.misc), so
    the oracle execs the metric-function block verbatim from the file —
    the math that runs is still byte-for-byte the reference's."""
    from ode_rl_tpu.sprite.disagreement import (
        balanced_subset_index, disagreement_scores, entropy_hy,
        entropy_hyx, inception_score, kl_divergence)

    src = (REF / "code_sprite/test_DS_VAE_Sprite_Cls_disagree.py"
           ).read_text()
    start = src.index("def entropy_Hy")
    end = src.index("def print_log")
    ns = {"np": np}
    exec(src[start:end], ns)  # the reference's own metric defs

    rng = np.random.RandomState(11)
    logits = rng.randn(64, 4).astype(np.float64)
    p2 = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    logits1 = rng.randn(64, 4).astype(np.float64)
    p1 = np.exp(logits1) / np.exp(logits1).sum(1, keepdims=True)
    label_gt = rng.randint(0, 4, size=64)

    np.testing.assert_allclose(entropy_hy(p2), ns["entropy_Hy"](p2),
                               rtol=1e-12)
    np.testing.assert_allclose(entropy_hyx(p2), ns["entropy_Hyx"](p2),
                               rtol=1e-12)
    np.testing.assert_allclose(inception_score(p2),
                               ns["inception_score"](p2), rtol=1e-12)
    np.testing.assert_allclose(kl_divergence(p2, p1),
                               ns["KL_divergence"](p2, p1), rtol=1e-12)

    # the balanced-subset + full sweep mirrors the inline protocol
    # (reference :216-231)
    idx = balanced_subset_index(label_gt)
    n_per = min((label_gt == i).sum() for i in np.unique(label_gt))
    assert len(idx) == n_per * len(np.unique(label_gt))
    scores = disagreement_scores(p1, p2, label_gt)
    np.testing.assert_allclose(
        scores["acc"],
        (np.argmax(p1, 1) == np.argmax(p2, 1)).mean(), rtol=1e-12)
    np.testing.assert_allclose(scores["IS"],
                               ns["inception_score"](p2[idx]), rtol=1e-12)
