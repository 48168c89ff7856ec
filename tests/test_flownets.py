"""Tests for the FlowNet2 family and GAN components."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ode_rl_tpu.flow import (
    FlowNet2, FlowNetC, FlowNetS, epe, multiscale_loss)
from ode_rl_tpu.nn.discriminators import (
    PatchDiscriminator, frames_to_images, lsgan_d_loss, lsgan_g_loss,
    rearrange_seq_extrap, rearrange_seq_interp)


def _pair(h=64, w=64, c=3):
    return (jax.random.uniform(jax.random.key(0), (1, h, w, c)),
            jax.random.uniform(jax.random.key(1), (1, h, w, c)))


def test_flownets_pyramid_shapes():
    img1, img2 = _pair()
    x = jnp.concatenate([img1, img2], -1)
    model = FlowNetS()
    params = model.init(jax.random.key(2), x)
    flows = model.apply(params, x)
    assert [f.shape[1] for f in flows] == [16, 8, 4, 2, 1]
    assert all(f.shape[-1] == 2 for f in flows)


def test_flownetc_uses_correlation():
    img1, img2 = _pair()
    model = FlowNetC(max_displacement=4, corr_stride=2)
    params = model.init(jax.random.key(2), img1, img2)
    flows = model.apply(params, img1, img2)
    assert flows[0].shape == (1, 16, 16, 2)


@pytest.mark.slow
def test_flownet2_full_stack():
    img1, img2 = _pair()
    model = FlowNet2()
    params = model.init(jax.random.key(2), img1, img2)
    flow = model.apply(params, img1, img2)
    assert flow.shape == (1, 64, 64, 2)
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    # The reference pins "Parameter count = 162,518,834"
    # (flownet2-pytorch/models.py:38); ours matches exactly — see
    # scripts/flownet2_param_audit.py for the per-subnet reconciliation.
    assert n == 162_518_834


@pytest.mark.slow
def test_flownet2_param_audit_vs_live_reference():
    """Layer-multiset + per-subnet totals reconciled against the live
    reference torch modules (constructed on CPU with the CUDA op
    packages stubbed)."""
    import pathlib
    import sys
    pytest.importorskip("torch")
    sys.path.insert(0, str(
        pathlib.Path(__file__).resolve().parent.parent / "scripts"))
    import flownet2_param_audit as audit
    report = audit.audit()
    assert report["mismatches"] == {}
    assert report["total"]["reference"] == 162_518_834
    assert report["total"]["ours_flownet2"] == 162_518_834
    for net, row in report["nets"].items():
        assert row["match"], f"{net}: {row}"


def test_multiscale_loss_decreases_with_better_flow():
    img1, img2 = _pair()
    x = jnp.concatenate([img1, img2], -1)
    model = FlowNetS()
    params = model.init(jax.random.key(2), x)
    flows = model.apply(params, x)
    tgt_good = jax.image.resize(flows[0], (1, 64, 64, 2), "bilinear") * 4.0
    tgt_bad = tgt_good + 10.0
    assert float(multiscale_loss(flows, tgt_good)) < float(
        multiscale_loss(flows, tgt_bad))


def test_epe():
    a = jnp.zeros((1, 4, 4, 2))
    b = jnp.ones((1, 4, 4, 2)) * jnp.array([3.0, 4.0])
    assert abs(float(epe(a, b)) - 5.0) < 1e-5


# ------------------------------ GAN pieces ---------------------------------

def test_patch_discriminator_shapes():
    d = PatchDiscriminator()
    x = jax.random.uniform(jax.random.key(0), (2, 64, 64, 1))
    params = d.init(jax.random.key(1), x)
    out = d.apply(params, x)
    assert out.shape[0] == 2 and out.shape[-1] == 64


def test_lsgan_losses():
    real = jnp.ones((4, 8, 8, 1))
    fake = jnp.zeros((4, 8, 8, 1))
    assert float(lsgan_d_loss(real, fake)) == 0.0       # perfect D
    assert float(lsgan_g_loss(real)) == 0.0             # G fools D
    assert float(lsgan_g_loss(fake)) == 1.0


def test_rearrange_seq_shapes():
    seq = jax.random.uniform(jax.random.key(0), (2, 4, 8, 8, 1))
    ctx = jax.random.uniform(jax.random.key(1), (2, 4, 8, 8, 1))
    ex = rearrange_seq_extrap(seq, ctx)
    it = rearrange_seq_interp(seq, ctx)
    # extrap windows carry t_ctx+1 frames (reference gan.py:174 sizes the
    # seq discriminator with seq_len+1 in extrapolation mode)
    assert ex.shape == (8, 8, 8, 5)
    assert it.shape == (8, 8, 8, 4)


def test_frames_to_images():
    v = jnp.zeros((2, 3, 8, 8, 1))
    assert frames_to_images(v).shape == (6, 8, 8, 1)


def test_graft_params_copies_matching_and_skips_mismatched():
    """Warm-start graft (the reference's staged FlowNet2 schedule):
    leaves with matching path+shape transfer, shape-mismatched leaves
    (e.g. the stack's 12-channel conv1 vs the standalone 6-channel one)
    keep their destination init, and paths absent from the donor are
    untouched."""
    from ode_rl_tpu.flow.train import graft_params

    dst = {"conv1": {"kernel": jnp.zeros((3, 3, 12, 8)),
                     "bias": jnp.zeros((8,))},
           "conv2": {"kernel": jnp.zeros((3, 3, 8, 8))},
           "head": {"kernel": jnp.zeros((8, 2))}}
    src = {"conv1": {"kernel": np.ones((3, 3, 6, 8)),   # mismatch → skip
                     "bias": np.ones((8,))},            # match → copy
           "conv2": {"kernel": np.ones((3, 3, 8, 8))}}  # match → copy
    out, grafted, skipped = graft_params(dst, src)
    assert (grafted, skipped) == (2, 1)
    assert np.all(np.asarray(out["conv1"]["kernel"]) == 0)
    assert np.all(np.asarray(out["conv1"]["bias"]) == 1)
    assert np.all(np.asarray(out["conv2"]["kernel"]) == 1)
    assert np.all(np.asarray(out["head"]["kernel"]) == 0)
