"""Flow data path: .flo I/O, FlyingChairs-layout corpus, EPE validation,
and DFP labels from FlowNetC predicted flow
(reference flownet2-pytorch/{datasets.py,utils/flow_utils.py} +
scripts/get_labels_from_pred_flow.py)."""

import numpy as np
import pytest

from ode_rl_tpu.flow.data import (
    FlyingChairsCorpus, read_flo, write_flo, write_synthetic_chairs)


def test_flo_roundtrip(tmp_path):
    flow = np.random.RandomState(0).randn(48, 64, 2).astype(np.float32)
    write_flo(tmp_path / "a.flo", flow)
    back = read_flo(tmp_path / "a.flo")
    np.testing.assert_array_equal(back, flow)


def test_flo_reference_binary_layout(tmp_path):
    """Byte-level contract: magic float, little-endian int32 w/h, then
    row-major interleaved u,v — the Middlebury format the reference
    reads/writes (flow_utils.py:7-58)."""
    flow = np.arange(2 * 2 * 2, dtype=np.float32).reshape(2, 2, 2)
    write_flo(tmp_path / "b.flo", flow)
    raw = (tmp_path / "b.flo").read_bytes()
    assert np.frombuffer(raw[:4], np.float32)[0] == np.float32(202021.25)
    assert np.frombuffer(raw[4:12], np.int32).tolist() == [2, 2]  # w, h
    data = np.frombuffer(raw[12:], np.float32)
    # pixel (0,0): u then v interleaved
    assert data[0] == 0.0 and data[1] == 1.0


def test_flo_rejects_bad_magic(tmp_path):
    (tmp_path / "bad.flo").write_bytes(b"\x00" * 16)
    with pytest.raises(ValueError):
        read_flo(tmp_path / "bad.flo")


@pytest.fixture(scope="module")
def chairs(tmp_path_factory):
    out = tmp_path_factory.mktemp("chairs")
    write_synthetic_chairs(out, n_pairs=12, size=64)
    return out


def test_chairs_corpus_layout(chairs):
    c = FlyingChairsCorpus(chairs, batch_size=4, is_train=True,
                           train_split=0.75)
    img1, img2, flow = next(c)
    assert img1.shape == (4, 64, 64, 3)
    assert flow.shape == (4, 64, 64, 2)
    val = FlyingChairsCorpus(chairs, batch_size=3, is_train=False,
                             train_split=0.75)
    assert len(val.pairs) == 3     # 12 × 0.25


def test_chairs_pairing_invariant(chairs):
    """img2 must be the warp of img1 by the stored flow (the synthetic
    corpus ground truth survives the ppm/flo round trip)."""
    import jax.numpy as jnp

    from ode_rl_tpu.ops.warp import resample2d

    c = FlyingChairsCorpus(chairs, batch_size=2, is_train=False,
                           train_split=0.0)
    img1, img2, flow = next(c)
    warped = np.asarray(resample2d(jnp.asarray(img1), jnp.asarray(flow)))
    # ppm quantization: 1/255 tolerance
    assert np.abs(warped - img2).mean() < 0.02


@pytest.mark.slow
def test_disk_training_and_epe_validation(chairs):
    from ode_rl_tpu.flow import FlowNetS
    from ode_rl_tpu.flow.train import train_flownet

    m = train_flownet(FlowNetS(), steps=2, batch=2, data_root=chairs,
                      validate=True)
    assert np.isfinite(m["loss"])
    assert np.isfinite(m["val_epe"]) and m["val_epe"] > 0


def test_flow_grid_labels_format():
    import jax.numpy as jnp

    from ode_rl_tpu.data.flow_labels import flow_grid_labels

    flow = np.zeros((2, 4, 48, 48, 2), np.float32)
    flow[:, :, :16, :16, 0] = 5.0      # strong motion in top-left cell
    labels = flow_grid_labels(jnp.asarray(flow), grid=3, topk=1)
    assert labels.shape == (2, 4, 9)
    assert np.asarray(labels)[..., 0].all()
    assert np.asarray(labels).sum(-1).max() == 1


@pytest.mark.slow
def test_flownet_label_fn_end_to_end():
    """flow_label_source=flownet: labels computed from FlowNetC flow in
    one jitted call, same format as the frame-diff proxy."""
    import jax
    import jax.numpy as jnp

    from ode_rl_tpu.data.flow_labels import make_flownet_label_fn
    from ode_rl_tpu.flow.flownets import FlowNetC

    net = FlowNetC()
    dummy = jnp.zeros((1, 64, 64, 3))
    params = net.init(jax.random.key(0), dummy, dummy)
    label_fn = make_flownet_label_fn(net, params)
    video = jax.random.uniform(jax.random.key(1), (2, 3, 64, 64, 1))
    labels = jax.jit(label_fn)(video)
    assert labels.shape == (2, 2, 9)
    assert np.asarray(labels).sum(-1).max() == 3   # top-3 multi-hot


@pytest.mark.slow
def test_flownet_label_source_requires_trained_weights(tmp_path):
    """flow_label_source=flownet without trained weights is a hard error
    (the reference's DFP labels come from a TRAINED flow net,
    scripts/get_labels_from_pred_flow.py:30-49 — random features would
    silently supervise DFP against noise); allow_random_flownet=True is
    the explicit debug escape."""
    from ode_rl_tpu.core.config import Config
    from ode_rl_tpu.train.loop import _make_flow_label_fn

    base = {"flow_label_source": "flownet",
            "flownet_params_path": str(tmp_path / "missing.msgpack")}
    with pytest.raises(FileNotFoundError, match="train_flownetc"):
        _make_flow_label_fn(Config(base))
    fn = _make_flow_label_fn(Config({**base, "allow_random_flownet": True}))
    assert fn is not None
