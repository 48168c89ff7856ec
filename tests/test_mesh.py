import pytest
import jax
import jax.numpy as jnp
import numpy as np

from ode_rl_tpu.core.config import Config
from ode_rl_tpu.data import MovingMNIST, make_batch_dict
from ode_rl_tpu.models.convgru import ConvGRUModel
from ode_rl_tpu.parallel.mesh import (
    data_parallel_sharding, make_mesh, replicate, shard_batch)
from ode_rl_tpu.train.step import create_train_state, make_train_step

CFG = Config({"lr": 1e-3, "clip": -1})


def test_virtual_device_count():
    assert jax.device_count() == 8


def test_mesh_axes():
    mesh = make_mesh()
    assert mesh.axis_names == ("data", "model")
    assert mesh.devices.shape == (8, 1)


def test_batch_sharding_layout():
    mesh = make_mesh()
    video = jnp.zeros((8, 4, 64, 64, 1))
    batch = make_batch_dict(video, n_in=2)
    sharded = shard_batch(batch, mesh)
    # batch-axis arrays sharded over data, timestamps replicated
    assert sharded["observed_data"].sharding.spec[0] == "data"
    obs_tp_spec = sharded["observed_tp"].sharding.spec
    assert all(s is None for s in obs_tp_spec)


@pytest.mark.slow
def test_sharded_train_step_matches_single_device():
    """SPMD data-parallel step must be numerically equivalent to the
    unsharded step (gradient all-reduce inserted by XLA)."""
    model = ConvGRUModel(in_channels=1, conv_encoder_out_ch=16,
                         convgru_out_ch=16)
    loader = iter(MovingMNIST(batch_size=8, n_frames_input=3,
                              n_frames_output=2))
    batch = make_batch_dict(next(loader), n_in=3)
    state = create_train_state(model, CFG, batch, jax.random.key(0))
    step = make_train_step(model, donate=False)

    # Unsharded
    _, m_ref = step(state, batch, jax.random.key(1))

    # Sharded over the 8-device mesh
    mesh = make_mesh()
    sharded_state = replicate(state, mesh)
    sharded_batch = shard_batch(batch, mesh)
    new_state, m_shard = step(sharded_state, sharded_batch, jax.random.key(1))

    np.testing.assert_allclose(float(m_ref["loss"]), float(m_shard["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m_ref["grad_norm"]),
                               float(m_shard["grad_norm"]), rtol=1e-4)
    # Updated params stay finite and usable
    leaves = jax.tree_util.tree_leaves(new_state.params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_sp_mesh_axes_and_layout():
    from ode_rl_tpu.parallel.sp import make_sp_mesh, shard_batch_sp

    mesh = make_sp_mesh(n_data=4, n_space=2)
    assert mesh.axis_names == ("data", "space")
    assert mesh.devices.shape == (4, 2)
    video = jnp.zeros((8, 4, 64, 64, 1))
    batch = make_batch_dict(video, n_in=2)
    sharded = shard_batch_sp(batch, mesh)
    spec = sharded["observed_data"].sharding.spec
    assert spec[0] == "data" and spec[2] == "space"
    # per-sample vectors shard over data only; timestamps replicate
    assert sharded["observed_mask"].sharding.spec[0] == "data"
    assert all(s is None for s in sharded["observed_tp"].sharding.spec)


@pytest.mark.slow
def test_sp_sharded_train_step_matches_single_device():
    """dp×sp step (batch over 'data', frame height over 'space') must be
    numerically equivalent — GSPMD inserts the conv halo exchanges."""
    from ode_rl_tpu.parallel.sp import make_sp_mesh, shard_batch_sp

    model = ConvGRUModel(in_channels=1, conv_encoder_out_ch=16,
                         convgru_out_ch=16)
    loader = iter(MovingMNIST(batch_size=8, n_frames_input=3,
                              n_frames_output=2))
    batch = make_batch_dict(next(loader), n_in=3)
    state = create_train_state(model, CFG, batch, jax.random.key(0))
    step = make_train_step(model, donate=False)

    _, m_ref = step(state, batch, jax.random.key(1))

    mesh = make_sp_mesh(n_data=4, n_space=2)
    new_state, m_shard = step(replicate(state, mesh),
                              shard_batch_sp(batch, mesh), jax.random.key(1))

    np.testing.assert_allclose(float(m_ref["loss"]), float(m_shard["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m_ref["grad_norm"]),
                               float(m_shard["grad_norm"]), rtol=1e-4)
    leaves = jax.tree_util.tree_leaves(new_state.params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_hoisted_conv_grad_sharding_layout():
    """XLA:SPMD miscompiles the GRADIENT of a SAME-padding conv whose
    batch axis merges (T, B) with T leading while H is sharded over a
    'space' mesh axis — forward is exact, the kernel grad comes out
    orders of magnitude wrong. The framework's scan-input hoists must
    therefore always merge (B, T) with the 'data'-sharded batch dim
    LEADING (nn/odeconvgru.py, nn/convgru.py, models/convlstm.py). This
    test pins both facts: B-leading is exact, and guards the workaround
    staying necessary (if the T-leading case ever becomes exact too, the
    comment in odeconvgru can be simplified)."""
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = np.array(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("data", "space"))
    B, T, H, W, C, F = 4, 3, 8, 8, 4, 8
    x = jax.random.normal(jax.random.key(0), (B, T, H, W, C))
    k = jax.random.normal(jax.random.key(1), (3, 3, C, F))

    def conv(v, kk):
        return jax.lax.conv_general_dilated(
            v, kk, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def f_b_leading(kk, xx):
        return jnp.sum(conv(xx.reshape(B * T, H, W, C), kk) ** 2)

    xsh = jax.device_put(x, NamedSharding(mesh, P("data", None, "space")))
    krep = jax.device_put(k, NamedSharding(mesh, P()))
    g_un = jax.grad(f_b_leading)(k, x)
    g_sh = jax.jit(jax.grad(f_b_leading))(krep, xsh)
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_un),
                               rtol=1e-4, atol=1e-4)
