"""Unit tests for nn modules: slot attention, RIMs, C3D, ConvGRU cell."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from ode_rl_tpu.nn.c3d import C3DEncoder, SlotCNNDecoder
from ode_rl_tpu.nn.convgru import ConvGRUCell
from ode_rl_tpu.nn.rims import (
    RIM, BlockGRUCell, BlocksCore, blocked_grad, sparse_topk_renorm)
from ode_rl_tpu.nn.slot_attention import SlotAttention, spatial_broadcast


# ----------------------------- slot attention ------------------------------

@pytest.mark.slow
def test_slot_attention_shapes_and_permutation_invariance():
    model = SlotAttention(num_slots=3, num_iterations=2, slot_size=16)
    x = jax.random.normal(jax.random.key(0), (2, 10, 8))
    variables = model.init(
        {"params": jax.random.key(1), "sample": jax.random.key(2)}, x)
    slots = model.apply(variables, x, rngs={"sample": jax.random.key(3)})
    assert slots.shape == (2, 3, 16)

    # Permuting the input set must not change the slots (same init noise).
    perm = jax.random.permutation(jax.random.key(4), 10)
    slots_p = model.apply(variables, x[:, perm],
                          rngs={"sample": jax.random.key(3)})
    np.testing.assert_allclose(np.asarray(slots), np.asarray(slots_p),
                               atol=1e-4)


def test_spatial_broadcast():
    slots = jnp.arange(2 * 3 * 4, dtype=jnp.float32).reshape(2, 3, 4)
    grid = spatial_broadcast(slots, (5, 6))
    assert grid.shape == (6, 5, 6, 4)
    np.testing.assert_allclose(np.asarray(grid[0, 0, 0]),
                               np.asarray(slots[0, 0]))
    np.testing.assert_allclose(np.asarray(grid[0, 4, 5]),
                               np.asarray(slots[0, 0]))


# --------------------------------- RIMs ------------------------------------

def test_sparse_topk_renorm():
    attn = jnp.array([[0.05, 0.1, 0.4, 0.25, 0.2]])
    out = sparse_topk_renorm(attn, top_k=2)
    # only values above the 3rd largest survive
    assert float(out[0, 0]) == 0.0 and float(out[0, 1]) == 0.0
    np.testing.assert_allclose(float(out.sum()), 1.0, rtol=1e-5)


def test_sparse_topk_passthrough_when_small():
    attn = jnp.array([[0.6, 0.4]])
    out = sparse_topk_renorm(attn, top_k=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(attn))


def test_topk_active_mask_tie_safe():
    """Ties at the k-th null-attention value (possible under bf16 or a
    saturated softmax) must still yield exactly topkval active blocks —
    a strict threshold would deactivate every tied block."""
    from ode_rl_tpu.nn.rims import topk_active_mask
    # All-equal row (fully saturated), plus a tie exactly at the cutoff.
    null_attn = jnp.array([
        [0.25, 0.25, 0.25, 0.25],
        [0.1, 0.2, 0.2, 0.5],
    ])
    mask = topk_active_mask(null_attn, topkval=2)
    assert mask.shape == (2, 4)
    np.testing.assert_array_equal(np.asarray(mask.sum(-1)), [2.0, 2.0])
    # Lowest null-attention block is always kept.
    assert float(mask[1, 0]) == 1.0 and float(mask[1, 3]) == 0.0
    # topkval >= K passes everything through.
    np.testing.assert_array_equal(
        np.asarray(topk_active_mask(null_attn, topkval=4)), np.ones((2, 4)))


def test_blocked_grad():
    x = jnp.ones((2, 4))
    mask = jnp.array([[1.0, 1.0, 0.0, 0.0]] * 2)
    # forward identity
    np.testing.assert_allclose(np.asarray(blocked_grad(x, mask)),
                               np.asarray(x))
    g = jax.grad(lambda x: jnp.sum(blocked_grad(x, mask)))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(mask))


def test_block_gru_is_block_diagonal():
    """Gradients of block j's output w.r.t. block i≠j's input are zero."""
    cell = BlockGRUCell(ninp=8, nhid=8, k=2)
    x = jax.random.normal(jax.random.key(0), (1, 8))
    h = jax.random.normal(jax.random.key(1), (1, 8))
    params = cell.init(jax.random.key(2), x, h)

    def block0_out(x_in):
        return jnp.sum(cell.apply(params, x_in, h)[:, :4])

    g = jax.grad(block0_out)(x)
    assert float(jnp.abs(g[:, 4:]).max()) == 0.0  # no cross-block leakage
    assert float(jnp.abs(g[:, :4]).max()) > 0.0


@pytest.mark.slow
def test_blocks_core_topk_mask():
    core = BlocksCore(ninp=16, n_hid=32, num_blocks_in=1, num_blocks_out=4,
                      topkval=2)
    inp = jax.random.normal(jax.random.key(0), (3, 16))
    hx = jax.random.normal(jax.random.key(1), (3, 32))
    variables = core.init(
        {"params": jax.random.key(2), "dropout": jax.random.key(3)},
        inp, hx, train=False)
    h_new, mask = core.apply(variables, inp, hx, train=False)
    assert h_new.shape == (3, 32)
    # exactly topkval of num_blocks_out blocks active per sample
    per_block = np.asarray(mask).reshape(3, 4, 8)[:, :, 0]
    assert (per_block.sum(-1) == 2).all()
    # inactive blocks keep their previous state
    inactive = np.asarray(mask) == 0
    np.testing.assert_allclose(np.asarray(h_new)[inactive],
                               np.asarray(hx)[inactive])


@pytest.mark.slow
def test_rim_stack_over_time():
    rim = RIM(ninp=16, n_hid=[32], num_blocks=[4], topk=[2])
    xs = jax.random.normal(jax.random.key(0), (2, 6, 16))
    variables = rim.init(
        {"params": jax.random.key(1), "dropout": jax.random.key(2)},
        xs, train=False)
    out, hidden = rim.apply(variables, xs, train=False)
    assert out.shape == (2, 6, 32)
    assert hidden[0].shape == (2, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_block_conv_gru_is_block_diagonal():
    """The grouped-conv GRU keeps channel blocks independent: block 0's
    output has zero gradient w.r.t. block 1's input channels."""
    from ode_rl_tpu.nn.rims import BlockConvGRUCell

    cell = BlockConvGRUCell(nhid=8, k=2, kernel_size=3)
    x = jax.random.normal(jax.random.key(0), (1, 4, 4, 8))
    h = jax.random.normal(jax.random.key(1), (1, 4, 4, 8))
    params = cell.init(jax.random.key(2), x, h)

    def block0_out(x_in):
        return jnp.sum(cell.apply(params, x_in, h)[..., :4])

    g = jax.grad(block0_out)(x)
    assert float(jnp.abs(g[..., 4:]).max()) == 0.0
    assert float(jnp.abs(g[..., :4]).max()) > 0.0


@pytest.mark.slow
def test_conv_blocks_core_topk_mask_and_state_keep():
    from ode_rl_tpu.nn.rims import ConvBlocksCore

    core = ConvBlocksCore(in_ch=6, n_hid=16, num_blocks_out=4, topkval=2)
    inp = jax.random.normal(jax.random.key(0), (3, 8, 8, 6))
    hx = jax.random.normal(jax.random.key(1), (3, 8, 8, 16))
    variables = core.init(
        {"params": jax.random.key(2), "dropout": jax.random.key(3)},
        inp, hx, train=False)
    h_new, mask_blocks = core.apply(variables, inp, hx, train=False)
    assert h_new.shape == (3, 8, 8, 16)
    assert (np.asarray(mask_blocks).sum(-1) == 2).all()
    # inactive blocks keep their spatial state exactly
    m = np.repeat(np.asarray(mask_blocks), 4, axis=-1)[:, None, None, :]
    inactive = np.broadcast_to(m == 0, h_new.shape)
    np.testing.assert_allclose(np.asarray(h_new)[inactive],
                               np.asarray(hx)[inactive])


@pytest.mark.slow
def test_conv_rim_over_time():
    from ode_rl_tpu.nn.rims import ConvRIM

    rim = ConvRIM(in_ch=4, n_hid=16, num_blocks=4, topk=2, sparse_comm=True)
    xs = jax.random.normal(jax.random.key(0), (2, 5, 8, 8, 4))
    variables = rim.init(
        {"params": jax.random.key(1), "dropout": jax.random.key(2)},
        xs, train=False)
    hs, h_last, masks = rim.apply(variables, xs, train=False)
    assert hs.shape == (2, 5, 8, 8, 16)
    assert h_last.shape == (2, 8, 8, 16)
    assert masks.shape == (2, 5, 4)
    assert np.isfinite(np.asarray(hs)).all()


# --------------------------------- C3D -------------------------------------

@pytest.mark.slow
def test_c3d_encoder_default_shapes():
    enc = C3DEncoder(out_channels=24, mode="default")
    x = jnp.zeros((2, 13, 32, 32, 8))
    params = enc.init(jax.random.key(0), x)
    out = enc.apply(params, x)
    # time shrinks by 2 per stage (5 stages), spatial halves per stage
    assert out.shape == (2, 3, 1, 1, 24)


@pytest.mark.slow
def test_c3d_encoder_cgru_shapes():
    enc = C3DEncoder(out_channels=24, mode="cgru")
    x = jnp.zeros((2, 16, 32, 32, 8))
    params = enc.init(jax.random.key(0), x)
    out = enc.apply(params, x)
    assert out.shape[-1] == 24
    assert out.shape[2] == 4 and out.shape[3] == 4  # 4×4 spatial


@pytest.mark.slow
def test_slot_decoder_ranges():
    dec = SlotCNNDecoder(out_channels=1, variant="s2vae")
    x = jax.random.normal(jax.random.key(0), (4, 1, 1, 64))
    variables = dec.init(jax.random.key(1), x, train=False)
    out = dec.apply(variables, x, train=False)
    assert out.shape == (4, 64, 64, 1)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


# ------------------------------ ConvGRU cell --------------------------------

def test_convgru_mask_freezes_state():
    cell = ConvGRUCell(hidden_dim=8, kernel_size=3)
    h = jax.random.normal(jax.random.key(0), (2, 4, 4, 8))
    x = jax.random.normal(jax.random.key(1), (2, 4, 4, 8))
    params = cell.init(jax.random.key(2), h, x)
    frozen = cell.apply(params, h, x, jnp.zeros((2,)))
    np.testing.assert_allclose(np.asarray(frozen), np.asarray(h))
    updated = cell.apply(params, h, x, jnp.ones((2,)))
    assert float(jnp.abs(updated - h).max()) > 0
