"""Recurrent Independent Mechanisms (RIMs).

Capability parity with the reference's RIM stack:
  * GroupLinearLayer — per-block batched matmul
    (/root/reference/modules/GroupLinearLayer.py:4-13);
  * Sparse top-k attention + blocked_grad
    (/root/reference/modules/Attention.py:10-54);
  * MultiHeadAttention with block projections and gated-tanh output
    (/root/reference/modules/Attention.py:92-144);
  * BlocksCore — null+input key competition, top-k active-block mask,
    BlockGRU update, optional sparse inter-block communication, masked
    state mixing (/root/reference/modules/BlocksCore.py:7-78);
  * RIM_GRU — multi-layer time unroll with dropout
    (/root/reference/modules/RIM_GRU.py:22-120).

TPU-first: the reference's BlockGRU zeroes off-block-diagonal weight
entries **in-place before every forward**
(/root/reference/modules/BlockGRU.py:7-39) — a mutation that cannot (and
should not) exist under jit. Here the block-diagonal structure is the
parameterization itself: per-block weight tensors contracted with a
batched einsum, which is also what the MXU wants (dense small matmuls,
no masked-out zero FLOPs). The time loop is ``lax.scan``.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@jax.custom_vjp
def blocked_grad(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Identity forward; backward gates the gradient by ``mask``
    (reference Attention.py:33-42)."""
    return x


def _bg_fwd(x, mask):
    return x, mask


def _bg_bwd(mask, g):
    return g * mask, jnp.zeros_like(mask)


blocked_grad.defvjp(_bg_fwd, _bg_bwd)


def sparse_topk_renorm(attn: jnp.ndarray, top_k: int) -> jnp.ndarray:
    """Keep entries ≥ the (top_k+1)-th largest (minus it), renormalize —
    the reference's Sparse_attention (Attention.py:10-31, note it adds 1
    to top_k internally). attn: (..., T) rows of attention weights."""
    eps = 1e-7
    t = attn.shape[-1]
    k = top_k + 1
    if t <= k:
        return attn
    delta = jnp.sort(attn, axis=-1)[..., -k:-k + 1] + eps
    w = jnp.maximum(attn - delta, 0.0)
    return w / (jnp.sum(w, axis=-1, keepdims=True) + eps)


def topk_active_mask(null_attn: jnp.ndarray, topkval: int,
                     dtype=jnp.float32) -> jnp.ndarray:
    """Tie-safe active-block mask: exactly ``topkval`` ones per row,
    picking the blocks with the LOWEST null-key attention.

    A strict threshold comparison (``null_attn < kth``) deactivates every
    block tied with the k-th value, which under bf16 compute or a
    saturated softmax can leave fewer than topkval blocks active;
    lax.top_k breaks ties by index instead. null_attn: (B, K)."""
    b, k = null_attn.shape
    if topkval >= k:
        return jnp.ones_like(null_attn, dtype)
    _, active_idx = jax.lax.top_k(-null_attn.astype(jnp.float32), topkval)
    mask = jnp.zeros((b, k), dtype).at[
        jnp.arange(b)[:, None], active_idx].set(1.0)
    return mask


class GroupLinear(nn.Module):
    """Per-block linear map: (B, K, din) → (B, K, dout) with (K, din,
    dout) weights (reference GroupLinearLayer)."""

    din: int
    dout: int
    num_blocks: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = self.param(
            "w", lambda key, shape, dt: 0.01 * jax.random.normal(key, shape, dt),
            (self.num_blocks, self.din, self.dout), self.param_dtype)
        return jnp.einsum("bki,kio->bko", x, w.astype(self.dtype))


class BlockMultiHeadAttention(nn.Module):
    """Multi-head attention with GroupLinear projections, sparse top-k
    attention, and gated-tanh output (reference MultiHeadAttention)."""

    n_head: int
    d_model_read: int
    d_model_write: int
    d_model_out: int
    d_k: int
    d_v: int
    num_blocks_read: int
    num_blocks_write: int
    topk: int
    residual: bool = True
    skip_write: bool = False
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, train: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b, len_q, _ = q.shape
        len_k = k.shape[1]
        gl = functools.partial(GroupLinear, dtype=self.dtype,
                               param_dtype=self.param_dtype)
        qp = gl(self.d_model_read, self.n_head * self.d_k,
                self.num_blocks_read, name="gln_qs")(q)
        kp = gl(self.d_model_write, self.n_head * self.d_k,
                self.num_blocks_write, name="gln_ks")(k)
        vp = gl(self.d_model_write, self.n_head * self.d_v,
                self.num_blocks_write, name="gln_vs")(v)

        def heads(x, length, d):
            return x.reshape(b, length, self.n_head, d).transpose(0, 2, 1, 3)

        qh = heads(qp, len_q, self.d_k)        # (B, H, Lq, dk)
        kh = heads(kp, len_k, self.d_k)
        vh = heads(vp, len_k, self.d_v)

        attn = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / self.d_k ** 0.5
        attn = jax.nn.softmax(attn, axis=-1)
        attn = sparse_topk_renorm(attn, self.topk)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(b, len_q,
                                                self.n_head * self.d_v)

        gate = jax.nn.sigmoid(nn.Dense(
            self.d_model_out, dtype=self.dtype, param_dtype=self.param_dtype,
            name="gate_fc")(out))
        if not self.skip_write:
            out = nn.Dense(self.d_model_out, dtype=self.dtype,
                           param_dtype=self.param_dtype, name="fc")(out)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        if self.residual:
            out = gate * jnp.tanh(out)
        return out, attn


class BlockGRUCell(nn.Module):
    """GRU whose weight matrices are block-diagonal **by construction**:
    K independent per-block GRUs computed as one batched einsum (replaces
    the reference's in-place weight-zeroing BlockGRU)."""

    ninp: int
    nhid: int
    k: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
        assert self.ninp % self.k == 0 and self.nhid % self.k == 0
        bs_in = self.ninp // self.k
        bs_h = self.nhid // self.k
        b = x.shape[0]
        xb = x.reshape(b, self.k, bs_in)
        hb = h.reshape(b, self.k, bs_h)

        init = nn.initializers.lecun_normal()
        w_i = self.param("w_i", init, (self.k, bs_in, 3 * bs_h),
                         self.param_dtype)
        w_h = self.param("w_h", init, (self.k, bs_h, 3 * bs_h),
                         self.param_dtype)
        b_i = self.param("b_i", nn.initializers.zeros, (self.k, 3 * bs_h),
                         self.param_dtype)
        b_h = self.param("b_h", nn.initializers.zeros, (self.k, 3 * bs_h),
                         self.param_dtype)

        gi = jnp.einsum("bki,kio->bko", xb, w_i.astype(self.dtype)) + b_i
        gh = jnp.einsum("bki,kio->bko", hb, w_h.astype(self.dtype)) + b_h
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        h_new = (1.0 - z) * n + z * hb
        return h_new.reshape(b, self.nhid)


class BlocksCore(nn.Module):
    """One RIM layer step: input attention against a null key selects the
    top-k active blocks; BlockGRU updates; optional sparse inter-block
    communication; inactive blocks keep their state."""

    ninp: int
    n_hid: int
    num_blocks_in: int
    num_blocks_out: int
    topkval: int
    step_att: bool = True
    sparse_comm: bool = False
    num_modules_read_input: int = 2
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inp: jnp.ndarray, hx: jnp.ndarray,
                 train: bool = True, do_block: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b = inp.shape[0]
        bs_out = self.n_hid // self.num_blocks_out
        att_out = bs_out * 4

        # Null + input keys (reference BlocksCore.py:40-44).
        inp_use = inp.reshape(b, self.num_blocks_in, self.ninp)
        inp_use = jnp.tile(inp_use, (1, self.num_modules_read_input - 1, 1))
        inp_use = jnp.concatenate(
            [jnp.zeros_like(inp_use[:, :1]), inp_use], axis=1)

        inp_att = BlockMultiHeadAttention(
            n_head=1, d_model_read=bs_out, d_model_write=self.ninp,
            d_model_out=att_out, d_k=64, d_v=att_out,
            num_blocks_read=self.num_blocks_out,
            num_blocks_write=self.num_modules_read_input,
            topk=self.num_blocks_in + 1, residual=False, skip_write=True,
            dropout=self.dropout, dtype=self.dtype,
            param_dtype=self.param_dtype, name="inp_att")
        q = hx.reshape(b, self.num_blocks_out, bs_out)
        attended, iatt = inp_att(q, inp_use, inp_use, train=train)
        attended = attended.reshape(b, att_out * self.num_blocks_out)
        iatt = iatt[:, 0]  # single head → (B, num_blocks_out, keys)

        # Active-block mask: blocks attending most to the NULL key are
        # switched off (keep topkval active).
        null_attn = iatt[:, :, 0]                       # (B, num_blocks_out)
        mask_blocks = topk_active_mask(null_attn, self.topkval, self.dtype)
        mask = jnp.repeat(mask_blocks, bs_out, axis=-1)  # (B, n_hid)
        mask = jax.lax.stop_gradient(mask)

        hx_new = BlockGRUCell(
            ninp=att_out * self.num_blocks_out, nhid=self.n_hid,
            k=self.num_blocks_out, dtype=self.dtype,
            param_dtype=self.param_dtype, name="block_gru")(attended, hx)

        if do_block and self.sparse_comm and self.step_att:
            comm = BlockMultiHeadAttention(
                n_head=4, d_model_read=bs_out, d_model_write=bs_out,
                d_model_out=bs_out, d_k=16, d_v=16,
                num_blocks_read=self.num_blocks_out,
                num_blocks_write=self.num_blocks_out,
                topk=self.num_blocks_out, residual=True,
                dropout=self.dropout, dtype=self.dtype,
                param_dtype=self.param_dtype, name="comm_att")
            hb = hx_new.reshape(b, self.num_blocks_out, bs_out)
            hb_masked = blocked_grad(
                hb, mask.reshape(b, self.num_blocks_out, bs_out))
            delta, _ = comm(hb_masked, hb_masked, hb_masked, train=train)
            hx_new = (hb + delta).reshape(b, self.n_hid)

        hx_out = mask * hx_new + (1.0 - mask) * hx
        return hx_out, mask


class RIM(nn.Module):
    """Multi-layer RIM over a time axis (reference RIM_GRU).

    Input (B, T, ninp) → (outputs (B, T, n_hid[-1]), final hiddens)."""

    ninp: int
    n_hid: Sequence[int]
    num_blocks: Sequence[int]
    topk: Sequence[int]
    sparse_comm: bool = False
    use_inactive: bool = True
    use_blocked_grad: bool = False
    dropout: float = 0.5
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: jnp.ndarray,
                 h0: Optional[Sequence[jnp.ndarray]] = None,
                 train: bool = True):
        b, t, _ = xs.shape
        nlayers = len(self.n_hid)
        layer_input = xs
        final_hidden = []
        for i in range(nlayers):
            core = BlocksCore(
                ninp=self.ninp if i == 0 else self.n_hid[i - 1],
                n_hid=self.n_hid[i],
                num_blocks_in=1,
                num_blocks_out=self.num_blocks[i],
                topkval=self.topk[i],
                sparse_comm=self.sparse_comm,
                dropout=self.dropout,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"core_{i}")

            scan = nn.scan(
                lambda mod, carry, x_t: _rim_step(mod, carry, x_t, train),
                variable_broadcast="params",
                split_rngs={"params": False, "dropout": True},
                in_axes=1, out_axes=1)
            h_init = (h0[i] if h0 is not None
                      else jnp.zeros((b, self.n_hid[i]), self.dtype))
            h_last, (hs, masks) = scan(core, h_init, layer_input)
            final_hidden.append(h_last)

            if i < nlayers - 1:
                if self.use_inactive:
                    out = blocked_grad(hs, masks) if self.use_blocked_grad else hs
                else:
                    out = masks * (blocked_grad(hs, masks)
                                   if self.use_blocked_grad else hs)
                layer_input = nn.Dropout(
                    self.dropout, deterministic=not train)(out)
            else:
                layer_input = hs
        output = nn.Dropout(self.dropout, deterministic=not train)(layer_input)
        return output, final_hidden


def _rim_step(core, carry, x_t, train):
    h_new, mask = core(x_t, carry, train=train)
    return h_new, (h_new, mask)


class BlockConvGRUCell(nn.Module):
    """ConvGRU whose gate/candidate convs are channel-block-diagonal by
    construction: K independent per-block conv-GRUs realized with grouped
    convolutions (``feature_group_count=K``).

    The reference's BlockCGRU is an empty stub
    (/root/reference/modules/BlockGRU.py:45-50); this is the TPU-native
    realization of the structure it names — the spatial analogue of
    BlockGRU, where block-diagonality comes from the parameterization
    (grouped conv) instead of in-place weight zeroing."""

    nhid: int                 # total hidden channels (K blocks of nhid/K)
    k: int
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
        assert self.nhid % self.k == 0
        assert x.shape[-1] == h.shape[-1] == self.nhid, (
            "per-block input must already be laid out as K channel blocks")
        ks = (self.kernel_size, self.kernel_size)
        conv = functools.partial(
            nn.Conv, kernel_size=ks, padding="SAME",
            feature_group_count=self.k,     # block-diagonal over channels
            dtype=self.dtype, param_dtype=self.param_dtype)
        # Gates read [x ‖ h] blockwise: interleave so each group sees its
        # own block of x and h ((B,H,W,K,2·bs) → channel-major groups).
        b, hh, ww, _ = x.shape
        bs = self.nhid // self.k
        xb = x.reshape(b, hh, ww, self.k, bs)
        hb = h.reshape(b, hh, ww, self.k, bs)
        xh = jnp.concatenate([xb, hb], axis=-1).reshape(
            b, hh, ww, self.k * 2 * bs)
        gates = conv(features=2 * self.nhid, name="gates")(xh)
        r, z = jnp.split(gates.reshape(b, hh, ww, self.k, 2 * bs), 2, axis=-1)
        r = jax.nn.sigmoid(r)
        z = jax.nn.sigmoid(z)
        xrh = jnp.concatenate([xb, r * hb], axis=-1).reshape(
            b, hh, ww, self.k * 2 * bs)
        n = jnp.tanh(conv(features=self.nhid, name="cand")(xrh)
                     ).reshape(b, hh, ww, self.k, bs)
        h_new = (1.0 - z) * n + z * hb
        return h_new.reshape(b, hh, ww, self.nhid)


class ConvBlocksCore(nn.Module):
    """One conv-RIM layer step — the literal ConvBlocksCore the reference
    sketches and abandons (/root/reference/modules/RIM_CGRU.py:48-62):
    spatial block states, null-key input attention over pooled block
    descriptors selecting the top-k active blocks, a BlockConvGRU update,
    optional sparse inter-block communication, and masked state mixing
    (inactive blocks keep their state), mirroring BlocksCore
    (/root/reference/modules/BlocksCore.py:52-77) in the spatial domain."""

    in_ch: int
    n_hid: int                # total hidden channels
    num_blocks_out: int
    topkval: int
    kernel_size: int = 3
    sparse_comm: bool = False
    num_modules_read_input: int = 2
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inp: jnp.ndarray, hx: jnp.ndarray,
                 train: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b, hh, ww, _ = inp.shape
        k = self.num_blocks_out
        bs = self.n_hid // k
        att_out = bs * 4

        # Pooled descriptors: per-block spatial mean of the hidden as the
        # query; [null ‖ pooled input] as keys/values (BlocksCore.py:40-44).
        q = jnp.mean(hx, axis=(1, 2)).reshape(b, k, bs)
        inp_desc = jnp.mean(inp, axis=(1, 2))[:, None, :]  # (B, 1, Cin)
        inp_use = jnp.tile(inp_desc, (1, self.num_modules_read_input - 1, 1))
        inp_use = jnp.concatenate(
            [jnp.zeros_like(inp_use[:, :1]), inp_use], axis=1)

        inp_att = BlockMultiHeadAttention(
            n_head=1, d_model_read=bs, d_model_write=self.in_ch,
            d_model_out=att_out, d_k=64, d_v=att_out,
            num_blocks_read=k, num_blocks_write=self.num_modules_read_input,
            topk=self.num_modules_read_input, residual=False,
            skip_write=True, dropout=self.dropout, dtype=self.dtype,
            param_dtype=self.param_dtype, name="inp_att")
        attended, iatt = inp_att(q, inp_use, inp_use, train=train)
        iatt = iatt[:, 0]                              # (B, K, keys)

        # Top-k active blocks: highest null-key attention → off.
        null_attn = iatt[:, :, 0]
        mask_blocks = topk_active_mask(null_attn, self.topkval, self.dtype)
        mask_blocks = jax.lax.stop_gradient(mask_blocks)  # (B, K)

        # Spatial per-block input: shared conv lifts the frame to K blocks,
        # FiLM-biased by each block's attended read vector.
        x_blocks = nn.Conv(self.n_hid, (self.kernel_size, self.kernel_size),
                           padding="SAME", dtype=self.dtype,
                           param_dtype=self.param_dtype, name="inp_proj")(inp)
        film = GroupLinear(att_out, bs, k, dtype=self.dtype,
                           param_dtype=self.param_dtype, name="att_film")(
            attended.reshape(b, k, att_out))
        x_blocks = x_blocks + film.reshape(b, 1, 1, self.n_hid)

        hx_new = BlockConvGRUCell(
            nhid=self.n_hid, k=k, kernel_size=self.kernel_size,
            dtype=self.dtype, param_dtype=self.param_dtype,
            name="block_cgru")(x_blocks, hx)

        if self.sparse_comm:
            # Communication over pooled block states, broadcast back as a
            # per-block channel bias (BlocksCore.py:68-76 in the spatial
            # domain).
            comm = BlockMultiHeadAttention(
                n_head=4, d_model_read=bs, d_model_write=bs,
                d_model_out=bs, d_k=16, d_v=16,
                num_blocks_read=k, num_blocks_write=k, topk=k,
                residual=True, dropout=self.dropout, dtype=self.dtype,
                param_dtype=self.param_dtype, name="comm_att")
            pooled = jnp.mean(hx_new, axis=(1, 2)).reshape(b, k, bs)
            pooled = blocked_grad(
                pooled, jnp.repeat(mask_blocks[..., None], bs, axis=-1))
            delta, _ = comm(pooled, pooled, pooled, train=train)
            hx_new = hx_new + delta.reshape(b, 1, 1, self.n_hid)

        mask = jnp.repeat(mask_blocks, bs, axis=-1)[:, None, None, :]
        hx_out = mask * hx_new + (1.0 - mask) * hx
        return hx_out, mask_blocks


class ConvRIM(nn.Module):
    """Conv-RIM over a time axis — the working realization of the
    reference's RIM_CGRU (/root/reference/modules/RIM_CGRU.py:10-45, a
    broken skeleton: undefined ``self.bc_list``, empty forward).

    Input (B, T, H, W, Cin) → (per-step states (B, T, H, W, n_hid),
    final hidden, per-step active-block masks (B, T, K))."""

    in_ch: int
    n_hid: int
    num_blocks: int
    topk: int
    kernel_size: int = 3
    sparse_comm: bool = False
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: jnp.ndarray, h0: Optional[jnp.ndarray] = None,
                 train: bool = True):
        b, t, hh, ww, _ = xs.shape
        core = ConvBlocksCore(
            in_ch=self.in_ch, n_hid=self.n_hid,
            num_blocks_out=self.num_blocks, topkval=self.topk,
            kernel_size=self.kernel_size, sparse_comm=self.sparse_comm,
            dropout=self.dropout, dtype=self.dtype,
            param_dtype=self.param_dtype, name="core")
        scan = nn.scan(
            lambda mod, carry, x_t: _rim_step(mod, carry, x_t, train),
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=1, out_axes=1)
        h_init = (h0 if h0 is not None
                  else jnp.zeros((b, hh, ww, self.n_hid), self.dtype))
        h_last, (hs, masks) = scan(core, h_init, xs)
        return hs, h_last, masks
