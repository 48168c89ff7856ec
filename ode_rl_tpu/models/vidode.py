"""VidODE — continuous-time video prediction with flow composition.

Capability parity with the reference's in-repo Vid-ODE re-implementation
(/root/reference/models/VidODE.py:46-227, same architecture as the
official sub-repo /root/reference/Vid-ODE/models/conv_odegru.py):
conv encoder (BatchNorm stack, ×2^n_downs downsample) → backward
ODE-ConvGRU z0 inference → Neural-ODE latent decode over
``tp_to_predict`` → a decoder maps [sol_y(t), sol_y(t-1)] to
(flow 2ch, intermediate Cch, mask 1ch) at full resolution → the last
observed frame is warped **recursively** by the flows (grid_sample with
border padding, flow normalized by (w-1)/2 — reference :162-186) and
composited: ``pred = mask·warped + (1-mask)·intermediate`` (:131).
Loss = L1(pred, target) + L1(intermediates, frame-diffs) (:212-227).

TPU-first notes:
  * the reference's get_flowmaps Python loop feeds [sol_y(t), prev] where
    prev is just the shifted latent sequence — so the decode is a single
    batched conv pass, not a loop;
  * only the warp chain is truly recursive; it runs as a ``lax.scan``
    over the bilinear-warp op (ops/warp.py — the XLA-gather equivalent of
    the reference's resample2d/grid_sample CUDA path);
  * masks gate the ConvGRU encoder steps exactly like the reference's
    irregular-timestamp path (base_conv_gru mask gating).
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ode_rl_tpu.nn.conv_stacks import ConvNet
from ode_rl_tpu.nn.odeconvgru import ODEConvGRUEncoder
from ode_rl_tpu.nn.slot_attention import (SlotAttention, SoftPositionEmbed,
                                          spatial_broadcast)
from ode_rl_tpu.ode import odeint_aux
from ode_rl_tpu.ops.warp import grid_sample


class _VidODEEncoder(nn.Module):
    ch: int = 32
    n_downs: int = 2
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=self.param_dtype, name=name)
        ch = self.ch
        x = jax.nn.relu(bn("bn_in")(nn.Conv(
            ch, (3, 3), padding=1, dtype=self.dtype,
            param_dtype=self.param_dtype, name="conv_in")(x)))
        for i in range(self.n_downs):
            x = jax.nn.relu(bn(f"bn_{i}")(nn.Conv(
                ch * 2, (4, 4), strides=(2, 2), padding=1, dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"conv_{i}")(x)))
            ch *= 2
        return x


class _VidODEDecoder(nn.Module):
    out_dim: int
    n_ups: int = 2
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=self.param_dtype, name=name)
        ch = x.shape[-1]
        for i in range(self.n_ups):
            b, h, w, c = x.shape
            x = jax.image.resize(x, (b, 2 * h, 2 * w, c), "bilinear")
            x = jax.nn.relu(bn(f"bn_{i}")(nn.Conv(
                ch // 2, (3, 3), padding=1, dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"conv_{i}")(x)))
            ch //= 2
        return nn.Conv(self.out_dim, (3, 3), padding=1, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="conv_out")(x)


class VidODEModel(nn.Module):
    """``slot_attention=True`` enables the per-slot pipeline the reference
    gates behind ``--slot_attention --pos --num_slots --dim``
    (Vid-ODE/main.py:41-45). The reference ships that variant UNFINISHED:
    its Encoder's slot branch is fully commented out
    (base_conv_gru.py:292-339), the per-slot driver loop exists
    (conv_odegru.py:219-289) but returns the un-composited slot stack,
    and only the ``pos==2`` decoder sizing is live (conv_odegru.py:83-90,
    "final channel is alpha mask for slot attention"). This is a working
    completion of that design, kept pinned to what IS written:

      * encoder features → SoftPositionEmbed → spatial flatten →
        LayerNorm/MLP → SlotAttention → per-slot spatial broadcast
        (the commented steps 1-6, base_conv_gru.py:314-339);
      * slots fold into the batch axis ((B·S) programs — the TPU-native
        form of the reference's Python loop over slots sharing one
        encoder_z0/diffeq_solver, conv_odegru.py:223-266);
      * per-slot decode emits flow(2) + intermediate(C) + mask(1) +
        alpha(1) (the pos==2 channel plan, conv_odegru.py:87-90), each
        slot warps the last observed frame with its own flow chain and
        composites mask·warped + (1−mask)·inter (conv_odegru.py:264);
      * cross-slot composition — absent from the reference — is an
        alpha-softmax blend over slots, the convention the same repo uses
        for its other slot decoders (models/S3VAE.py:469-474
        unstack_and_split / S2VAE's shared decoder);
      * slot-init noise is drawn once per video and shared across frames
        so slot identities stay temporally bound (the reference's
        per-frame independent SA has no such binding — a completion
        choice, documented not hidden);
      * ``pos==1`` is rejected: every pos==1 branch in the reference is
        a bare ``pass`` (conv_odegru.py:84-85,116-117,159-160) — there
        is no design to complete.
    """

    in_channels: int = 1
    n_downs: int = 2
    base_ch: int = 32
    n_layers: int = 3
    method: str = "dopri5"
    rtol: float = 1e-3
    atol: float = 1e-4
    ode_max_steps: int = 128
    slot_attention: bool = False
    num_slots: int = 4            # reference --num_slots default 4
    slot_dim: int = 32            # reference --dim default 32
    pos: int = 2                  # reference --pos placement choice
    slot_iters: int = 3           # reference --slot_iters default 3
    # Memory-mode decode (reference --nru/--nru2, Vid-ODE/main.py +
    # ode_func.py:34-67; stable forms in ode/memory.py).
    mem: bool = False
    mem_mode: str = "nru"
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def predict(self, batch: Dict, train: bool = True
                ) -> Tuple[jnp.ndarray, Dict]:
        inputs = batch["observed_data"].astype(self.dtype) + 0.5  # [0, 1]
        observed_tp = batch["observed_tp"]
        tp_to_predict = batch["tp_to_predict"]
        mask = batch.get("observed_mask")
        b, t_in, h, w, c = inputs.shape
        latent_ch = self.base_ch * (2 ** self.n_downs)

        encoder = _VidODEEncoder(ch=self.base_ch, n_downs=self.n_downs,
                                 dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name="conv_encoder")
        enc = encoder(inputs.reshape(b * t_in, h, w, c), train=train)
        eh, ew = enc.shape[1], enc.shape[2]

        if self.slot_attention:
            if self.pos != 2:
                raise NotImplementedError(
                    "pos=1 slot placement is a dead `pass` branch in the "
                    "reference (Vid-ODE/models/conv_odegru.py:84-85,"
                    "116-117,159-160) — only pos=2 has a design to build")
            s, d = self.num_slots, self.slot_dim
            # Steps 2-5 of the commented encoder plan: position code,
            # spatial flatten, LayerNorm+MLP, slot attention.
            feats = SoftPositionEmbed(
                hidden_size=latent_ch, dtype=self.dtype,
                param_dtype=self.param_dtype, name="encoder_pos")(enc)
            flat = feats.reshape(b * t_in, eh * ew, latent_ch)
            # One slot-init draw per video, shared across its frames.
            # ``batch['slot_noise']`` ((B, S, d)) overrides the draw —
            # deterministic eval + the permutation-equivariance test.
            noise = batch.get("slot_noise")
            noise = (noise.astype(self.dtype) if noise is not None else
                     jax.random.normal(self.make_rng("sample"), (b, s, d),
                                       self.dtype))
            noise_bt = jnp.tile(noise[:, None], (1, t_in, 1, 1)).reshape(
                b * t_in, s, d)
            slots = SlotAttention(
                num_slots=s, num_iterations=self.slot_iters, slot_size=d,
                mlp_hidden_size=d, dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="slot_attention")(flat, init_noise=noise_bt)
            # Step 6: broadcast each slot over the latent grid, then fold
            # slots into batch: (B, T, S, ...) → (B·S, T, eh, ew, d).
            bcast = spatial_broadcast(slots, (eh, ew))       # (B·T·S,...)
            bcast = bcast.reshape(b, t_in, s, eh, ew, d)
            enc_seq = jnp.moveaxis(bcast, 2, 1).reshape(
                b * s, t_in, eh, ew, d)
            if mask is not None:
                # Mask is per-video; slots share their video's mask.
                mask = jnp.repeat(mask, s, axis=0)
            n_prog, ch_lat = b * s, d
            ode_units = d                  # reference: n_units=slot_dim
            out_extra = 2                  # mask + alpha channels
        else:
            enc_seq = enc.reshape(b, t_in, eh, ew, latent_ch)
            n_prog, ch_lat = b, latent_ch
            ode_units = latent_ch // 2
            out_extra = 1                  # mask channel only

        z0_encoder = ODEConvGRUEncoder(
            ch=ch_lat, ode_n_layers=self.n_layers,
            ode_n_units=ode_units, dtype=self.dtype,
            param_dtype=self.param_dtype, name="encoder_z0")
        mu, _std, _ = z0_encoder(enc_seq, observed_tp, mask=mask)

        ode_func = ConvNet(out_ch=ch_lat, n_layers=self.n_layers,
                           n_units=ode_units, activation="relu",
                           final_tanh=False, dtype=self.dtype,
                           param_dtype=self.param_dtype,
                           name="ode_decoder_func")
        _ = ode_func(mu)  # prime params outside the solver's control flow
        if self.mem:
            from ode_rl_tpu.ode.memory import odeint_memory
            ys, mem_stats = odeint_memory(
                lambda t, y: ode_func(y), mu, observed_tp[-1],
                tp_to_predict, method=self.method, rtol=self.rtol,
                atol=self.atol, max_steps=self.ode_max_steps,
                mode=self.mem_mode)
            stats_nfe = mem_stats["nfe"]
            stats_converged = jnp.asarray(1, jnp.int32)
        else:
            ys, stats = odeint_aux(
                lambda t, y: ode_func(y), mu, tp_to_predict,
                method=self.method, rtol=self.rtol,
                atol=self.atol, max_steps=self.ode_max_steps)
            stats_nfe = stats.nfe
            stats_converged = stats.converged.astype(jnp.int32)
        sol_y = jnp.moveaxis(ys, 0, 1)              # (N, T, eh, ew, C)
        t_out = sol_y.shape[1]

        # Flow/intermediate/mask maps: decoder consumes [sol_y(t), prev]
        # where prev is the shifted latent sequence seeded by the last
        # observed frame's embedding — batched, no loop.
        skip_embed = enc_seq[:, -1]
        prev_seq = jnp.concatenate([skip_embed[:, None], sol_y[:, :-1]],
                                   axis=1)
        dec_in = jnp.concatenate([sol_y, prev_seq], axis=-1)
        decoder = _VidODEDecoder(out_dim=self.in_channels + 2 + out_extra,
                                 n_ups=self.n_downs, dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name="conv_decoder")
        maps = decoder(dec_in.reshape(n_prog * t_out, eh, ew, -1),
                       train=train)
        maps = maps.reshape(n_prog, t_out, h, w, -1)
        flows = maps[..., :2]
        intermediates = maps[..., 2:2 + self.in_channels]
        masks = jax.nn.sigmoid(
            maps[..., 2 + self.in_channels:3 + self.in_channels])

        # Recursive warping of the last observed frame by the flows
        # (per slot in the slot variant — each slot has its own chain,
        # reference conv_odegru.py:252-262 loops this per slot).
        xs = jnp.linspace(-1.0, 1.0, w)
        ys_g = jnp.linspace(-1.0, 1.0, h)
        base_grid = jnp.stack(jnp.meshgrid(xs, ys_g, indexing="xy"), axis=-1)
        base_grid = jnp.broadcast_to(base_grid, (n_prog, h, w, 2))
        norm = jnp.array([(w - 1.0) / 2.0, (h - 1.0) / 2.0], self.dtype)

        def warp_step(last_frame, flow):
            g = base_grid + flow / norm
            warped = grid_sample(last_frame, g, padding="border")
            return warped, warped

        last_frame = inputs[:, -1]
        if self.slot_attention:
            last_frame = jnp.repeat(last_frame, self.num_slots, axis=0)
        _, warped_seq = jax.lax.scan(
            warp_step, last_frame, jnp.moveaxis(flows, 0, 1))
        warped = jnp.moveaxis(warped_seq, 0, 1)      # (N, T, H, W, C)

        pred = masks * warped + (1.0 - masks) * intermediates

        if self.slot_attention:
            # Cross-slot composition: softmax the alpha channel over the
            # slot axis, blend per-slot predictions (and intermediates,
            # which feed the diff loss).
            s = self.num_slots
            unfold = lambda v: v.reshape((b, s) + v.shape[1:])
            alpha = jax.nn.softmax(
                unfold(maps[..., 3 + self.in_channels:]), axis=1)
            pred = jnp.sum(alpha * unfold(pred), axis=1)
            intermediates = jnp.sum(alpha * unfold(intermediates), axis=1)
            flows = unfold(flows)
            masks = unfold(masks)

        aux = {
            "nfe": stats_nfe,
            "ode_converged": stats_converged,
            # underscore-prefixed entries are arrays for the loss /
            # diagnostics, filtered out of scalar metric dicts
            "_intermediates": intermediates,
            "_flows": flows,
            "_masks": masks,
        }
        return pred.astype(jnp.float32), aux

    # ------------------------------------------------------------------
    def loss(self, batch: Dict, train: bool = True):
        pred, aux = self.predict(batch, train=train)
        target = batch["data_to_predict"].astype(jnp.float32) + 0.5
        inter = aux.pop("_intermediates").astype(jnp.float32)

        recon_l1 = jnp.mean(jnp.abs(pred - target))
        # Frame-difference supervision for the intermediates: diffs of
        # [last observed frame; targets] (reference :212-219).
        init = batch["observed_data"][:, -1:].astype(jnp.float32) + 0.5
        seq = jnp.concatenate([init, target], axis=1)
        diffs = seq[:, 1:] - seq[:, :-1]
        diff_l1 = jnp.mean(jnp.abs(inter - diffs))

        loss = recon_l1 + diff_l1
        metrics = {"loss": loss, "recon_l1": recon_l1, "diff_l1": diff_l1,
                   **{k: v for k, v in aux.items()
                      if not k.startswith("_")}}
        return loss, (metrics, pred)
