"""3-D conv encoders and the slot CNN decoders.

Capability parity with /root/reference/modules/DS2VAE_ED.py:10-80 and
/root/reference/modules/S2VAE_ED.py:5-49:
  * C3DEncoder — five Conv3d stages (64→128→256→512→out) with
    LeakyReLU(0.2) and final tanh; the default plan uses kernel (3,4,4),
    stride (1,2,2), padding (0,1,1) (time shrinks by 2 per stage, spatial
    halves); the 'cgru' plan mixes temporal stride-2 stages and ends at
    4×4 spatial; an InstanceNorm variant mirrors the reference flag;
  * SlotCNNDecoder — ConvTranspose + nearest-upsample conv stacks with
    BatchNorm + LeakyReLU and sigmoid output; 's2vae' starts from 1×1,
    'cs2vae'/'ds2vae' from a spatial grid; ``unmasked=False`` adds the
    alpha-mask channel.

Layout: videos are (B, T, H, W, C) = NDHWC for 3-D convs.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class C3DEncoder(nn.Module):
    out_channels: int
    mode: str = "default"          # default | cgru | static | dynamic
    instance_norm: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        lrelu = lambda v: jax.nn.leaky_relu(v, negative_slope=0.2)

        def conv3(feats, k, s, p, name):
            return nn.Conv(
                feats, kernel_size=k, strides=s,
                padding=[(p[0], p[0]), (p[1], p[1]), (p[2], p[2])],
                dtype=self.dtype, param_dtype=self.param_dtype, name=name)

        def inorm(x, name):
            if not self.instance_norm:
                return x
            # InstanceNorm3d: per-sample, per-channel stats over (T,H,W).
            mean = x.mean(axis=(1, 2, 3), keepdims=True)
            var = x.var(axis=(1, 2, 3), keepdims=True)
            return (x - mean) * jax.lax.rsqrt(var + 1e-5)

        if self.mode == "cgru":
            plan = [
                (64, (3, 4, 4), (1, 2, 2), (0, 1, 1)),
                (128, (3, 4, 4), (2, 2, 2), (1, 1, 1)),
                (256, (3, 3, 3), (2, 1, 1), (1, 1, 1)),
                (512, (3, 3, 3), (2, 1, 1), (1, 1, 1)),
                (self.out_channels, (3, 4, 4), (1, 2, 2), (0, 1, 1)),
            ]
        else:
            plan = [(64, (3, 4, 4), (1, 2, 2), (0, 1, 1))] * 1 + [
                (128, (3, 4, 4), (1, 2, 2), (0, 1, 1)),
                (256, (3, 4, 4), (1, 2, 2), (0, 1, 1)),
                (512, (3, 4, 4), (1, 2, 2), (0, 1, 1)),
                (self.out_channels, (3, 4, 4), (1, 2, 2), (0, 1, 1)),
            ]
        for i, (f, k, s, p) in enumerate(plan):
            x = conv3(f, k, s, p, f"conv_{i}")(x)
            x = inorm(x, f"in_{i}")
            x = jnp.tanh(x) if i == len(plan) - 1 else lrelu(x)
        return x


class SlotCNNDecoder(nn.Module):
    """Shared CNN decoder over concatenated slot latents."""

    out_channels: int
    variant: str = "s2vae"          # s2vae | cs2vae | ds2vae
    unmasked: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        out_ch = self.out_channels + (0 if self.unmasked else 1)
        lrelu = lambda v: jax.nn.leaky_relu(v, negative_slope=0.2)
        conv = lambda feats, k, name: nn.Conv(
            feats, (k, k), padding=(k - 1) // 2, dtype=self.dtype,
            param_dtype=self.param_dtype, name=name)
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=self.param_dtype, name=name)

        def up2(z):
            b, h, w, c = z.shape
            return jax.image.resize(z, (b, 2 * h, 2 * w, c), "nearest")

        if self.variant == "s2vae":
            x = nn.ConvTranspose(256, (4, 4), padding="VALID",
                                 dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name="deconv_in")(x)   # 1×1 → 4×4
        else:
            x = nn.ConvTranspose(256, (3, 3), padding="SAME",
                                 dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name="deconv_in")(x)
        x = lrelu(bn("bn_in")(x))
        for i, f in enumerate([128, 64, 32, 16]):
            x = up2(x)
            x = lrelu(bn(f"bn_{i}")(conv(f, 3, f"conv_{i}")(x)))
        x = conv(out_ch, 1, "conv_out")(x)
        return jax.nn.sigmoid(x)
