"""FlowNet2 optical-flow network family.

Capability parity with /root/reference/flownet2-pytorch/ (SURVEY §2.6):
  * FlowNetS — stacked conv flow net on the concatenated image pair
    (networks/FlowNetS.py; 7×7/5×5/3×3 contracting plan with per-scale
    flow prediction and deconv refinement);
  * FlowNetC — per-image feature pyramids + the correlation cost volume
    (ops/correlation.py, the TPU replacement for correlation_cuda;
    max_displacement 20 / stride 2 / pad 20 exactly like
    networks/FlowNetC.py:28-31) + redirect conv;
  * FlowNetSD — all-3×3 "small displacement" variant with inter-conv
    refinements (networks/FlowNetSD.py);
  * FlowNetFusion — shallow fusion net (networks/FlowNetFusion.py);
  * FlowNet2 — the full C→S→S + SD + fusion stack
    (/root/reference/flownet2-pytorch/models.py:40-195) with resample2d
    warping between stages and channelnorm brightness-error inputs (the
    other two CUDA ops, ops/warp.py + ops/channelnorm.py);
  * FlowNetCS / FlowNetCSS — the intermediate stacks (models.py:197-470).

TPU-first: NHWC layout; bf16 compute / fp32 params replaces the
reference's fp16 + fp32-copy trick (flownet2-pytorch/main.py:200-207);
warping/correlation are the named ops with XLA/Pallas backends.
"""

from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ode_rl_tpu.ops.channelnorm import channelnorm
from ode_rl_tpu.ops.correlation import correlation
from ode_rl_tpu.ops.warp import resample2d


def _leaky(x):
    return jax.nn.leaky_relu(x, negative_slope=0.1)


class _Conv(nn.Module):
    feats: int
    kernel: int = 3
    stride: int = 1
    act: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.feats, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=(self.kernel - 1) // 2, dtype=self.dtype,
                    name="conv")(x)
        return _leaky(x) if self.act else x


class _Deconv(nn.Module):
    feats: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.ConvTranspose(self.feats, (4, 4), strides=(2, 2),
                             padding="SAME", dtype=self.dtype,
                             name="deconv")(x)
        return _leaky(x)


class _UpFlow(nn.Module):
    # The reference's flow-upsampling deconvs are bias-free in FlowNetS
    # only (FlowNetS.py:41-44: ConvTranspose2d(..., bias=False)); they are
    # biased in FlowNetC (FlowNetC.py:53-56), FlowNetSD (FlowNetSD.py:47-50)
    # and FlowNetFusion.
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, flow):
        return nn.ConvTranspose(2, (4, 4), strides=(2, 2), padding="SAME",
                                use_bias=self.use_bias, dtype=self.dtype,
                                name="upflow")(flow)


def _predict_flow(x, name, dtype):
    return nn.Conv(2, (3, 3), padding=1, use_bias=True, dtype=dtype,
                   name=name)(x)


class _Refinement(nn.Module):
    """Shared expanding part: deconv + concat(skip, upsampled flow) →
    predict flow per scale; returns [flow2..flow6] coarse-to-fine-last.

    ``inter_channels`` enables the FlowNetSD-style ``i_conv`` stage
    (FlowNetSD.py:36-39): a 3×3 conv with NO activation applied to the
    concat, with the per-scale flow predicted from its output while the
    next deconv still reads the raw concat."""

    channels: Tuple[int, ...] = (512, 256, 128, 64)
    inter_channels: Tuple[int, ...] = ()
    upflow_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, skips: List[jnp.ndarray], bottom: jnp.ndarray):
        flows = []
        flow = _predict_flow(bottom, "predict_flow6", self.dtype)
        flows.append(flow)
        x = bottom
        for i, (skip, ch) in enumerate(zip(reversed(skips), self.channels)):
            up_feat = _Deconv(ch, dtype=self.dtype, name=f"deconv_{i}")(x)
            up_flow = _UpFlow(use_bias=self.upflow_bias, dtype=self.dtype,
                              name=f"upflow_{i}")(flow)
            x = jnp.concatenate([skip, up_feat, up_flow], axis=-1)
            if self.inter_channels:
                y = nn.Conv(self.inter_channels[i], (3, 3), padding=1,
                            dtype=self.dtype, name=f"interconv_{i}")(x)
                flow = _predict_flow(y, f"predict_flow_{i}", self.dtype)
            else:
                flow = _predict_flow(x, f"predict_flow_{i}", self.dtype)
            flows.append(flow)
        return flows[::-1]  # finest first: [flow2, flow3, flow4, flow5, flow6]


class FlowNetS(nn.Module):
    """Simple stacked flow net over the concatenated pair (6ch input)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True):
        c = lambda f, k, s, name: _Conv(f, k, s, dtype=self.dtype, name=name)
        x1 = c(64, 7, 2, "conv1")(x)
        x2 = c(128, 5, 2, "conv2")(x1)
        x3 = c(256, 5, 2, "conv3")(x2)
        x3 = c(256, 3, 1, "conv3_1")(x3)
        x4 = c(512, 3, 2, "conv4")(x3)
        x4 = c(512, 3, 1, "conv4_1")(x4)
        x5 = c(512, 3, 2, "conv5")(x4)
        x5 = c(512, 3, 1, "conv5_1")(x5)
        x6 = c(1024, 3, 2, "conv6")(x5)
        x6 = c(1024, 3, 1, "conv6_1")(x6)
        flows = _Refinement(upflow_bias=False, dtype=self.dtype,
                            name="refine")([x2, x3, x4, x5], x6)
        return flows  # finest (1/4 res) first


class FlowNetC(nn.Module):
    """Correlation flow net: per-image pyramids + cost volume."""

    max_displacement: int = 20
    corr_stride: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img1: jnp.ndarray, img2: jnp.ndarray,
                 train: bool = True):
        c = lambda f, k, s, name: _Conv(f, k, s, dtype=self.dtype, name=name)
        conv1 = _Conv(64, 7, 2, dtype=self.dtype, name="conv1")
        conv2 = _Conv(128, 5, 2, dtype=self.dtype, name="conv2")
        conv3 = _Conv(256, 5, 2, dtype=self.dtype, name="conv3")
        f1 = conv3(conv2(conv1(img1)))
        f2 = conv3(conv2(conv1(img2)))

        corr = _leaky(correlation(f1, f2,
                                  max_displacement=self.max_displacement,
                                  stride=self.corr_stride))
        redir = c(32, 1, 1, "conv_redir")(f1)
        x3 = c(256, 3, 1, "conv3_1")(jnp.concatenate([redir, corr], axis=-1))
        x4 = c(512, 3, 2, "conv4")(x3)
        x4 = c(512, 3, 1, "conv4_1")(x4)
        x5 = c(512, 3, 2, "conv5")(x4)
        x5 = c(512, 3, 1, "conv5_1")(x5)
        x6 = c(1024, 3, 2, "conv6")(x5)
        x6 = c(1024, 3, 1, "conv6_1")(x6)
        # skips: conv2 features of img1 at 1/4, then x3, x4, x5
        f1_2 = conv2(conv1(img1))
        # Unlike FlowNetS, FlowNetC's flow-upsampling deconvs ARE biased
        # (FlowNetC.py:53-56: ConvTranspose2d(..., bias=True)).
        flows = _Refinement(dtype=self.dtype, name="refine")(
            [f1_2, x3, x4, x5], x6)
        return flows


class FlowNetSD(nn.Module):
    """Small-displacement variant: all 3×3 convs."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True):
        c = lambda f, s, name: _Conv(f, 3, s, dtype=self.dtype, name=name)
        x0 = c(64, 1, "conv0")(x)
        x1 = c(64, 2, "conv1")(x0)
        x1 = c(128, 1, "conv1_1")(x1)
        x2 = c(128, 2, "conv2")(x1)
        x2 = c(128, 1, "conv2_1")(x2)
        x3 = c(256, 2, "conv3")(x2)
        x3 = c(256, 1, "conv3_1")(x3)
        x4 = c(512, 2, "conv4")(x3)
        x4 = c(512, 1, "conv4_1")(x4)
        x5 = c(512, 2, "conv5")(x4)
        x5 = c(512, 1, "conv5_1")(x5)
        x6 = c(1024, 2, "conv6")(x5)
        x6 = c(1024, 1, "conv6_1")(x6)
        flows = _Refinement(inter_channels=(512, 256, 128, 64),
                            dtype=self.dtype, name="refine")(
            [x2, x3, x4, x5], x6)
        return flows


class FlowNetFusion(nn.Module):
    """Shallow fusion network producing the final full-res flow."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True):
        c = lambda f, s, name: _Conv(f, 3, s, dtype=self.dtype, name=name)
        x0 = c(64, 1, "conv0")(x)
        x1 = c(64, 2, "conv1")(x0)
        x1 = c(128, 1, "conv1_1")(x1)
        x2 = c(128, 2, "conv2")(x1)
        x2 = c(128, 1, "conv2_1")(x2)

        # Expanding part, reference-exact (FlowNetFusion.py:48-64): the
        # inter_convs are i_conv = conv with NO activation, each deconv
        # reads the raw concat (not the interconv output), and the
        # per-scale flow is predicted from the interconv output.
        iconv = lambda f, name: nn.Conv(f, (3, 3), padding=1,
                                        dtype=self.dtype, name=name)
        flow2 = _predict_flow(x2, "predict_flow2", self.dtype)
        up1 = _Deconv(32, dtype=self.dtype, name="deconv1")(x2)
        upflow1 = _UpFlow(dtype=self.dtype, name="upflow1")(flow2)
        concat1 = jnp.concatenate([x1, up1, upflow1], axis=-1)
        inter1 = iconv(32, "interconv1")(concat1)
        flow1 = _predict_flow(inter1, "predict_flow1", self.dtype)
        up0 = _Deconv(16, dtype=self.dtype, name="deconv0")(concat1)
        upflow0 = _UpFlow(dtype=self.dtype, name="upflow0")(flow1)
        concat0 = jnp.concatenate([x0, up0, upflow0], axis=-1)
        inter0 = iconv(16, "interconv0")(concat0)
        flow0 = _predict_flow(inter0, "predict_flow0", self.dtype)
        return flow0


def _up4(flow):
    """Upsample a 1/4-res flow prediction to full res, scaling values."""
    b, h, w, c = flow.shape
    return jax.image.resize(flow, (b, 4 * h, 4 * w, c), "bilinear") * 4.0


def _up2x(x, factor):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, factor * h, factor * w, c), "bilinear")


class FlowNetCS(nn.Module):
    """C → S stack (models.py FlowNetCS)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img1, img2, train: bool = True):
        flows_c = FlowNetC(dtype=self.dtype, name="flownetc")(
            img1, img2, train=train)
        flow1 = _up4(flows_c[0])
        warped = resample2d(img2, flow1)
        diff = channelnorm(img1 - warped)
        x = jnp.concatenate([img1, img2, warped, flow1 * 0.05, diff], axis=-1)
        flows_s = FlowNetS(dtype=self.dtype, name="flownets1")(x, train=train)
        return flows_s


class FlowNetCSS(nn.Module):
    """C → S → S stack."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img1, img2, train: bool = True):
        flows_cs = FlowNetCS(dtype=self.dtype, name="flownetcs")(
            img1, img2, train=train)
        flow2 = _up4(flows_cs[0])
        warped = resample2d(img2, flow2)
        diff = channelnorm(img1 - warped)
        x = jnp.concatenate([img1, img2, warped, flow2 * 0.05, diff], axis=-1)
        flows_s2 = FlowNetS(dtype=self.dtype, name="flownets2")(x, train=train)
        return flows_s2


class FlowNet2(nn.Module):
    """Full FlowNet2: (C→S→S) large-displacement branch + SD branch +
    fusion (models.py:40-195)."""

    rgb_max: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img1: jnp.ndarray, img2: jnp.ndarray,
                 train: bool = True) -> jnp.ndarray:
        # Reference normalizes by rgb_max and mean-centers per pair.
        pair = jnp.stack([img1, img2], axis=1) / self.rgb_max
        mean = pair.mean(axis=(1, 2, 3), keepdims=True)
        img1n = (pair[:, 0] - mean[:, 0])
        img2n = (pair[:, 1] - mean[:, 0])

        flows_css = FlowNetCSS(dtype=self.dtype, name="css")(
            img1n, img2n, train=train)
        flow_css = _up4(flows_css[0])

        x_sd = jnp.concatenate([img1n, img2n], axis=-1)
        flows_sd = FlowNetSD(dtype=self.dtype, name="flownetsd")(
            x_sd, train=train)
        flow_sd = _up4(flows_sd[0])

        # Fusion inputs: images, both flows (×0.05), their magnitudes,
        # and brightness errors of both warps.
        warped_css = resample2d(img2n, flow_css)
        warped_sd = resample2d(img2n, flow_sd)
        err_css = channelnorm(img1n - warped_css)
        err_sd = channelnorm(img1n - warped_sd)
        mag_css = channelnorm(flow_css)
        mag_sd = channelnorm(flow_sd)
        fusion_in = jnp.concatenate(
            [img1n, flow_sd * 0.05, flow_css * 0.05, mag_sd, mag_css,
             err_sd, err_css], axis=-1)
        flow = FlowNetFusion(dtype=self.dtype, name="fusion")(
            fusion_in, train=train)
        return flow
