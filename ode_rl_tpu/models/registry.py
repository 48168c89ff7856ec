"""Model registry: config → flax module.

Mirrors the reference's ``init_model`` dispatch
(/root/reference/main.py:53-78): model names ConvGRU / cgrudecODE /
ODEConv / S3VAE / S2VAE / CS2VAE / DS2VAE / VidODE.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax.numpy as jnp

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


def _compute_dtype(cfg):
    return _DTYPES[cfg.get("compute_dtype", "float32")]


def _build_convgru(cfg):
    from ode_rl_tpu.models.convgru import ConvGRUModel
    return ConvGRUModel(
        in_channels=cfg.in_channels,
        conv_encoder_out_ch=cfg.conv_encoder_out_ch,
        convgru_out_ch=cfg.convgru_out_ch,
        dtype=_compute_dtype(cfg),
    )


def _build_odeconvgru(cfg):
    from ode_rl_tpu.models.odeconvgru import ODEConvGRUModel
    return ODEConvGRUModel(
        in_channels=cfg.in_channels,
        n_downs=cfg.n_downs,
        conv_encoder_out_ch=cfg.conv_encoder_out_ch,
        neural_ode_decoder_out_ch=cfg.neural_ode_decoder_out_ch,
        neural_ode_n_units=cfg.neural_ode_n_units,
        n_ode_layers=cfg.n_ode_layers,
        method=cfg.decode_diff_method,
        rtol=float(cfg.get("odeint_rtol", 1e-4)),
        atol=float(cfg.get("odeint_atol", 1e-5)),
        ode_max_steps=int(cfg.get("ode_max_steps", 128)),
        mem=cfg.get("mem", False),
        dtype=_compute_dtype(cfg),
    )


def _build_vidode(cfg):
    from ode_rl_tpu.models.vidode import VidODEModel
    return VidODEModel(
        in_channels=cfg.in_channels,
        n_downs=cfg.n_downs,
        conv_encoder_out_ch=cfg.conv_encoder_out_ch,
        neural_ode_n_units=cfg.neural_ode_n_units,
        n_ode_layers=cfg.get("n_ode_layers", 2),
        method=cfg.decode_diff_method,
        rtol=float(cfg.get("odeint_rtol", 1e-3)),
        atol=float(cfg.get("odeint_atol", 1e-4)),
        ode_max_steps=int(cfg.get("ode_max_steps", 128)),
        dtype=_compute_dtype(cfg),
    )


def _build_s3vae(cfg):
    from ode_rl_tpu.models.s3vae import S3VAEModel
    return S3VAEModel(
        in_channels=cfg.in_channels,
        d_zf=cfg.d_zf,
        d_zt=cfg.d_zt,
        encoder=cfg.get("encoder", "default"),
        k_stat=cfg.get("k_stat", -1),
        l0=cfg.get("l0", 10.0), l1=cfg.get("l1", 1000.0),
        l2=cfg.get("l2", 100.0), l3=cfg.get("l3", 1.0),
        margin=cfg.get("m", 1.0),
        num_slots=cfg.get("num_slots", 3),
        slot_att=cfg.get("slot_att", False),
        flow_grid=cfg.get("flow_grid", 3),
        dtype=_compute_dtype(cfg),
    )


def _build_s2vae(cfg):
    from ode_rl_tpu.models.s2vae import S2VAEModel
    return S2VAEModel(
        in_channels=cfg.in_channels,
        num_slots=cfg.get("num_slots", 3),
        slot_size=cfg.get("slot_size", 128),
        num_iterations=cfg.get("num_iterations", 3),
        transition=cfg.get("transition", "gru"),
        conv_mode=cfg.model == "CS2VAE",
        dtype=_compute_dtype(cfg),
    )


def _build_ds2vae(cfg):
    from ode_rl_tpu.models.ds2vae import DS2VAEModel
    return DS2VAEModel(
        in_channels=cfg.in_channels,
        num_slots=cfg.get("num_slots", 3),
        slot_size=cfg.get("slot_size", 128),
        num_iterations=cfg.get("num_iterations", 3),
        num_blocks=cfg.get("num_blocks", [3])[0]
        if isinstance(cfg.get("num_blocks", 3), (list, tuple))
        else cfg.get("num_blocks", 3),
        topk=cfg.get("topk", [3])[0]
        if isinstance(cfg.get("topk", 3), (list, tuple))
        else cfg.get("topk", 3),
        dtype=_compute_dtype(cfg),
    )


MODEL_REGISTRY: Dict[str, Callable] = {
    "ConvGRU": _build_convgru,
    "cgrudecODE": _build_convgru,
    "ODEConv": _build_odeconvgru,
    "VidODE": _build_vidode,
    "S3VAE": _build_s3vae,
    "S2VAE": _build_s2vae,
    "CS2VAE": _build_s2vae,
    "DS2VAE": _build_ds2vae,
}


def build_model(cfg):
    name = cfg.model
    if name not in MODEL_REGISTRY:
        raise NotImplementedError(
            f"Model {name!r} is not implemented. Try one of "
            f"{sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[name](cfg)
