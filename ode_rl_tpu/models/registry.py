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
    # cgrudecODE (reference main.py:57-58 builds ConvGRU(decODE=opt.decODE))
    # swaps the free-run GRU decoder for a Neural-ODE decode.
    dec_ode = cfg.model == "cgrudecODE" or cfg.get("decODE", False)
    return ConvGRUModel(
        in_channels=cfg.in_channels,
        conv_encoder_out_ch=cfg.conv_encoder_out_ch,
        convgru_out_ch=cfg.convgru_out_ch,
        decODE=dec_ode,
        latent_dim=int(cfg.get("latent_dim", 64)),
        n_ode_layers=int(cfg.get("n_ode_layers", 2)),
        neural_ode_n_units=int(cfg.get("neural_ode_n_units", 64)),
        method=cfg.get("decode_diff_method", "dopri5"),
        rtol=float(cfg.get("odeint_rtol", 1e-4)),
        atol=float(cfg.get("odeint_atol", 1e-5)),
        ode_max_steps=int(cfg.get("ode_max_steps", 128)),
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
        ode_remat=cfg.get("ode_remat", True),
        ode_solver=cfg.get("ode_solver", "scan"),
        mem=cfg.get("mem", False),
        mem_mode=str(cfg.get("mem_mode", "nru")),
        z_sample=cfg.get("z_sample", False),
        z_kl_weight=float(cfg.get("z_kl_weight", 0.0)),
        dtype=_compute_dtype(cfg),
    )


def _build_vidode(cfg):
    from ode_rl_tpu.models.vidode import VidODEModel
    return VidODEModel(
        in_channels=cfg.in_channels,
        n_downs=cfg.n_downs,
        n_layers=cfg.get("n_layers", 3),
        method=cfg.decode_diff_method,
        rtol=float(cfg.get("odeint_rtol", 1e-3)),
        atol=float(cfg.get("odeint_atol", 1e-4)),
        ode_max_steps=int(cfg.get("ode_max_steps", 128)),
        # Slot-attention variant (reference --slot_attention --pos
        # --num_slots --dim --slot_iters, Vid-ODE/main.py:41-45).
        slot_attention=bool(cfg.get("slot_attention", False)),
        num_slots=int(cfg.get("num_slots", 4)),
        slot_dim=int(cfg.get("slot_dim", 32)),
        pos=int(cfg.get("pos", 2)),
        slot_iters=int(cfg.get("slot_iters", 3)),
        mem=bool(cfg.get("mem", False)),
        mem_mode=str(cfg.get("mem_mode", "nru")),
        dtype=_compute_dtype(cfg),
    )


def _build_s3vae(cfg):
    from ode_rl_tpu.models.s3vae import S3VAEModel
    n_hid = cfg.get("n_hid", [300])
    n_hid0 = n_hid[0] if isinstance(n_hid, (list, tuple)) else n_hid
    return S3VAEModel(
        in_channels=cfg.in_channels,
        d_zf=cfg.d_zf,
        d_zt=cfg.d_zt,
        encoder=cfg.get("encoder", "default"),
        n_hid=int(n_hid0) if cfg.get("rim", False) else 512,
        encoder_out_dims=cfg.get("encoder_out_dims", 128),
        k_stat=cfg.get("k_stat", -1),
        l0=float(cfg.get("l0", 10.0)), l1=float(cfg.get("l1", 1000.0)),
        l2=float(cfg.get("l2", 100.0)), l3=float(cfg.get("l3", 1.0)),
        margin=float(cfg.get("m", 1.0)),
        slot_att=cfg.get("slot_att", False),
        num_slots=cfg.get("num_slots", 3),
        slot_size=cfg.get("slot_size", 128),
        num_iterations=cfg.get("num_iterations", 3),
        rim=cfg.get("rim", False),
        unit_per_rim=cfg.get("unit_per_rim", 100),
        rim_num_blocks=int(_first(cfg.get("num_blocks", [4]))),
        rim_topk=int(_first(cfg.get("topk", [3]))),
        flow_grid=cfg.get("flow_grid", 3),
        extrapolate=cfg.get("extrapolate", False),
        data_points=int(cfg.get("data_points", 10000)),
        train_test_split=float(cfg.get("train_test_split", 0.8)),
        dtype=_compute_dtype(cfg),
    )


def _build_s2vae(cfg):
    from ode_rl_tpu.models.s2vae import S2VAEModel
    return S2VAEModel(
        in_channels=cfg.in_channels,
        d_zf=cfg.get("d_zf", 128),
        num_slots=cfg.get("num_slots", 3),
        slot_size=cfg.get("slot_size", 128),
        num_iterations=cfg.get("num_iterations", 3),
        gru_layers=cfg.get("gru_layers", 2),
        transition="cgru" if cfg.model == "CS2VAE"
        else cfg.get("transition", "gru"),
        conv_mode=cfg.model == "CS2VAE",
        prior=cfg.get("prior", "standard"),
        unmasked=cfg.get("unmasked", True),
        dtype=_compute_dtype(cfg),
    )


def _first(v):
    return v[0] if isinstance(v, (list, tuple)) else v


def _build_ds2vae(cfg):
    from ode_rl_tpu.models.ds2vae import DS2VAEModel
    return DS2VAEModel(
        in_channels=cfg.in_channels,
        d_zf=cfg.get("d_zf", 128),
        n_hid=int(_first(cfg.get("n_hid", [300]))),
        num_slots=cfg.get("num_slots", 3),
        slot_size=cfg.get("slot_size", 128),
        num_iterations=cfg.get("num_iterations", 3),
        num_blocks=int(_first(cfg.get("num_blocks", [3]))),
        topk=int(_first(cfg.get("topk", [3]))),
        dtype=_compute_dtype(cfg),
    )


def _build_dsvae(cfg):
    from ode_rl_tpu.sprite.dsvae import DisentangledVAE
    return DisentangledVAE(
        f_dim=cfg.get("f_dim", 256),
        z_dim=cfg.get("z_dim", 32),
        g_dim=cfg.get("g_dim", 128),
        channels=cfg.in_channels,
        hidden_dim=cfg.get("rnn_size", 256),
        dtype=_compute_dtype(cfg),
    )


def _build_dreamer(cfg):
    from ode_rl_tpu.wm.world_model import DreamerVideoModel
    return DreamerVideoModel(
        image_shape=(cfg.resolution, cfg.resolution, cfg.in_channels),
        cnn_depth=cfg.get("cnn_depth", 32),
        stoch=cfg.get("dyn_stoch", 30),
        deter=cfg.get("dyn_deter", 200),
        hidden=cfg.get("dyn_hidden", 200),
        discrete=cfg.get("dyn_discrete", 0),
        mean_act=cfg.get("dyn_mean_act", "none"),
        std_act=cfg.get("dyn_std_act", "sigmoid2"),
        min_std=float(cfg.get("dyn_min_std", 0.1)),
        cell_norm=cfg.get("dyn_cell", "gru_layer_norm") == "gru_layer_norm",
        kl_balance=float(cfg.get("kl_balance", 0.8)),
        kl_free=float(cfg.get("kl_free", 1.0)),
        kl_scale=float(cfg.get("kl_scale", 1.0)),
        dtype=_compute_dtype(cfg),
    )


def _build_convlstm(cfg):
    from ode_rl_tpu.models.convlstm import ConvLSTMED
    return ConvLSTMED(in_channels=cfg.in_channels, dtype=_compute_dtype(cfg))


def _build_spatial_dreamer(cfg):
    from ode_rl_tpu.wm.spatial_rssm import SpatialWorldModel
    return SpatialWorldModel(
        image_shape=(cfg.resolution, cfg.resolution, cfg.in_channels),
        stoch_ch=int(cfg.get("dyn_stoch_ch", 16)),
        deter_ch=int(cfg.get("dyn_deter_ch", 64)),
        hidden_ch=int(cfg.get("dyn_hidden_ch", 64)),
        embed_ch=int(cfg.get("embed_ch", 64)),
        kl_scale=float(cfg.get("kl_scale", 1.0)),
        kl_free=float(cfg.get("kl_free", 1.0)),
        stochastic_gates=bool(cfg.get("stochastic_gates", True)),
        sparsity_scale=float(cfg.get("sparsity_scale",
                                     cfg.get("dyn_gate_scale", 0.1))),
        gate_prior=float(cfg.get("dyn_gate_prior", 0.3)),
        gate_free=float(cfg.get("dyn_gate_free", 0.0)),
        dtype=_compute_dtype(cfg),
    )


def _build_cater_classifier(cfg):
    # World-model feature extractor + multilabel readout; trained through
    # its dedicated path (wm/cater.py::train_cater_classifier) because its
    # batch protocol (episode chunks + per-episode targets) differs from
    # the uniform video-prediction loop.
    from ode_rl_tpu.wm.cater import CaterClassifierModel
    return CaterClassifierModel(cfg)


MODEL_REGISTRY: Dict[str, Callable] = {
    "CATERClassifier": _build_cater_classifier,
    "ConvGRU": _build_convgru,
    "ConvLSTM": _build_convlstm,
    "Dreamer": _build_dreamer,
    "SpatialDreamer": _build_spatial_dreamer,
    "DSVAE": _build_dsvae,
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
