"""Training / evaluation driver.

Capability parity with the reference driver (/root/reference/train_test.py):
epoch × batch loop, per-step loss logging, periodic checkpointing
(``ckpt_save_freq``), per-epoch ETA banner, and the test protocol with
per-horizon MSE/PSNR/SSIM and final-metric report.

TPU-first: the loop body is a single jitted step; batches are generated on
device; evaluation metrics are computed on device and fetched once per
batch.
"""

from __future__ import annotations

import pathlib
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ode_rl_tpu.core.checkpoint import CheckpointManager
from ode_rl_tpu.core.config import resolve_run_id
from ode_rl_tpu.core.logging import MetricLogger
from ode_rl_tpu.data.mmnist import parse_datasets
from ode_rl_tpu.data.protocol import make_batch_dict
from ode_rl_tpu.models import build_model
from ode_rl_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from ode_rl_tpu.train.step import (
    create_train_state, make_eval_step, make_fused_train_step,
    make_train_step)


def _needs_flow_labels(cfg) -> bool:
    return cfg.model in ("S3VAE",)


def _make_flow_label_fn(cfg):
    """DFP label source: None → frame-diff proxy; 'flownet' → labels from
    FlowNetC predicted flow inside the jitted step (the reference's
    offline pipeline, scripts/get_labels_from_pred_flow.py:30-49)."""
    if cfg.get("flow_label_source", "diff") != "flownet":
        return None
    import jax.numpy as jnp_

    from ode_rl_tpu.data.flow_labels import make_flownet_label_fn
    from ode_rl_tpu.flow.flownets import FlowNetC

    net = FlowNetC()
    dummy = jnp_.zeros((1, 64, 64, 3))
    params = net.init(jax.random.key(0), dummy, dummy)
    path = str(cfg.get("flownet_params_path", "") or "")
    if path and pathlib.Path(path).exists():
        from flax import serialization
        params = serialization.from_bytes(
            params, pathlib.Path(path).read_bytes())
        print(f"flow labels: FlowNetC weights from {path}")
    elif cfg.get("allow_random_flownet", False):
        print("warning: flow_label_source=flownet with "
              "allow_random_flownet=True — DFP labels come from a "
              "randomly initialized FlowNetC (debug only)")
    else:
        # The reference's DFP labels come from a TRAINED flow net
        # (scripts/get_labels_from_pred_flow.py:30-49); silently
        # supervising against random-feature flow is a quality trap.
        raise FileNotFoundError(
            f"flow_label_source=flownet but no trained weights at "
            f"flownet_params_path={path!r}. Train them with "
            f"`python scripts/train_flownetc.py` (writes the default "
            f"path), or pass --allow_random_flownet True to opt into "
            f"random-init flow features.")
    return make_flownet_label_fn(net, params)


def setup(cfg, seed: Optional[int] = None):
    """Build model, loaders, initial state, and jitted steps."""
    if cfg.get("debug_nans", False):
        jax.config.update("jax_debug_nans", True)
    loaders = parse_datasets(cfg)
    model = build_model(cfg)
    rng = jax.random.key(seed if seed is not None else cfg.get("seed", 0))
    n_in = cfg.train_in_seq if cfg.phase == "train" else cfg.test_in_seq
    loader = (loaders["train_dataloader"] if cfg.phase == "train"
              else loaders["test_dataloader"])
    sample = make_batch_dict(next(loader), n_in=n_in,
                             with_flow_labels=_needs_flow_labels(cfg))
    state = create_train_state(model, cfg, sample, rng)
    return model, loaders, state, rng


def train_gan(cfg, logdir: Optional[pathlib.Path] = None) -> Dict:
    """Adversarial VidODE training (the Vid-ODE sub-repo's GAN loop,
    reference Vid-ODE/main.py:185-318): Adamax G+D, LSGAN, alternating
    updates compiled into one step; enabled with ``--gan True``."""
    from ode_rl_tpu.train.gan import (
        create_gan_state, make_gan_lr_schedule, make_gan_train_step)

    run_id = resolve_run_id(cfg)
    logdir = pathlib.Path(logdir or cfg.get("logdir", "logs")) / cfg.model / run_id
    logger = MetricLogger(logdir, quiet=cfg.get("quiet", False))
    ckpt = CheckpointManager(logdir / "checkpoints",
                             tag=cfg.get("ckpt_id", run_id))

    loaders = parse_datasets(cfg)
    model = build_model(cfg)
    rng = jax.random.key(cfg.get("seed", 0))
    loader = loaders["train_dataloader"]
    sample = make_batch_dict(next(loader), n_in=cfg.train_in_seq)
    n_batches = (int(cfg.get("steps_per_epoch", 0))
                 or loaders["n_train_batches"])
    schedule = make_gan_lr_schedule(cfg, n_batches)
    extrap = bool(cfg.get("extrapolate", True))
    state = create_gan_state(model, cfg, sample, rng,
                             steps_per_epoch=n_batches, extrap=extrap)
    step_fn = make_gan_train_step(
        model, extrap=extrap,
        lamb_adv=float(cfg.get("lamb_adv", 0.003)),
        lr_schedule=schedule)

    total = n_batches * cfg.epochs
    step = 0
    log_freq = int(cfg.get("loss_log_freq", 50))
    # Periodic in-training evaluation with image dumps (reference tests
    # every 100 epochs and saves pred/GT sheets, Vid-ODE/main.py:256-290).
    test_freq = int(cfg.get("gan_test_freq_epochs", 100))
    eval_step = make_eval_step(model)
    test_loader = loaders.get("test_dataloader")

    def periodic_eval(epoch: int) -> Dict:
        # Multi-batch metric sweep, not a single-batch peek (the
        # reference's periodic test dumps full metric sets,
        # Vid-ODE/main.py:289-290 → tester metric sweep).
        from ode_rl_tpu.train.visualize import save_filmstrip
        n_eval = int(cfg.get("gan_eval_batches", 4))
        acc = []
        pred = tbatch = None
        for i in range(n_eval):
            video = next(test_loader)
            tbatch = make_batch_dict(video, n_in=cfg.train_in_seq)
            m, pred = eval_step({"params": state.gen_params,
                                 **state.gen_model_state}, tbatch,
                                jax.random.key(epoch * 1000 + i))
            acc.append(jax.device_get({k: v for k, v in m.items()
                                       if not k.startswith("aux_")}))
        m = {k: np.mean(np.stack([a[k] for a in acc]), axis=0)
             for k in acc[0]}
        out = {f"test_{k}": float(np.asarray(v).mean()) for k, v in m.items()}
        # Per-horizon curves for the run dir (same artifact as test()).
        import json as _json
        (logdir / f"gan_eval_epoch{epoch:05d}.json").write_text(_json.dumps(
            {k: np.asarray(v).tolist() for k, v in m.items()}))
        gt = np.asarray(tbatch["data_to_predict"][0]) + 0.5
        save_filmstrip(logdir / f"test_epoch{epoch:05d}.png",
                       [gt, np.asarray(pred[0])],
                       labels=["ground truth", "prediction"])
        return out

    last: Dict = {}
    for epoch in range(cfg.epochs):
        for _ in range(n_batches):
            if step >= total:
                break
            batch = make_batch_dict(next(loader), n_in=cfg.train_in_seq)
            rng, sub = jax.random.split(rng)
            state, metrics = step_fn(state, batch, sub)
            step += 1
            if step % log_freq == 0 or step == 1:
                last = {k: float(np.asarray(v))
                        for k, v in jax.device_get(metrics).items()
                        if not k.startswith("_")}
                logger.log(step, last)
            if step % cfg.get("ckpt_save_freq", 5000) == 0:
                ckpt.save(step, {"gen_params": state.gen_params,
                                 "gen_model_state": state.gen_model_state,
                                 "disc_params": state.disc_params},
                          config=cfg.to_dict())
        if test_loader is not None and (epoch + 1) % test_freq == 0:
            test_metrics = periodic_eval(epoch + 1)
            last.update(test_metrics)
            logger.log(step, test_metrics)
    ckpt.save(max(step, 1), {"gen_params": state.gen_params,
                             "gen_model_state": state.gen_model_state,
                             "disc_params": state.disc_params},
              config=cfg.to_dict())
    logger.close()
    return {"final_step": step, **last}


def train(cfg, logdir: Optional[pathlib.Path] = None) -> Dict:
    if cfg.get("gan", False):
        return train_gan(cfg, logdir)
    if cfg.model == "CATERClassifier":
        from ode_rl_tpu.wm.cater import train_cater_classifier
        return train_cater_classifier(cfg, logdir)
    run_id = resolve_run_id(cfg)
    logdir = pathlib.Path(logdir or cfg.get("logdir", "logs")) / cfg.model / run_id
    logger = MetricLogger(logdir, use_wandb=not cfg.get("off_wandb", True),
                          quiet=cfg.get("quiet", False))
    ckpt = CheckpointManager(logdir / "checkpoints",
                             tag=cfg.get("ckpt_id", run_id))

    model, loaders, state, rng = setup(cfg)
    mesh = make_mesh() if cfg.get("use_mesh", False) else None
    if mesh is not None:
        state = replicate(state, mesh)

    fused = (cfg.get("fused_datagen", True) and cfg.dataset == "mmnist"
             and not loaders.get("frozen", False)
             and not cfg.get("vidode_sampling", False))
    loader = loaders["train_dataloader"]
    if cfg.get("vidode_sampling", False) and cfg.dataset == "mmnist":
        # need window_size-frame clips for the window samplers
        from ode_rl_tpu.data.mmnist import MovingMNIST
        win = int(cfg.get("window_size", cfg.train_seq))
        loader = iter(MovingMNIST(
            batch_size=cfg.batch_size, n_frames_input=win,
            n_frames_output=0, num_digits=cfg.num_digits,
            data_dir=cfg.get("data_dir"), seed=cfg.get("seed", 0)))
    flow_label_fn = (_make_flow_label_fn(cfg) if _needs_flow_labels(cfg)
                     else None)
    if fused:
        # One dispatch per step: generator + step in a single XLA program.
        from ode_rl_tpu.data.sprites import get_sprite_bank
        bank = get_sprite_bank(cfg.get("data_dir"))
        if int(cfg.get("num_sprites", 0) or 0):
            bank = bank[:int(cfg.num_sprites)]
        bank = jnp.asarray(bank)
        fused_step = make_fused_train_step(model, cfg, bank, mesh=mesh,
                                           flow_label_fn=flow_label_fn)
        loop_key = jax.random.fold_in(rng, 0xDA7A)
    else:
        train_step = make_train_step(
            model, nan_guard=cfg.get("nan_guard", False))
    n_train_batches = (int(cfg.get("steps_per_epoch", 0))
                       or loaders["n_train_batches"])
    total_steps = n_train_batches * cfg.epochs
    logger.print_exp_details(cfg, n_train_batches)

    # Auto-resume if a checkpoint exists.
    start_step = 0
    if ckpt.latest_step() is not None and cfg.get("auto_resume", True):
        try:
            restored = ckpt.restore({"params": state.params,
                                     "model_state": state.model_state,
                                     "opt_state": state.opt_state})
        except ValueError as e:
            # Structurally incompatible snapshot (different architecture /
            # older format): refuse the bogus resume, start fresh.
            print(f"auto-resume skipped: {e}")
        else:
            start_step = restored["step"]
            state = state.replace(
                step=jnp.asarray(start_step, jnp.int32),
                params=restored["state"]["params"],
                model_state=restored["state"]["model_state"],
                opt_state=restored["state"]["opt_state"])
            print(f"resumed from step {start_step}")

    # ReduceLROnPlateau + early stopping (ConvLSTM sub-repo capability,
    # reference ConvLSTM-PyTorch/earlystopping.py:6-51 + the main.py
    # scheduler imports): both monitor a fixed held-out batch's eval-mode
    # MSE once per epoch. Opt-in via `lr_scheduler: plateau` and/or
    # `early_stop_patience > 0`.
    plateau = early = val_monitor = None
    if cfg.get("lr_scheduler", "") == "plateau":
        from ode_rl_tpu.train.schedulers import ReduceLROnPlateau
        plateau = ReduceLROnPlateau(
            factor=float(cfg.get("plateau_factor", 0.5)),
            patience=int(cfg.get("plateau_patience", 4)),
            min_scale=float(cfg.get("plateau_min_scale", 1e-3)))
    if int(cfg.get("early_stop_patience", 0)) > 0:
        from ode_rl_tpu.train.schedulers import EarlyStopping
        early = EarlyStopping(patience=int(cfg.early_stop_patience))
    if plateau is not None or early is not None:
        eval_step = make_eval_step(model)
        val_batches = [
            make_batch_dict(next(loaders["test_dataloader"]),
                            n_in=cfg.train_in_seq,
                            with_flow_labels=_needs_flow_labels(cfg),
                            flow_label_fn=flow_label_fn)
            for _ in range(int(cfg.get("val_batches", 2)))]

        def val_monitor() -> float:
            mses = [np.mean(np.asarray(jax.device_get(
                eval_step(state.variables, vb, jax.random.key(0))[0]["mse"])))
                for vb in val_batches]
            return float(np.mean(mses))

    step = start_step
    last_metrics: Dict = {}
    log_freq = int(cfg.get("loss_log_freq", 50))
    for epoch in range(cfg.epochs):
        epoch_losses = []
        for _ in range(n_train_batches):
            if step >= total_steps:
                break
            if fused:
                state, metrics, loop_key = fused_step(state, loop_key)
            else:
                video = next(loader)
                if cfg.get("vidode_sampling", False):
                    # Vid-ODE window sampling: regular/irregular ×
                    # interp/extrap with observation masks
                    # (data/samplers.py; reference dataloader.py:31-158).
                    from ode_rl_tpu.data.samplers import sample, split_batch
                    rng, sk = jax.random.split(rng)
                    frames, mask = sample(
                        sk, video,
                        sample_size=cfg.train_in_seq + cfg.train_out_seq,
                        window_size=int(cfg.get("window_size",
                                                cfg.train_seq)),
                        irregular=cfg.get("irregular", False),
                        extrap=cfg.get("extrapolate", True),
                        train=True)
                    batch = split_batch(frames, mask,
                                        extrap=cfg.get("extrapolate", True))
                else:
                    batch = make_batch_dict(
                        video, n_in=cfg.train_in_seq,
                        with_flow_labels=_needs_flow_labels(cfg),
                        flow_label_fn=flow_label_fn)
                if mesh is not None:
                    batch = shard_batch(batch, mesh)
                rng, sub = jax.random.split(rng)
                state, metrics = train_step(state, batch, sub)
            step += 1
            # Fetch metrics only at log points — a per-step device_get
            # would serialize the async dispatch pipeline.
            if step % log_freq == 0 or step == 1:
                metrics = jax.device_get(metrics)
                last_metrics = {k: float(np.asarray(v)) for k, v in metrics.items()}
                logger.log(step, last_metrics)
                epoch_losses.append(last_metrics["loss"])
            if step % cfg.get("ckpt_save_freq", 5000) == 0:
                ckpt.save(step, {"params": state.params,
                                 "model_state": state.model_state,
                                 "opt_state": state.opt_state},
                          config=cfg.to_dict())
        # Epochs with no logged step (log_freq > steps/epoch, or the
        # step cap already reached) fall back to the last fetched loss.
        epoch_loss = (float(np.mean(epoch_losses)) if epoch_losses
                      else last_metrics.get("loss", float("nan")))
        logger.log_epoch(epoch, epoch_loss, step, total_steps)
        if val_monitor is not None:
            val_mse = val_monitor()
            logger.log(step, {"val_mse": val_mse})
            if plateau is not None:
                prev = plateau.scale
                scale = plateau.step(val_mse)
                if scale != prev:
                    from ode_rl_tpu.train.schedulers import set_lr_scale
                    state = set_lr_scale(state, scale)
                    print(f"plateau: val_mse {val_mse:.6f} stalled — "
                          f"lr scale {prev:g} → {scale:g}")
            if early is not None and early.step(val_mse):
                print(f"early stop at epoch {epoch}: val_mse "
                      f"{val_mse:.6f} has not improved past "
                      f"{early.best:.6f} for {early.patience} epochs")
                break
        if step >= total_steps:
            break
    ckpt.save(max(step, 1), {"params": state.params,
                             "model_state": state.model_state,
                             "opt_state": state.opt_state},
              config=cfg.to_dict())
    logger.close()
    return {"final_step": step, **last_metrics}


# Keys the *test* block keeps when resurrecting a saved train config:
# everything that defines the evaluation protocol rather than the model.
_TEST_PROTOCOL_KEYS = frozenset({
    "id", "phase", "load_model", "ckpt_id", "ckpt_step", "logdir", "rundir",
    "dataset", "data_dir", "test_seq", "test_in_seq", "test_out_seq",
    "eval_batches", "batch_size", "quiet", "seed", "off_wandb",
    "fused_datagen", "use_mesh",
})


def _resurrect_train_config(cfg, saved: Dict):
    """Rebuild the exact train-time config for model construction, keeping
    the current block's evaluation-protocol keys (the Vid-ODE options.json
    pattern, reference Vid-ODE/tester.py:17-30: load saved options, then
    overwrite the phase/test flags)."""
    merged = dict(saved)
    for k, v in cfg.to_dict().items():
        if k in _TEST_PROTOCOL_KEYS or k not in merged:
            merged[k] = v
    from ode_rl_tpu.core.config import Config
    return Config(merged)


def _make_lpips_horizon_fn(cfg):
    """Per-horizon LPIPS for the test metric sweep (the reference computes
    LPIPS alongside MSE/PSNR/SSIM, Vid-ODE/evaluate.py:22-68). Returns a
    jitted (pred, gt) → (T,) function with a ``.metric_key`` attribute, or
    None when disabled.

    ``eval_lpips: auto`` enables it for the VidODE family; grayscale
    frames are tiled to 3 channels. Without pretrained weights
    (``lpips_alexnet_npz``) the score is uncalibrated — the metric is then
    EMITTED UNDER THE KEY ``lpips_uncalibrated`` (never plain ``lpips``),
    so every downstream artifact (per_horizon.json, final_* metrics, logs)
    carries the calibration status structurally, not by convention
    (eval_models/lpips.py docstring; VERDICT r4 #10)."""
    mode = cfg.get("eval_lpips", "auto")
    if isinstance(mode, str) and mode.lower() == "auto":
        enabled = cfg.model in ("VidODE",)
    else:
        enabled = bool(mode)
    if not enabled:
        return None
    from ode_rl_tpu.eval_models.lpips import (
        init_lpips, load_torch_weights, lpips_distance)
    variables = init_lpips()
    calibrated = False
    alex = str(cfg.get("lpips_alexnet_npz", "") or "")
    lins = str(cfg.get("lpips_lins_npz", "") or "")
    if alex:
        if not pathlib.Path(alex).exists():
            raise FileNotFoundError(
                f"lpips_alexnet_npz={alex!r} does not exist — refusing "
                f"to silently fall back to uncalibrated random features "
                f"(leave the flag empty to opt into uncalibrated LPIPS)")
        variables = load_torch_weights(variables, alex, lins or None)
        calibrated = True
        print(f"LPIPS: calibrated weights from {alex}")

    def per_horizon(pred, gt):
        # (B, T, H, W, C) → (T,) mean LPIPS per prediction horizon.
        to_rgb = lambda x: (jnp.tile(x, (1, 1, 1, 3))
                            if x.shape[-1] == 1 else x[..., :3])
        p = jnp.clip(jnp.moveaxis(pred.astype(jnp.float32), 1, 0), 0.0, 1.0)
        g = jnp.clip(jnp.moveaxis(gt.astype(jnp.float32), 1, 0), 0.0, 1.0)
        scores = jax.vmap(
            lambda a, b: lpips_distance(variables, to_rgb(a), to_rgb(b),
                                        calibrated=calibrated))(p, g)
        return jnp.mean(scores, axis=1)  # (T, B) → (T,)

    # Trigger the one-time uncalibrated warning outside jit.
    if not calibrated:
        lpips_distance(variables, jnp.zeros((1, 8, 8, 3)),
                       jnp.zeros((1, 8, 8, 3)), calibrated=False)
    jitted = jax.jit(per_horizon)

    def fn(pred, gt):
        return jitted(pred, gt)

    fn.metric_key = "lpips" if calibrated else "lpips_uncalibrated"
    return fn


def test(cfg, logdir: Optional[pathlib.Path] = None) -> Dict:
    if cfg.model == "CATERClassifier":
        # Eval-only entry (reference dreamerv2/evaluation.py): restore
        # the trained snapshot and sweep the val split.
        from ode_rl_tpu.wm.cater import eval_cater_classifier
        return eval_cater_classifier(cfg, logdir)
    # Resolve the trained checkpoint FIRST (by explicit ckpt_id, mirroring
    # reference helpers/utils.py:229-252 — never by string surgery on the
    # test id) so the saved train config can drive model construction.
    ckpt = None
    if cfg.get("load_model", False):
        from ode_rl_tpu.core.checkpoint import find_checkpoint
        ckpt_id = cfg.get("ckpt_id")
        if not ckpt_id:
            raise ValueError(
                "phase=test with load_model=True requires an explicit "
                "ckpt_id (the tag the train run checkpointed under)")
        ckpt_dir = find_checkpoint(cfg.get("logdir", "logs"), cfg.model,
                                   ckpt_id)
        ckpt = CheckpointManager(ckpt_dir, tag=ckpt_id)
        saved_cfg = ckpt.load_config()
        if saved_cfg is not None:
            cfg = _resurrect_train_config(cfg, saved_cfg)

    run_id = resolve_run_id(cfg)
    logdir = pathlib.Path(logdir or cfg.get("logdir", "logs")) / cfg.model / run_id
    logger = MetricLogger(logdir, quiet=cfg.get("quiet", False))

    model, loaders, state, rng = setup(cfg)
    if ckpt is not None:
        step = cfg.get("ckpt_step") or None
        if cfg.get("gan", False):
            # Adversarial runs snapshot {gen_params, gen_model_state,
            # disc_params} (train_gan); evaluation needs the generator
            # params AND its mutable state (BatchNorm running stats —
            # eval with init stats mis-normalizes every activation).
            restored = ckpt.restore(
                {"gen_params": state.params,
                 "gen_model_state": state.model_state},
                step=int(step) if step else None,
                allow_missing=("gen_model_state",))
            state = state.replace(
                params=restored["state"]["gen_params"],
                model_state=restored["state"]["gen_model_state"])
        else:
            restored = ckpt.restore({"params": state.params,
                                     "model_state": state.model_state,
                                     "opt_state": state.opt_state},
                                    step=int(step) if step else None)
            state = state.replace(params=restored["state"]["params"],
                                  model_state=restored["state"]["model_state"])
        print(f"loaded checkpoint {ckpt.tag} step {restored['step']} "
              f"from {ckpt.directory}")

    eval_step = make_eval_step(model)
    loader = loaders["test_dataloader"]
    batches = int(cfg.get("eval_batches", 0)) or loaders["n_test_batches"]
    lpips_fn = _make_lpips_horizon_fn(cfg)

    all_metrics = []
    last_pred = last_batch = None
    for it in range(batches):
        video = next(loader)
        batch = make_batch_dict(video, n_in=cfg.test_in_seq,
                                with_flow_labels=_needs_flow_labels(cfg))
        rng, sub = jax.random.split(rng)
        metrics, pred = eval_step(state.variables, batch, sub)
        last_pred, last_batch = pred, batch
        host = jax.device_get(
            {k: v for k, v in metrics.items() if not k.startswith("aux_")})
        if lpips_fn is not None:
            gt = batch["data_to_predict"] + 0.5
            if pred.shape[:2] == gt.shape[:2]:  # skip full-seq recon models
                host[lpips_fn.metric_key] = jax.device_get(lpips_fn(pred, gt))
        all_metrics.append(host)

    # Mean over batches → per-horizon curves; report the final horizon
    # (the reference's "final test metrics", train_test.py:142-143).
    stacked = {k: np.mean(np.stack([m[k] for m in all_metrics]), axis=0)
               for k in all_metrics[0]}
    final = {f"final_{k}": float(v[-1]) for k, v in stacked.items()}
    per_horizon = {k: v.tolist() for k, v in stacked.items()}
    logger.log(0, final)
    (logdir / "per_horizon.json").parent.mkdir(parents=True, exist_ok=True)
    import json
    (logdir / "per_horizon.json").write_text(json.dumps(per_horizon))

    # Visual diagnostics: metric-vs-horizon plot + pred/GT filmstrip
    # (the reference's visual-oracle layer, SURVEY §4/§5.5).
    from ode_rl_tpu.train.visualize import (
        plot_metrics_vs_horizon, save_filmstrip)
    plot_metrics_vs_horizon(logdir / "metrics_vs_horizon.png", per_horizon,
                            n_in=cfg.test_in_seq)
    gt = np.asarray(last_batch["data_to_predict"][0]) + 0.5
    pr = np.asarray(last_pred[0])
    if pr.shape[0] != gt.shape[0]:      # S3VAE-family full-seq recon
        full = np.concatenate(
            [np.asarray(last_batch["observed_data"][0]) + 0.5, gt], axis=0)
        gt = full
    save_filmstrip(logdir / "pred_gt.png", [gt, pr],
                   labels=["ground truth", "prediction"])
    logger.close()
    return {**final, "per_horizon": per_horizon}
