"""CATER-layout episode dataset + classifier training path.

Capability parity with the reference's CATER pipeline:

- ``load_cater_labels`` parses the reference's label-list format —
  one line per episode, ``<video-file> <id>,<id>,...`` — into multi-hot
  targets (/root/reference/dreamerv2/tools.py:329-333 ``load_labels`` +
  ``convert_multilabel``).
- ``CaterEpisodes`` walks the reference's directory contract
  (``<root>/videos/`` + ``<root>/lists/<task>/{train,val}.txt``,
  /root/reference/dreamerv2/datasets.py:33-46) and yields batches of
  episode chunks (the driver's ``break_batch`` fold,
  dreamer.py:62-72) with per-episode multilabel targets. Videos are
  ``.npy`` clips here — the in-image equivalent of the reference's
  cv2-decoded ``.avi`` files (no cv2/ffmpeg in this environment).
- ``write_synthetic_cater`` materializes a corpus in that layout from
  the procedural sprites generator: each episode composites two sprite
  clips; ground truth = the actions and colors present (10 classes) —
  the same "which events occur in this video" multilabel protocol as
  CATER task 1 (actions_present).
- ``train_cater_classifier`` trains ``FeatureClassifier`` on RSSM
  posterior features (reference ConvGRUClassifier,
  dreamerv2/models.py:105-197): per-chunk feature sequences → last-step
  feature per chunk → recurrent readout over chunks → multilabel BCE,
  with mAP / top-5 metrics, evaluated on the val split against a
  random-logits baseline.
"""

from __future__ import annotations

import json
import pathlib
from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# Label lists (the reference's exact on-disk contract)
# --------------------------------------------------------------------------

def convert_multilabel(ids, n_classes: int) -> np.ndarray:
    """[3, 7] → multi-hot (n_classes,) (reference tools.convert_multilabel)."""
    y = np.zeros((n_classes,), np.float32)
    for i in ids:
        y[int(i)] = 1.0
    return y


def load_cater_labels(fpath, n_classes: int) -> Dict[str, np.ndarray]:
    """Parse ``<video> <id>,<id>,...`` lines → {video: multi-hot}."""
    out = {}
    for line in pathlib.Path(fpath).read_text().splitlines():
        line = line.strip()
        if not line:
            continue
        name, ids = line.split(" ", 1)
        out[name] = convert_multilabel(ids.split(","), n_classes)
    return out


# --------------------------------------------------------------------------
# Synthetic corpus in the CATER layout
# --------------------------------------------------------------------------

N_CATER_CLASSES = 10  # 4 actions + 6 colors (sprite generator vocabulary)


def write_synthetic_cater(root, n_train: int = 120, n_val: int = 40,
                          n_frames: int = 40, seed: int = 0) -> pathlib.Path:
    """Materialize ``videos/*.npy`` + ``lists/actions_present/{train,val}.txt``.

    Each episode composites two procedural sprite clips (max-composite,
    like multi-digit MovingMNIST); the label set is the actions and
    colors present: class ids 0-3 = action, 4-9 = color."""
    from ode_rl_tpu.sprite.data import sprites_batch

    root = pathlib.Path(root)
    vid_dir = root / "videos"
    list_dir = root / "lists" / "actions_present"
    vid_dir.mkdir(parents=True, exist_ok=True)
    list_dir.mkdir(parents=True, exist_ok=True)

    key = jax.random.key(seed)
    lines = {"train": [], "val": []}
    total = n_train + n_val
    done = 0
    while done < total:
        b = min(8, total - done)
        key, k1, k2 = jax.random.split(key, 3)
        v1, a1, c1 = sprites_batch(k1, batch=b, n_frames=n_frames)
        v2, a2, c2 = sprites_batch(k2, batch=b, n_frames=n_frames)
        video = jnp.maximum(v1, v2)                     # [-0.5, 0.5]
        u8 = np.asarray((video + 0.5) * 255).clip(0, 255).astype(np.uint8)
        a1, a2, c1, c2 = map(np.asarray, (a1, a2, c1, c2))
        for i in range(b):
            idx = done + i
            name = f"cater_{idx:05d}.npy"
            np.save(vid_dir / name, u8[i])
            ids = sorted({int(a1[i]), int(a2[i]),
                          4 + int(c1[i]), 4 + int(c2[i])})
            split = "train" if idx < n_train else "val"
            lines[split].append(f"{name} {','.join(map(str, ids))}")
        done += b
    for split in ("train", "val"):
        (list_dir / f"{split}.txt").write_text("\n".join(lines[split]) + "\n")
    return root


# --------------------------------------------------------------------------
# Episode loader
# --------------------------------------------------------------------------

class CaterEpisodes:
    """Infinite batches of (chunked episode, multilabel target).

    Yields ``{"image": (B·n, L, H, W, C) in [-0.5, 0.5],
    "label": (B, n_classes), "n_chunks": n}`` — the reference folds
    episode chunks into the batch axis before the world model and
    unfolds them for the classifier (models.py:reshape_data)."""

    def __init__(self, root, split: str = "train", batch_size: int = 4,
                 batch_length: int = 20, n_classes: int = N_CATER_CLASSES,
                 task: str = "actions_present", seed: int = 0):
        root = pathlib.Path(root)
        self.labels = load_cater_labels(
            root / "lists" / task / f"{split}.txt", n_classes)
        self.names = sorted(self.labels)
        if not self.names:
            raise FileNotFoundError(f"no episodes listed for {split} "
                                    f"under {root}")
        self.vid_dir = root / "videos"
        self.batch_size = batch_size
        self.batch_length = batch_length
        self.n_classes = n_classes
        self._rng = np.random.RandomState(seed)
        self._train = split == "train"
        self._cursor = 0

    def __len__(self) -> int:
        return max(len(self.names) // self.batch_size, 1)

    def _episode(self, name: str) -> np.ndarray:
        video = np.load(self.vid_dir / name)
        return video.astype(np.float32) / 255.0 - 0.5

    def __iter__(self) -> Iterator[Dict]:
        return self

    def __next__(self) -> Dict:
        if self._train:
            idx = self._rng.randint(0, len(self.names), self.batch_size)
        else:
            idx = [(self._cursor + i) % len(self.names)
                   for i in range(self.batch_size)]
            self._cursor = (self._cursor + self.batch_size) % len(self.names)
        vids = np.stack([self._episode(self.names[i]) for i in idx])
        labels = np.stack([self.labels[self.names[i]] for i in idx])
        b, t = vids.shape[:2]
        n = max(t // self.batch_length, 1)
        chunks = vids[:, : n * self.batch_length].reshape(
            (b * n, self.batch_length) + vids.shape[2:])
        return {"image": jnp.asarray(chunks), "label": jnp.asarray(labels),
                "n_chunks": n}


# --------------------------------------------------------------------------
# Model: WorldModel features + recurrent multilabel readout
# --------------------------------------------------------------------------

class CaterClassifierModel:
    """WorldModel + FeatureClassifier pair (reference ConvGRUClassifier
    holds a world model and trains a separate classifier head on its
    posterior features, dreamerv2/models.py:105-197). Kept as two flax
    modules so the two parameter trees get the reference's two separate
    optimizers."""

    def __init__(self, cfg):
        from ode_rl_tpu.wm.classifier import FeatureClassifier
        from ode_rl_tpu.wm.world_model import WorldModel

        self.n_classes = int(cfg.get("n_classes", N_CATER_CLASSES))
        self.wm = WorldModel(
            image_shape=(64, 64, int(cfg.get("in_channels", 3))),
            cnn_depth=int(cfg.get("cnn_depth", 32)),
            stoch=int(cfg.get("dyn_stoch", 32)),
            deter=int(cfg.get("dyn_deter", 200)),
            hidden=int(cfg.get("dyn_hidden", 200)),
            discrete=int(cfg.get("dyn_discrete", 0)))
        self.clf = FeatureClassifier(
            n_classes=self.n_classes,
            hidden=int(cfg.get("classifier_units", 256)))
        self.feat_dim = int(self.wm.deter
                            + self.wm.stoch * max(self.wm.discrete, 1))

    def init(self, key, sample_batch):
        k1, k2, k3 = jax.random.split(key, 3)
        wm_vars = self.wm.init({"params": k1, "sample": k2},
                               {"image": sample_batch["image"]},
                               method=self.wm.loss)
        clf_vars = self.clf.init(k3, jnp.zeros((1, 2, self.feat_dim)))
        return {"wm": wm_vars["params"], "clf": clf_vars["params"]}

    def logits(self, params, batch, key, n_chunks: int):
        feats = self.wm.apply({"params": params["wm"]}, batch["image"],
                              method=self.wm.observe_features,
                              rngs={"sample": key})
        chunk_last = feats[:, -1]                       # (B·n, F)
        bn, f = chunk_last.shape
        seq = chunk_last.reshape(bn // n_chunks, n_chunks, f)
        return self.clf.apply({"params": params["clf"]},
                              seq.astype(jnp.float32))


# --------------------------------------------------------------------------
# Training path
# --------------------------------------------------------------------------

def val_metric_sweep(model, params, val_set, key, n_chunks: int) -> Dict:
    """Val-split metric sweep shared by training and the eval-only entry:
    ranked mAP, top-5, a random-logits mAP baseline, and the reference's
    own threshold-precision metric (dreamerv2/tools.py:355-377)."""
    from ode_rl_tpu.wm.classifier import (mean_average_precision,
                                          reference_map_precision,
                                          top_k_accuracy)

    eval_fwd = jax.jit(
        lambda p, batch, k: model.logits(p, batch, k, n_chunks))
    logits_all, labels_all = [], []
    vs = val_set()
    for _ in range(len(vs)):
        batch = next(vs)
        key, sub = jax.random.split(key)
        logits_all.append(np.asarray(eval_fwd(params, batch, sub)))
        labels_all.append(np.asarray(batch["label"]))
    logits = jnp.asarray(np.concatenate(logits_all))
    labels = jnp.asarray(np.concatenate(labels_all))
    rand = jax.random.normal(jax.random.key(123), logits.shape)
    return {
        "val_mAP": float(mean_average_precision(logits, labels)),
        "val_top5": float(top_k_accuracy(logits, labels, 5)),
        "random_mAP_baseline": float(mean_average_precision(rand, labels)),
        "val_mAP_reference_metric": float(
            reference_map_precision(logits, labels)),
    }


def eval_cater_classifier(cfg, logdir: Optional[pathlib.Path] = None
                          ) -> Dict:
    """Eval-only CATER classifier entry (capability parity with the
    reference's separate evaluation driver, dreamerv2/evaluation.py:
    restore a trained snapshot, sweep the val split, no training).
    Reached via ``phase: test`` on the CATER config; the snapshot is
    resolved by explicit ckpt_id and the model is resurrected from the
    saved train config."""
    from ode_rl_tpu.core.checkpoint import (CheckpointManager,
                                            find_checkpoint)
    from ode_rl_tpu.core.config import Config

    root_logs = pathlib.Path(logdir or cfg.get("logdir", "logs"))
    ckpt_id = cfg.get("ckpt_id") or cfg.get("id", "cater_classifier")
    ckpt_dir = find_checkpoint(root_logs, "CATER", ckpt_id)
    ckpt = CheckpointManager(ckpt_dir, tag=ckpt_id)
    saved = ckpt.load_config()
    if saved:
        # train config drives model geometry; CLI keeps runtime knobs
        merged = dict(saved)
        for k in ("batch_size", "data_dir", "seed", "eval_batches"):
            if k in cfg:
                merged[k] = cfg[k]
        cfg = Config(merged)

    root = pathlib.Path(cfg.get("data_dir", "datasets/cater_synth"))
    if not (root / "videos").exists():
        raise FileNotFoundError(
            f"no CATER corpus at {root} — run the training path first "
            "(it materializes the synthetic corpus) or point --data_dir "
            "at a reference-layout corpus")

    n_classes = int(cfg.get("n_classes", N_CATER_CLASSES))
    batch_length = int(cfg.get("batch_length", 20))
    val_set = lambda: CaterEpisodes(root, "val", cfg.batch_size,
                                    batch_length, n_classes)
    model = CaterClassifierModel(cfg)

    key = jax.random.key(cfg.get("seed", 0))
    key, ik = jax.random.split(key)
    sample = next(iter(val_set()))
    template = model.init(ik, sample)
    restored = ckpt.restore(template)
    params, step = restored["state"], restored["step"]

    final = {**val_metric_sweep(model, params, val_set, key,
                                int(sample["n_chunks"])),
             "ckpt_step": int(step)}
    out = ckpt_dir.parent / "cater_eval_test_phase.json"
    out.write_text(json.dumps(final, indent=2))
    print("CATER eval-only:", json.dumps(final))
    return final


def train_cater_classifier(cfg, logdir: Optional[pathlib.Path] = None
                           ) -> Dict:
    """Classifier-on-world-model-features training (the reference's CATER
    task-1 mode). Builds the corpus if absent, trains the world model and
    the classifier jointly with separate optimizers (the reference keeps
    separate Optimizer instances for the WM and classifier parts), and
    reports val-split mAP against a random-logits baseline."""
    import optax

    from ode_rl_tpu.core.checkpoint import CheckpointManager
    from ode_rl_tpu.core.logging import MetricLogger
    from ode_rl_tpu.wm.classifier import (mean_average_precision,
                                          top_k_accuracy)
    from ode_rl_tpu.wm.world_model import world_model_optimizer

    root = pathlib.Path(cfg.get("data_dir", "datasets/cater_synth"))
    if not (root / "videos").exists():
        print(f"materializing synthetic CATER corpus at {root}")
        write_synthetic_cater(root,
                              n_train=int(cfg.get("cater_train", 120)),
                              n_val=int(cfg.get("cater_val", 40)),
                              n_frames=int(cfg.get("cater_frames", 40)))

    n_classes = int(cfg.get("n_classes", N_CATER_CLASSES))
    batch_length = int(cfg.get("batch_length", 20))
    train_set = CaterEpisodes(root, "train", cfg.batch_size, batch_length,
                              n_classes, seed=cfg.get("seed", 0))
    val_set = lambda: CaterEpisodes(root, "val", cfg.batch_size,
                                    batch_length, n_classes)

    model = CaterClassifierModel(cfg)
    wm = model.wm

    sample = next(iter(train_set))
    key = jax.random.key(cfg.get("seed", 0))
    key, ik = jax.random.split(key)
    params = model.init(ik, sample)

    wm_tx = world_model_optimizer(float(cfg.get("lr", 3e-4)))
    clf_tx = optax.adam(float(cfg.get("classifier_lr", 1e-3)))
    state = {**params, "wm_opt": wm_tx.init(params["wm"]),
             "clf_opt": clf_tx.init(params["clf"])}
    n_chunks = int(sample["n_chunks"])

    @jax.jit
    def train_step(state, batch, key):
        def losses(params):
            # One world-model forward serves both objectives: loss()
            # returns its posterior features for the classifier instead
            # of re-running encoder+observe on the same batch.
            wm_loss, (wm_metrics, _) = wm.apply(
                {"params": params["wm"]}, {"image": batch["image"]},
                method=wm.loss, rngs={"sample": key},
                return_features=True)
            feats = wm_metrics.pop("_features")
            chunk_last = feats[:, -1]
            bn, f = chunk_last.shape
            seq = chunk_last.reshape(bn // n_chunks, n_chunks, f)
            logits = model.clf.apply({"params": params["clf"]},
                                     seq.astype(jnp.float32))
            labels = batch["label"].astype(jnp.float32)
            lp = (labels * jax.nn.log_sigmoid(logits)
                  + (1 - labels) * jax.nn.log_sigmoid(-logits))
            clf_loss = -jnp.mean(lp)
            return wm_loss + clf_loss, (wm_metrics, clf_loss, logits)

        (_, (wm_metrics, clf_loss, logits)), grads = jax.value_and_grad(
            losses, has_aux=True)({"wm": state["wm"], "clf": state["clf"]})
        wm_up, wm_opt = wm_tx.update(grads["wm"], state["wm_opt"],
                                     state["wm"])
        clf_up, clf_opt = clf_tx.update(grads["clf"], state["clf_opt"],
                                        state["clf"])
        new = {"wm": optax.apply_updates(state["wm"], wm_up),
               "clf": optax.apply_updates(state["clf"], clf_up),
               "wm_opt": wm_opt, "clf_opt": clf_opt}
        labels = batch["label"].astype(jnp.float32)
        metrics = {"loss": wm_metrics["loss"] + clf_loss,
                   "wm_loss": wm_metrics["loss"],
                   "classifier_loss": clf_loss,
                   "mAP": mean_average_precision(logits, labels),
                   "top5": top_k_accuracy(logits, labels, 5)}
        return new, metrics

    run_id = cfg.get("id", "cater_classifier")
    logdir = pathlib.Path(logdir or cfg.get("logdir", "logs")) / "CATER" / run_id
    logger = MetricLogger(logdir, quiet=cfg.get("quiet", False))
    ckpt = CheckpointManager(logdir / "checkpoints",
                             tag=cfg.get("ckpt_id", run_id))

    steps = (int(cfg.get("steps_per_epoch", 0)) or len(train_set)) \
        * int(cfg.epochs)
    log_freq = int(cfg.get("loss_log_freq", 50))
    last: Dict = {}
    for step in range(1, steps + 1):
        batch = next(train_set)
        key, sub = jax.random.split(key)
        state, metrics = train_step(state, batch, sub)
        if step % log_freq == 0 or step == 1:
            last = {k: float(v) for k, v in jax.device_get(metrics).items()}
            logger.log(step, last)

    final = {**val_metric_sweep(model,
                                {"wm": state["wm"], "clf": state["clf"]},
                                val_set, key, n_chunks),
             "steps": steps}
    logger.log(steps, final)
    ckpt.save(steps, {"wm": state["wm"], "clf": state["clf"]},
              config=cfg.to_dict())
    (logdir / "cater_eval.json").write_text(json.dumps(final, indent=2))
    logger.close()
    print(f"CATER classifier: val mAP {final['val_mAP']:.3f} "
          f"(random baseline {final['random_mAP_baseline']:.3f}), "
          f"top5 {final['val_top5']:.3f}")
    return final
