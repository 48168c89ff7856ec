#!/usr/bin/env python
"""Write per-video DFP motion labels from FlowNetC-predicted flow.

Capability parity with
/root/reference/scripts/get_labels_from_pred_flow.py:30-49 +
helpers/flow_utils.py:51-92: for every video in a frozen corpus, predict
optical flow between consecutive frames, split into a 3×3 grid, take the
top-k cells by mean flow magnitude (≙ the reference's mean HSV saturation
of rendered flow), and save a multi-hot label array per video — row 0 is
zeros (no transition into the first frame), matching the reference's
array layout.

Works on both corpus layouts: frozen Moving-MNIST shards
(datasets/<root>/{train,test}/shard_*.npy, labels written as
shard_NNNN_labels.npy) and per-video corpora (video_*.npy →
video_*_labels.npy).

    python scripts/get_labels_from_pred_flow.py --data datasets/parity \
        [--flownet_params logs/flow/flownetc.msgpack] [--topk 3]
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--splits", default="train,test")
    ap.add_argument("--flownet_params", default="")
    ap.add_argument("--grid", type=int, default=3)
    ap.add_argument("--topk", type=int, default=3)
    ap.add_argument("--batch_videos", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ode_rl_tpu.data.flow_labels import make_flownet_label_fn
    from ode_rl_tpu.flow.flownets import FlowNetC

    net = FlowNetC()
    dummy = jnp.zeros((1, 64, 64, 3))
    params = net.init(jax.random.key(0), dummy, dummy)
    if args.flownet_params and pathlib.Path(args.flownet_params).exists():
        from flax import serialization
        params = serialization.from_bytes(
            params, pathlib.Path(args.flownet_params).read_bytes())
        print("loaded FlowNetC params from", args.flownet_params)
    else:
        print("warning: no trained FlowNetC params given — labels come "
              "from a random-init net (train one via "
              "ode_rl_tpu.flow.train.train_flownet + save_flownet_params)")
    label_fn = jax.jit(make_flownet_label_fn(net, params, grid=args.grid,
                                             topk=args.topk))

    root = pathlib.Path(args.data)
    for split in args.splits.split(","):
        files = sorted((root / split).glob("*.npy"))
        files = [f for f in files if not f.stem.endswith("_labels")]
        for f in files:
            videos = np.load(f, mmap_mode="r")
            if videos.ndim == 3:          # single video (T, H, W)
                videos = videos[None, ..., None]
            elif videos.ndim == 4 and videos.shape[-1] in (1, 3, 6):
                videos = videos[None]     # single video (T, H, W, C)
            n, t = videos.shape[:2]
            labels = []
            for b0 in range(0, n, args.batch_videos):
                clip = np.asarray(videos[b0:b0 + args.batch_videos],
                                  np.float32) / 255.0
                if clip.ndim == 4:
                    clip = clip[..., None]
                lab = np.asarray(label_fn(jnp.asarray(clip)))
                # reference layout: zeros row for frame 0, then one row
                # per transition → (T, grid²) per video
                zeros = np.zeros((lab.shape[0], 1, lab.shape[2]), lab.dtype)
                labels.append(np.concatenate([zeros, lab], axis=1))
            out = f.with_name(f.stem + "_labels.npy")
            np.save(out, np.concatenate(labels) if len(labels) > 1
                    else labels[0])
            print(f"{f.name}: labels {np.concatenate(labels).shape if len(labels) > 1 else labels[0].shape} → {out.name}")


if __name__ == "__main__":
    main()
