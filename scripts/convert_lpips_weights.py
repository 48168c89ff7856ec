#!/usr/bin/env python
"""Convert torch LPIPS weights to the .npz layout ode_rl_tpu ingests.

The reference's vendored LPIPS (Vid-ODE/eval_models/pretrained_networks.py)
pulls torchvision AlexNet weights at runtime plus the LPIPS `lin` 1x1-conv
weights from a checkpoint. This environment has zero egress, so the
framework instead ingests pre-converted .npz files:

  python scripts/convert_lpips_weights.py \
      --alexnet alexnet.pth --lins lpips_lins.pth \
      --out-alexnet alexnet.npz --out-lins lins.npz

Input layouts accepted:
  * alexnet: a torchvision AlexNet state_dict (keys ``features.{idx}.weight``
    with conv indices 0, 3, 6, 8, 10) or a bare ``{idx}.weight`` features
    state_dict, or an already-flat ``conv{i}_w`` dict.
  * lins: the LPIPS linear-layer checkpoint (keys ``lin{i}.model.1.weight``
    with shape (1, C, 1, 1), as saved by the official LPIPS repo and the
    reference's dist_model), or flat ``lin{i}`` arrays.

Outputs:
  * alexnet npz: conv{i}_w (OIHW) + conv{i}_b for i in 0..4
  * lins npz: lin{i} (C,) for i in 0..4

These feed ode_rl_tpu.eval_models.lpips.load_torch_weights (which
transposes OIHW -> HWIO). Round-tripped + output-equality-tested in
tests/test_lpips_ingest.py.
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

# torchvision AlexNet: conv layers sit at these indices of `features`.
ALEX_FEATURE_IDX = [0, 3, 6, 8, 10]


def _to_numpy(t):
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def convert_alexnet(state: dict) -> dict:
    """torch state_dict → {conv{i}_w (OIHW), conv{i}_b} arrays."""
    out = {}
    keys = set(state.keys())
    for i, idx in enumerate(ALEX_FEATURE_IDX):
        for cand_w, cand_b in ((f"features.{idx}.weight", f"features.{idx}.bias"),
                               (f"{idx}.weight", f"{idx}.bias"),
                               (f"conv{i}_w", f"conv{i}_b")):
            if cand_w in keys:
                w = _to_numpy(state[cand_w])
                b = _to_numpy(state[cand_b])
                break
        else:
            raise KeyError(
                f"AlexNet conv {i} not found (tried features.{idx}.weight / "
                f"{idx}.weight / conv{i}_w) among {sorted(keys)[:8]}…")
        if w.ndim != 4:
            raise ValueError(f"conv{i} weight must be OIHW 4-D, got {w.shape}")
        out[f"conv{i}_w"] = w.astype(np.float32)
        out[f"conv{i}_b"] = b.astype(np.float32)
    return out


def convert_lins(state: dict) -> dict:
    """LPIPS linear checkpoint → {lin{i}: (C,) } arrays."""
    out = {}
    keys = set(state.keys())
    for i in range(5):
        for cand in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight",
                     f"lin{i}"):
            if cand in keys:
                w = _to_numpy(state[cand])
                break
        else:
            raise KeyError(f"lin{i} not found among {sorted(keys)}")
        out[f"lin{i}"] = w.reshape(-1).astype(np.float32)
    return out


def _load_torch_file(path: str) -> dict:
    p = pathlib.Path(path)
    if p.suffix == ".npz":
        return dict(np.load(p))
    import torch
    obj = torch.load(p, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return dict(obj)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--alexnet", required=True,
                    help=".pth/.npz with AlexNet conv weights")
    ap.add_argument("--lins", default="",
                    help=".pth/.npz with LPIPS lin weights (optional)")
    ap.add_argument("--out-alexnet", required=True)
    ap.add_argument("--out-lins", default="")
    args = ap.parse_args()

    alex = convert_alexnet(_load_torch_file(args.alexnet))
    np.savez(args.out_alexnet, **alex)
    print(f"wrote {args.out_alexnet}: "
          + ", ".join(f"{k}{list(v.shape)}" for k, v in sorted(alex.items())))
    if args.lins:
        if not args.out_lins:
            raise SystemExit("--lins given but no --out-lins")
        lins = convert_lins(_load_torch_file(args.lins))
        np.savez(args.out_lins, **lins)
        print(f"wrote {args.out_lins}: "
              + ", ".join(f"{k}{list(v.shape)}" for k, v in sorted(lins.items())))


if __name__ == "__main__":
    main()
