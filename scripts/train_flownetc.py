#!/usr/bin/env python
"""Train FlowNetC to a clearly-below-random EPE and ship the params.

Closes the flow-label loop: the reference's DFP labels come from a
*trained* flow network (scripts/get_labels_from_pred_flow.py:30-49 in
/root/reference), so running the faithful predicted-flow label path with
a randomly initialized FlowNetC would supervise S3VAE's DFP head against
noise. This script trains FlowNetC on the synthetic random-warp corpus
(same supervision structure as FlyingChairs: image pair + exact flow),
validates EPE on a held-out FlyingChairs-layout disk corpus against a
random-init baseline, and saves flax-msgpack params at the path that
``flownet_params_path`` defaults to (logs/flow/flownetc.msgpack).

Usage:
    python scripts/train_flownetc.py [--steps 2000] [--batch 8]
        [--out logs/flow/flownetc.msgpack] [--report results/round3/flownetc.json]

``--net S`` trains FlowNetS instead (concatenated-pair input, the
reference's flownet2-pytorch/networks/FlowNetS.py contract) with its own
default out/report paths — same train corpus, same held-out EPE protocol.
``--net 2`` trains the full stacked FlowNet2 (C→S→S + SD + Fusion,
162,518,834 params) with the reference's single-scale L1 loss on the
fusion output (flownet2-pytorch main.py default --loss=L1Loss).
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--net", choices=["C", "S", "2"], default="C")
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--out", default=None)
    ap.add_argument("--report", default=None)
    ap.add_argument("--val_pairs", type=int, default=64)
    ap.add_argument("--warm_start", action="store_true",
                    help="(--net 2 only) graft the separately-trained "
                         "FlowNetC/FlowNetS checkpoints into the stack "
                         "before training — the reference's staged "
                         "schedule (flownet2-pytorch/main.py --resume).")
    args = ap.parse_args()
    tag = {"C": "flownetc", "S": "flownets", "2": "flownet2"}[args.net]
    if args.out is None:
        args.out = f"logs/flow/{tag}.msgpack"
    if args.report is None:
        args.report = f"results/round3/{tag}.json"
    # FlowNetS consumes the channel-stacked image pair; FlowNetC and the
    # stacked FlowNet2 take the two images separately.
    pair_input = args.net == "S"
    # FlowNet2 emits one full-resolution flow (the fusion output) rather
    # than a pyramid — trained with the reference's plain L1 loss.
    single_scale = args.net == "2"

    import jax

    from ode_rl_tpu.flow.data import (FlyingChairsCorpus, validate_epe,
                                      write_synthetic_chairs)
    from ode_rl_tpu.flow.flownets import FlowNet2, FlowNetC, FlowNetS
    from ode_rl_tpu.flow.train import save_flownet_params, train_flownet

    net = {"C": FlowNetC, "S": FlowNetS, "2": FlowNet2}[args.net]()

    # Held-out FlyingChairs-layout disk corpus for EPE validation (the
    # training stream is the on-device generator, so the entire disk
    # corpus is held out: train_split=0.0 keeps all pairs in the val
    # slice instead of only the last 10%).
    val_dir = pathlib.Path(tempfile.mkdtemp(prefix="chairs_val_"))
    write_synthetic_chairs(val_dir, n_pairs=args.val_pairs, seed=1234)
    val = lambda: FlyingChairsCorpus(val_dir, batch_size=args.batch,
                                    is_train=False, train_split=0.0, seed=0)
    n_eval_pairs = len(val()) * args.batch

    # Random-init baseline EPE (what the old fallback path was using).
    import jax.numpy as jnp
    dummy = jnp.zeros((1, 64, 64, 3))
    rand_params = (net.init(jax.random.key(0), jnp.concatenate([dummy] * 2, axis=-1))
                   if pair_input else net.init(jax.random.key(0), dummy, dummy))
    rand_epe = validate_epe(net, rand_params, val(), pair_input=pair_input,
                            single_scale=single_scale)
    print(f"random-init FlowNet{args.net} val EPE: {rand_epe:.4f}")

    init_params = None
    graft_info = None
    if args.warm_start:
        assert args.net == "2", "--warm_start is the FlowNet2 staging path"
        from ode_rl_tpu.flow.train import graft_params, load_flownet_params
        donor_c = load_flownet_params("logs/flow/flownetc.msgpack")["params"]
        donor_s = load_flownet_params("logs/flow/flownets.msgpack")["params"]
        p = rand_params["params"]
        css = dict(p["css"])
        cs = dict(css["flownetcs"])
        cs["flownetc"], g_c, s_c = graft_params(cs["flownetc"], donor_c)
        cs["flownets1"], g_s1, s_s1 = graft_params(cs["flownets1"], donor_s)
        css["flownetcs"] = cs
        css["flownets2"], g_s2, s_s2 = graft_params(css["flownets2"], donor_s)
        init_params = {"params": {**p, "css": css}}
        graft_info = {"flownetc": [g_c, s_c], "flownets1": [g_s1, s_s1],
                      "flownets2": [g_s2, s_s2]}
        warm_epe = validate_epe(net, init_params, val(),
                                pair_input=pair_input,
                                single_scale=single_scale)
        graft_info["val_epe_warm_start"] = warm_epe
        print(f"warm-start grafts (copied, shape-skipped): {graft_info}")

    t0 = time.time()
    out = train_flownet(net, steps=args.steps, batch=args.batch,
                        lr=args.lr, pair_input=pair_input,
                        single_scale=single_scale, init_params=init_params)
    train_s = time.time() - t0
    trained_epe = validate_epe(net, out["state"]["params"], val(),
                               pair_input=pair_input,
                               single_scale=single_scale)
    print(f"trained  FlowNet{args.net} val EPE: {trained_epe:.4f} "
          f"(final train loss {out['loss']:.4f}, epe {out['epe']:.4f}; "
          f"{args.steps} steps in {train_s:.0f}s)")

    save_flownet_params(out["state"], args.out)
    print(f"saved params → {args.out}")

    report = {
        "net": f"FlowNet{args.net}",
        "steps": args.steps, "batch": args.batch, "lr": args.lr,
        "train_seconds": round(train_s, 1),
        "final_train_loss": out["loss"], "final_train_epe": out["epe"],
        "val_epe_random_init": rand_epe, "val_epe_trained": trained_epe,
        "val_pairs": args.val_pairs, "val_pairs_evaluated": n_eval_pairs,
        "params_path": str(args.out),
    }
    if graft_info is not None:
        report["warm_start"] = graft_info
    rp = pathlib.Path(args.report)
    rp.parent.mkdir(parents=True, exist_ok=True)
    rp.write_text(json.dumps(report, indent=2) + "\n")
    print(f"report → {rp}")


if __name__ == "__main__":
    main()
