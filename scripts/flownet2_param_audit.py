#!/usr/bin/env python
"""Layer-by-layer FlowNet2 parameter reconciliation against the reference.

The reference pins "Parameter count = 162,518,834"
(/root/reference/flownet2-pytorch/models.py:38). This audit instantiates
the reference torch networks on CPU (with the three CUDA op packages
stubbed — they are construction-time imports only and hold no
parameters), counts parameters per layer, does the same for the flax
FlowNet2 stack, and reconciles the two per sub-network.

Usage: python scripts/flownet2_param_audit.py [--json OUT.json]
Also imported by tests/test_flownets.py for the exact-count assertions.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import pathlib
import sys
import types
from collections import Counter
from types import SimpleNamespace

REF = pathlib.Path("/root/reference/flownet2-pytorch")
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def load_reference_networks():
    """Import the reference networks/*.py with CUDA packages stubbed.
    Returns a dict of constructed torch modules (batchNorm=False, the
    FlowNet2 configuration, models.py:44-100)."""
    import torch.nn as nn

    class _StubOp(nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

    pkg = types.ModuleType("refnets")
    pkg.__path__ = [str(REF / "networks")]
    sys.modules["refnets"] = pkg
    for sub, cls in [("correlation_package", "Correlation"),
                     ("resample2d_package", "Resample2d"),
                     ("channelnorm_package", "ChannelNorm")]:
        sp = types.ModuleType(f"refnets.{sub}")
        sp.__path__ = []
        sys.modules[f"refnets.{sub}"] = sp
        leaf = types.ModuleType(f"refnets.{sub}.{cls.lower()}")
        setattr(leaf, cls, _StubOp)
        sys.modules[f"refnets.{sub}.{cls.lower()}"] = leaf

    def _load(name):
        spec = importlib.util.spec_from_file_location(
            f"refnets.{name}", REF / "networks" / f"{name}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refnets.{name}"] = mod
        spec.loader.exec_module(mod)
        return mod

    _load("submodules")
    args = SimpleNamespace(fp16=False, rgb_max=255.0)
    nets = {
        "flownetc": _load("FlowNetC").FlowNetC(args, batchNorm=False),
        "flownets": _load("FlowNetS").FlowNetS(args, batchNorm=False),
        "flownetsd": _load("FlowNetSD").FlowNetSD(args, batchNorm=False),
        "fusion": _load("FlowNetFusion").FlowNetFusion(args,
                                                       batchNorm=False),
    }
    return nets


def torch_layer_counts(module):
    counts = {}
    for name, p in module.named_parameters():
        counts[name] = list(p.shape)
    return counts


def flax_layer_counts(tree, prefix=""):
    import jax
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        name = "/".join(getattr(k, "key", str(k)) for k in path)
        flat[name] = list(leaf.shape)
    return flat


def _total(counts):
    t = 0
    for shape in counts.values():
        n = 1
        for d in shape:
            n *= d
        t += n
    return t


def _shape_multiset(counts):
    """Multiset of sorted shape tuples — layout-agnostic (torch OIHW vs
    flax HWIO hold the same dims in different order)."""
    return Counter(tuple(sorted(s)) for s in counts.values())


def build_flax_counts():
    import jax
    import jax.numpy as jnp
    from ode_rl_tpu.flow.flownets import FlowNet2

    model = FlowNet2()
    img = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.key(0), img, img)["params"]
    subtrees = {
        "flownetc": params["css"]["flownetcs"]["flownetc"],
        "flownets_1": params["css"]["flownetcs"]["flownets1"],
        "flownets_2": params["css"]["flownets2"],
        "flownetsd": params["flownetsd"],
        "fusion": params["fusion"],
    }
    return {k: flax_layer_counts(v) for k, v in subtrees.items()}, params


def audit():
    ref_nets = load_reference_networks()
    ref_counts = {k: torch_layer_counts(v) for k, v in ref_nets.items()}
    ours_counts, params = build_flax_counts()

    pairs = [("flownetc", "flownetc"), ("flownets", "flownets_1"),
             ("flownets", "flownets_2"), ("flownetsd", "flownetsd"),
             ("fusion", "fusion")]
    report = {"nets": {}, "mismatches": {}}
    ref_total = 0
    ours_total = 0
    for ref_k, our_k in pairs:
        rc, oc = ref_counts[ref_k], ours_counts[our_k]
        rt, ot = _total(rc), _total(oc)
        ref_total += rt
        ours_total += ot
        report["nets"][our_k] = {"reference": rt, "ours": ot,
                                 "match": rt == ot}
        if rt != ot:
            rs, os_ = _shape_multiset(rc), _shape_multiset(oc)
            report["mismatches"][our_k] = {
                "only_in_reference": [list(s) for s in (rs - os_).elements()],
                "only_in_ours": [list(s) for s in (os_ - rs).elements()],
            }
    import jax
    grand = sum(x.size for x in jax.tree_util.tree_leaves(params))
    report["total"] = {"reference": ref_total, "ours_submodules": ours_total,
                       "ours_flownet2": grand,
                       "reference_pinned": 162_518_834}
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default="")
    args = ap.parse_args()
    report = audit()
    out = json.dumps(report, indent=2) + "\n"
    if args.json:
        pathlib.Path(args.json).write_text(out)
    print(out)


if __name__ == "__main__":
    main()
