"""A/B: two-stage prescreened prior retrieval vs single-stage full-res
scoring on the demo clip (VERDICT r2 next #2 'identical or
equivalence-tested selected views').

Runs track_sequence twice in-process (same data, same seed, same compiled
cache): once with system.prior.prescreen.enabled=false (reference-exact
single stage), once with the default two-stage config.  Reports per-phase
wall clock, the selected prior indices of both runs, and final joint IoU.

    python tools/ab_prescreen.py --config configs/custom_shoes.yaml
"""
from __future__ import annotations

import argparse
import copy
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    from dynhor_tpu.utils.compcache import enable_persistent_cache

    enable_persistent_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/custom_shoes.yaml")
    ap.add_argument(
        "--variants",
        default="224:2:48",
        help="comma list of two-stage prescreen variants edge:scale:topk;"
        " each is compared against the single-stage run's selected views",
    )
    args = ap.parse_args()

    import numpy as np

    from dynhor_tpu.io.config import load_config
    from dynhor_tpu.models import dino as dino_mod
    from dynhor_tpu.tracker import pipeline as PL

    cfg = load_config(args.config)
    sysc = cfg["system"]
    seq = PL.load_sequence(cfg["data_info"]["dataroot"])
    ann = PL.process_frames(
        seq, int(sysc["crop_size"]), float(sysc["bbox_expansion"])
    )
    mesh = PL.load_mesh(
        cfg["data_info"]["obj_path"], bool(cfg["data_info"]["normalize_mesh"])
    )
    dparams, dcfg = dino_mod.load_params(
        sysc["dino"].get("checkpoint"),
        dino_mod.DinoConfig(smaller_edge_size=int(sysc["dino"]["smaller_edge_size"])),
    )

    variants = []
    for spec in args.variants.split(","):
        edge, scale, topk = (int(x) for x in spec.strip().split(":"))
        variants.append((edge, scale, topk))

    results = {}
    runs = [("single-stage", None)] + [
        (f"two-stage e{e}/s{s}/k{k}", (e, s, k)) for e, s, k in variants
    ]
    for name, var in runs:
        c = copy.deepcopy(cfg)
        ps = dict(c["system"]["prior"].get("prescreen") or {})
        if var is None:
            ps["enabled"] = False
        else:
            ps.update(enabled=True, edge=var[0], scale=var[1], topk=var[2])
        c["system"]["prior"]["prescreen"] = ps
        t0 = time.time()
        res = PL.track_sequence(c, seq, ann, mesh, dino_params=dparams, dino_cfg=dcfg)
        dt = time.time() - t0
        results[name] = (res, dt)
        print(f"[{name}] wall {dt:.1f}s, joint IoU {res.history['iou_object'][-1]:.4f}")

    a = results["single-stage"][0]
    n = len(a.selected_idx)
    iou_a = float(a.history["iou_object"][-1])
    print(f"single selected: {np.asarray(a.selected_idx).tolist()}")
    for name, _ in runs[1:]:
        b = results[name][0]
        same = int((np.asarray(a.selected_idx) == np.asarray(b.selected_idx)).sum())
        iou_b = float(b.history["iou_object"][-1])
        print(
            f"[{name}] selected-view agreement: {same}/{n}  "
            f"joint IoU {iou_b:.4f} (d={iou_b - iou_a:+.4f})  "
            f"wall {results[name][1]:.1f}s vs single {results['single-stage'][1]:.1f}s"
        )
        if same != n:
            print(f"  {name} selected: {np.asarray(b.selected_idx).tolist()}")


if __name__ == "__main__":
    main()
