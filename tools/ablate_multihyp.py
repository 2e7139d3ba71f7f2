"""Multi-hypothesis init ablation: K=1 gate pick vs num_initializations=K.

VERDICT r4 next #1: the oracle ablation (tools/ablate_oracle_init.py,
BASELINE.md round-4 table) proved refine+joint recover to ~0.98 IoU from
any sane init — the whole absolute-quality gap on kettle/shoes2 is the
random-weight-DINO gate miss (incl. shoes2's near-180-degree silhouette
flip).  Real DINOv2 weights (the reference's fix, dino.py:12-14) cannot
enter this zero-egress image, so the in-environment mitigation is
multi-hypothesis initialization: refine K inits per frame (gate pick, its
180-degree flips, silhouette-IoU-retrieved diverse views), select the
per-frame winner by loss after a short tournament
(tracker/selection.build_hypotheses + tracker/refine.refine_poses_multihyp
— the affordance the reference plumbs but never enables,
pose_initializtion.py:258,390).

Runs both arms with matched configs and reports joint IoU, rot errors vs
GT, and the wall-clock cost delta:

    python tools/ablate_multihyp.py --config configs/custom_kettle.yaml \
        [--k 4] [--init-iters 50] [--joint-iters 100] [--views 500] \
        [--tournament 25]
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
    ap.add_argument("--config", default="configs/custom_kettle.yaml")
    ap.add_argument("--k", type=int, default=4,
                    help="num_initializations for the multi-hyp arm")
    ap.add_argument("--init-iters", type=int, default=50)
    ap.add_argument("--joint-iters", type=int, default=100)
    ap.add_argument("--views", type=int, default=500)
    ap.add_argument("--tournament", type=int, default=25)
    ap.add_argument("--propagate-rounds", type=int, default=None,
                    help="override system.hypotheses.propagate_rounds")
    ap.add_argument("--smooth-weight", type=float, default=None,
                    help="override system.hypotheses.smooth_weight")
    ap.add_argument("--skip-k1", action="store_true",
                    help="run only the multi-hypothesis arm")
    args = ap.parse_args()

    import numpy as np

    from dynhor_tpu.io.config import load_config
    from dynhor_tpu.models import dino as dino_mod
    from dynhor_tpu.tracker import pipeline as PL
    from dynhor_tpu.utils import geometry as G

    cfg = load_config(args.config)
    sysc = cfg["system"]
    sysc["init_num_iterations"] = args.init_iters
    sysc["joint_num_iterations"] = args.joint_iters
    sysc["prior"]["num_views"] = args.views
    dataroot = cfg["data_info"]["dataroot"]
    gt_path = os.path.join(dataroot, "gt_poses.npz")
    if not os.path.exists(gt_path):
        sys.exit(f"no {gt_path} — the ablation needs synthetic GT")
    gt = np.load(gt_path)
    gt_row = np.swapaxes(gt["R"], -1, -2)

    seq = PL.load_sequence(dataroot)
    ann = PL.process_frames(
        seq, int(sysc["crop_size"]), float(sysc["bbox_expansion"])
    )
    mesh = PL.load_mesh(
        cfg["data_info"]["obj_path"], bool(cfg["data_info"]["normalize_mesh"])
    )
    dparams, dcfg = dino_mod.load_params(
        sysc["dino"].get("checkpoint"),
        dino_mod.config_for_model(
            sysc["dino"].get("model", "dinov2_vitb14"),
            smaller_edge_size=int(sysc["dino"]["smaller_edge_size"]),
        ),
    )

    arms = [("gate-K1", 1), (f"multihyp-K{args.k}", args.k)]
    if args.skip_k1:
        arms = arms[1:]
    results = {}
    for name, k in arms:
        c = copy.deepcopy(cfg)
        c["system"]["num_initializations"] = k
        c["system"]["hypotheses"]["tournament_iters"] = args.tournament
        if args.propagate_rounds is not None:
            c["system"]["hypotheses"]["propagate_rounds"] = args.propagate_rounds
        if args.smooth_weight is not None:
            c["system"]["hypotheses"]["smooth_weight"] = args.smooth_weight
        t0 = time.time()
        res = PL.track_sequence(c, seq, ann, mesh, dino_params=dparams, dino_cfg=dcfg)
        dt = time.time() - t0
        iou = float(res.history["iou_object"][-1])
        init_err = G.rotation_angle_difference(res.init_rotations_row, gt_row)
        joint_err = G.rotation_angle_difference(res.rotations_row, gt_row)
        results[name] = dict(
            iou=iou, wall=dt,
            init_rot_err=np.asarray(init_err),
            joint_rot_err=np.asarray(joint_err),
        )
        print(
            f"[{name}] wall {dt:.1f}s  joint IoU {iou:.4f}  "
            f"rot err after refine: mean {np.mean(np.asarray(init_err)):.1f} deg"
            f"  after joint: mean {np.mean(np.asarray(joint_err)):.1f} deg",
            flush=True,
        )
        print(
            f"[{name}] per-frame joint rot err (deg): "
            f"{np.round(np.asarray(joint_err), 1).tolist()}",
            flush=True,
        )

    if args.skip_k1:
        return
    a = results["gate-K1"]
    b = results[f"multihyp-K{args.k}"]
    print("\n=== multi-hypothesis ablation summary (record in BASELINE.md) ===")
    print(f"config: {args.config}  K={args.k} tournament={args.tournament}")
    print(f"joint IoU: K=1 {a['iou']:.4f} -> K={args.k} {b['iou']:.4f}")
    print(
        f"mean joint rot err: K=1 {np.mean(a['joint_rot_err']):.1f} deg -> "
        f"K={args.k} {np.mean(b['joint_rot_err']):.1f} deg"
    )
    print(
        f"wall: K=1 {a['wall']:.1f}s -> K={args.k} {b['wall']:.1f}s "
        f"({b['wall'] / max(a['wall'], 1e-9):.2f}x)"
    )
    print(
        "per-frame joint rot err (deg): K=1      "
        f"{np.round(a['joint_rot_err'], 1).tolist()}\n"
        f"                              K={args.k}      "
        f"{np.round(b['joint_rot_err'], 1).tolist()}"
    )


if __name__ == "__main__":
    main()
