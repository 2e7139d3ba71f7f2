"""Fine-loss DINO-edge ablation (VERDICT r4 next #7).

The reference hard-codes the DINO input edge at 518 px -> 37^2 tokens
(dino.py:5); the fine refine step is ViT-bound (117 of 182 ms at 8
frames, BASELINE.md round-4 breakdown) and ViT cost scales ~quadratically
with the token count.  The two-stage prescreen already proved 112-224
edges preserve VIEW SELECTION exactly; this ablation asks whether the
FINE LOSS (gradients through the ViT each Adam step) also tolerates a
smaller edge — A/B'ing pose quality (joint IoU, rotation error vs GT)
across edges on a sequence with synthetic GT.

    python tools/ablate_fine_edge.py --config configs/custom_shoes.yaml \
        [--edges 518 378 252] [--init-iters 50] [--joint-iters 100] \
        [--views 500]

Note: the edge applies to BOTH the frame-feature extraction and the
fine-loss render branch (they must share one token grid for the masked
cosine), exactly as in the reference.
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
    ap.add_argument("--edges", nargs="+", type=int, default=[518, 378, 252])
    ap.add_argument("--init-iters", type=int, default=50)
    ap.add_argument("--joint-iters", type=int, default=100)
    ap.add_argument("--views", type=int, default=500)
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

    results = {}
    for edge in args.edges:
        c = copy.deepcopy(cfg)
        c["system"]["dino"]["smaller_edge_size"] = int(edge)
        dparams, dcfg = dino_mod.load_params(
            c["system"]["dino"].get("checkpoint"),
            dino_mod.config_for_model(
                c["system"]["dino"].get("model", "dinov2_vitb14"),
                smaller_edge_size=int(edge),
            ),
        )
        t0 = time.time()
        res = PL.track_sequence(c, seq, ann, mesh, dino_params=dparams, dino_cfg=dcfg)
        dt = time.time() - t0
        iou = float(res.history["iou_object"][-1])
        init_err = np.asarray(
            G.rotation_angle_difference(res.init_rotations_row, gt_row)
        )
        joint_err = np.asarray(
            G.rotation_angle_difference(res.rotations_row, gt_row)
        )
        results[edge] = dict(iou=iou, wall=dt, init=init_err, joint=joint_err)
        print(
            f"[edge {edge} -> {dcfg.feat_size}^2 tokens] wall {dt:.1f}s  "
            f"joint IoU {iou:.4f}  rot err after refine {init_err.mean():.1f}"
            f" deg / after joint {joint_err.mean():.1f} deg",
            flush=True,
        )

    print("\n=== fine-loss DINO-edge ablation (record in BASELINE.md) ===")
    print(f"config: {args.config}")
    for edge, r in results.items():
        print(
            f"edge {edge:4d}: joint IoU {r['iou']:.4f}  "
            f"rot err refine/joint {r['init'].mean():6.1f} / "
            f"{r['joint'].mean():6.1f} deg  wall {r['wall']:.1f}s"
        )


if __name__ == "__main__":
    main()
