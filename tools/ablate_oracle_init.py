"""Oracle-init ablation: DINO-gated view selection vs GT-nearest prior view.

VERDICT r3 next #3: kettle 0.69 / shoes2 0.73 joint IoU were ATTRIBUTED to
the random-weight DINO init (no real DINOv2 checkpoint in this image) but
never demonstrated.  On synthetic sequences the GT pose is known, so the
ablation is cheap: run refine+joint twice from (a) the DINO gate's init
and (b) the prior view geodesically nearest to the GT rotation
(system.oracle_init, tracker/pipeline.py).  If (b) recovers ~0.95+ IoU,
the view-selection miss explains the gap (refine+joint are healthy); if
not, the refine/joint stages have a robustness bug independent of DINO.

    python tools/ablate_oracle_init.py --config configs/custom_kettle.yaml \
        [--init-iters 50] [--views 500]
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
    ap.add_argument("--init-iters", type=int, default=None,
                    help="override system.init_num_iterations")
    ap.add_argument("--joint-iters", type=int, default=None)
    ap.add_argument("--views", type=int, default=None,
                    help="override system.prior.num_views")
    args = ap.parse_args()

    import numpy as np

    from dynhor_tpu.io.config import load_config
    from dynhor_tpu.models import dino as dino_mod
    from dynhor_tpu.tracker import pipeline as PL
    from dynhor_tpu.utils import geometry as G

    cfg = load_config(args.config)
    sysc = cfg["system"]
    if args.init_iters is not None:
        sysc["init_num_iterations"] = args.init_iters
    if args.joint_iters is not None:
        sysc["joint_num_iterations"] = args.joint_iters
    if args.views is not None:
        sysc["prior"]["num_views"] = args.views
    dataroot = cfg["data_info"]["dataroot"]
    gt_path = os.path.join(dataroot, "gt_poses.npz")
    if not os.path.exists(gt_path):
        sys.exit(f"no {gt_path} — the oracle ablation needs synthetic GT")
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

    results = {}
    for name, oracle in [("dino-gate", False), ("oracle-init", True)]:
        c = copy.deepcopy(cfg)
        c["system"]["oracle_init"] = {"enabled": oracle, "gt_poses": gt_path}
        t0 = time.time()
        res = PL.track_sequence(c, seq, ann, mesh, dino_params=dparams, dino_cfg=dcfg)
        dt = time.time() - t0
        iou = float(res.history["iou_object"][-1])
        init_err = G.rotation_angle_difference(
            res.init_rotations_row, gt_row
        )
        joint_err = G.rotation_angle_difference(res.rotations_row, gt_row)
        results[name] = dict(
            iou=iou,
            init_rot_err=np.asarray(init_err),
            joint_rot_err=np.asarray(joint_err),
        )
        print(
            f"[{name}] wall {dt:.1f}s  joint IoU {iou:.4f}  "
            f"rot err after refine: mean {np.mean(np.asarray(init_err)):.1f} deg"
            f"  after joint: mean {np.mean(np.asarray(joint_err)):.1f} deg",
            flush=True,
        )

    a, b = results["dino-gate"], results["oracle-init"]
    print("\n=== ablation summary (record in BASELINE.md) ===")
    print(f"config: {args.config}")
    print(f"joint IoU: dino-gate {a['iou']:.4f} -> oracle {b['iou']:.4f}")
    print(
        "per-frame joint rot err (deg): dino-gate "
        f"{np.round(a['joint_rot_err'], 1).tolist()}\n"
        "                              oracle    "
        f"{np.round(b['joint_rot_err'], 1).tolist()}"
    )
    if b["iou"] >= 0.9:
        print(
            "CONCLUSION: oracle init recovers — the gap is the view-selection"
            " miss (random-weight DINO); refine+joint are healthy."
        )
    else:
        print(
            "CONCLUSION: oracle init does NOT recover — refine/joint have a"
            " robustness issue on this sequence independent of DINO."
        )


if __name__ == "__main__":
    main()
