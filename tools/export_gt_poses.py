#!/usr/bin/env python
"""Export gt_poses.npz to the stage-1 obj_infos artifact layout.

Writes exps/<seq>/gt/obj_infos/NNNN.npz ({R, T, K} per frame — the
run.py:171-179 schema the reconstruction stage consumes), so NeuS quality
A/Bs can train from ground-truth poses (configs/neus_shoes_fast.yaml's
``poses_dir: exps/custom_shoes/gt/obj_infos``) with pose error factored
out of the Chamfer/PSNR comparison.

    python tools/export_gt_poses.py --data data/custom_shoes \
        [--out exps/custom_shoes/gt/obj_infos]
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True, help="sequence dir with gt_poses.npz")
    ap.add_argument("--out", default=None,
                    help="default exps/<seq>/gt/obj_infos")
    args = ap.parse_args()

    gt = np.load(os.path.join(args.data, "gt_poses.npz"))
    seq = os.path.basename(os.path.normpath(args.data))
    out = args.out or os.path.join("exps", seq, "gt", "obj_infos")
    os.makedirs(out, exist_ok=True)
    n = gt["R"].shape[0]
    for i in range(n):
        np.savez(
            os.path.join(out, f"{i:04d}.npz"),
            R=gt["R"][i].astype(np.float32),
            T=gt["T"][i].astype(np.float32),
            K=gt["K"].astype(np.float32),
        )
    print(f"wrote {n} GT pose npz files -> {out}")


if __name__ == "__main__":
    main()
