#!/usr/bin/env python
"""Evaluate tracked poses against ground truth.

    python tools/eval_poses.py --exp exps/custom_shoes/pred --gt data/custom_shoes/gt_poses.npz

Prints per-frame and summary rotation (geodesic deg) / translation errors.
GT schema: gt_poses.npz with R (F,3,3 o2c column), T (F,3) — written by
tools/make_demo_data.py.
"""
from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--exp", required=True, help="exps/<seq>/<exp> directory")
    parser.add_argument("--gt", required=True, help="gt_poses.npz")
    args = parser.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from dynhor_tpu.utils.geometry import rotation_angle_difference

    gt = np.load(args.gt)
    npzs = sorted(glob.glob(os.path.join(args.exp, "obj_infos", "*.npz")))
    if not npzs:
        raise SystemExit(f"no poses under {args.exp}/obj_infos")
    rot_errs, t_errs = [], []
    for i, path in enumerate(npzs):
        d = np.load(path)
        ang = float(
            rotation_angle_difference(
                jnp.asarray(d["R"])[None], jnp.asarray(gt["R"][i])[None]
            )[0]
        )
        terr = float(np.linalg.norm(d["T"].reshape(3) - gt["T"][i]))
        rot_errs.append(ang)
        t_errs.append(terr)
        print(f"{os.path.basename(path)[:-4]}: rot {ang:6.2f} deg  trans {terr:.4f}")
    rot_errs, t_errs = np.asarray(rot_errs), np.asarray(t_errs)
    print(
        f"\nsummary over {len(rot_errs)} frames: "
        f"rot mean {rot_errs.mean():.2f} / median {np.median(rot_errs):.2f} deg; "
        f"trans mean {t_errs.mean():.4f} / median {np.median(t_errs):.4f}"
    )


if __name__ == "__main__":
    main()
