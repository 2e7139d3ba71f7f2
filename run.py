#!/usr/bin/env python
"""Pose-estimation entry point (reference: ObjTracker/run.py).

    python run.py --config_path configs/custom_shoes.yaml

Loads the sequence + template mesh, renders/scores prior views, runs the
vmapped per-frame refinement and the joint temporal optimization, and
saves per-frame {R, T, K} npz files under exps/<seq>/<exp>/obj_infos/.
"""
import argparse

from dynhor_tpu.io.config import load_config
from dynhor_tpu.tracker.pipeline import run_from_config


def main() -> None:
    from dynhor_tpu.utils.compcache import enable_persistent_cache
    enable_persistent_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", type=str, required=True)
    parser.add_argument("--exps_root", type=str, default="exps")
    args = parser.parse_args()
    config = load_config(args.config_path)
    result = run_from_config(config, exps_root=args.exps_root)
    print(
        f"tracked {len(result.rotations_row)} frames; "
        f"final joint loss {result.history['loss'][-1]:.4f}, "
        f"iou {result.history['iou_object'][-1]:.4f}"
    )


if __name__ == "__main__":
    main()
