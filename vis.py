#!/usr/bin/env python
"""Overlay-render saved poses (reference: ObjTracker/vis.py).

    python vis.py --config_path exps/<seq>/<exp>/config.yaml

Reads per-frame npz poses from exps/<seq>/<exp>/obj_infos/ and writes
composited jpgs to exps/<seq>/<exp>/render_res/.
"""
import argparse
import glob
import os

import numpy as np
from PIL import Image

from dynhor_tpu.io.config import load_config
from dynhor_tpu.utils import geometry as G
from dynhor_tpu.utils.objio import load_obj
from dynhor_tpu.visualizer import Visualizer

import jax.numpy as jnp


def main() -> None:
    from dynhor_tpu.utils.compcache import enable_persistent_cache
    enable_persistent_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", type=str, required=True)
    parser.add_argument("--exps_root", type=str, default="exps")
    args = parser.parse_args()
    config = load_config(args.config_path)

    dataroot = config["data_info"]["dataroot"]
    paths = sorted(glob.glob(os.path.join(dataroot, "rgb", "*.jpg")))
    if not paths:
        paths = sorted(glob.glob(os.path.join(dataroot, "rgb", "*.png")))
    sample_folder = os.path.join(
        args.exps_root, str(config["seq_name"]), str(config["exp_name"])
    )
    assert os.path.exists(sample_folder), "Please run the pose optimizer first"
    print(len(paths))

    mesh = load_obj(config["data_info"]["obj_path"])
    # vis.py:28-29: always centroid-normalize (even if the run config said
    # otherwise — reference quirk preserved).
    verts = np.asarray(G.center_and_normalize_verts(jnp.asarray(mesh.verts)))

    first = np.asarray(Image.open(paths[0]))
    height, width = first.shape[:2]
    focal = 1.2 * min(height, width)
    vis = Visualizer((height, width))
    out_dir = os.path.join(sample_folder, "render_res")
    os.makedirs(out_dir, exist_ok=True)

    for p in paths:
        fid = os.path.basename(p)[:-4]
        npz_path = os.path.join(sample_folder, "obj_infos", f"{fid}.npz")
        if not os.path.exists(npz_path):
            continue
        info = np.load(npz_path)
        R, T = info["R"], info["T"]
        scale = float(info["obj_scale"]) if "obj_scale" in info.files else 1.0
        verts_cam = (scale * verts) @ R.T + T
        img = np.asarray(Image.open(p).convert("RGB")).astype(np.float32) / 255.0
        out = vis.draw_mesh(
            img, verts_cam, mesh.faces, (focal, focal, width // 2, height // 2)
        )
        Image.fromarray((np.clip(out, 0, 1) * 255).astype(np.uint8)).save(
            os.path.join(out_dir, f"{fid}.jpg")
        )


if __name__ == "__main__":
    main()
