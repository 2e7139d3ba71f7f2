#!/usr/bin/env python
"""SDF reconstruction entry point (capability target; the reference's NeuS
stage is unreleased — README.md:10,55-58 — so this is designed from the
published NeuS / instant-nsr-pl recipes, consuming stage-1 pose npzs).

    python recon.py --config_path configs/neus_shoes.yaml

Trains the SDF field (positional-encoding NeuS or hash-grid fast path per
``system.recon.encoder``), checkpoints with orbax, extracts a mesh with
marching tetrahedra, and reports Chamfer distance if a ground-truth mesh
is configured.
"""
import argparse
import os

import numpy as np

from dynhor_tpu.io.artifacts import Board
from dynhor_tpu.io.config import experiment_dir, load_config


def main() -> None:
    from dynhor_tpu.utils.compcache import enable_persistent_cache
    enable_persistent_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", type=str, required=True)
    parser.add_argument("--exps_root", type=str, default="exps")
    parser.add_argument("--no_resume", action="store_true")
    args = parser.parse_args()
    config = load_config(args.config_path)
    rc = config["system"].get("recon", {})

    import jax.numpy as jnp

    from dynhor_tpu.neus import data as ND
    from dynhor_tpu.neus import extract as EX
    from dynhor_tpu.neus import fields as F
    from dynhor_tpu.neus import rendering as R
    from dynhor_tpu.neus import trainer as T

    exp_dir = experiment_dir(config, args.exps_root)
    poses_dir = rc.get("poses_dir") or os.path.join(exp_dir, "obj_infos")
    downscale = int(rc.get("downscale", 2))
    data, frame_ids = ND.load_recon_data(
        config["data_info"]["dataroot"], poses_dir, downscale
    )
    corr = ND.load_correspondences(
        config["data_info"]["dataroot"], frame_ids, downscale
    )
    print(
        f"recon: {len(frame_ids)} frames at {data.images.shape[2]}x{data.images.shape[1]}"
        f", normals={'yes' if data.normals is not None else 'no'}"
        f", correspondences={'yes' if corr is not None else 'no'}"
    )

    encoder = str(rc.get("encoder", "pe"))
    if encoder == "hash":
        # The gather-bound hash encoder runs 40-70x slower than the
        # production pe+occgrid path on TPU (0.5-0.8K vs 33.5K rays/s —
        # BASELINE.md encoder matrix); it ships for instant-nsr-pl parity,
        # not speed.  See the design note at dynhor_tpu/neus/fields.py:8.
        print(
            "WARNING: system.recon.encoder='hash' is the PARITY path, not the"
            " fast path on TPU (~0.5-0.8K rays/s vs ~33.5K for encoder='pe'"
            " with the occgrid sampler); see dynhor_tpu/neus/fields.py design"
            " note",
            flush=True,
        )
    sdf_cfg = F.SDFConfig(encoder=encoder)
    rcfg = R.RenderConfig(
        n_coarse=int(rc.get("n_coarse", 64)),
        n_importance=int(rc.get("n_importance", 64)),
        up_sample_steps=int(rc.get("up_sample_steps", 4)),
        sampler=str(rc.get("sampler", "neus")),
        n_candidates=int(rc.get("n_candidates", 192)),
        n_occ_samples=int(rc.get("n_occ_samples", 64)),
        occ_res=int(rc.get("occ_res", 64)),
        n_shade=int(rc.get("n_shade", 16)),
    )
    tcfg = T.TrainConfig(
        num_steps=int(rc.get("num_steps", 20000)),
        batch_rays=int(rc.get("batch_rays", 1024)),
        lr=float(rc.get("lr", 5e-4)),
        lw_rgb=float(rc.get("lw_rgb", 1.0)),
        lw_mask=float(rc.get("lw_mask", 0.1)),
        lw_eikonal=float(rc.get("lw_eikonal", 0.1)),
        lw_normal=float(rc.get("lw_normal", 0.1)),
        lw_corr=float(rc.get("lw_corr", 0.0 if corr is None else 0.01)),
        log_every=int(rc.get("log_every", 500)),
        checkpoint_every=int(rc.get("checkpoint_every", 5000)),
        grid_lr_mult=float(rc.get("grid_lr_mult", 20.0)),
    )

    board = Board(exp_dir)
    ckpt_dir = os.path.join(exp_dir, "recon", "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)
    state, history = T.train(
        data, sdf_cfg, rcfg, tcfg, corr=corr, board=board,
        checkpoint_dir=ckpt_dir, resume=not args.no_resume,
    )

    def sdf_eval(pts):
        return F.sdf_only(state.params, jnp.asarray(pts), sdf_cfg)

    resolution = int(rc.get("mesh_resolution", 192))
    verts, faces = EX.extract_mesh_from_field(sdf_eval, resolution, bound=0.7)
    mesh_path = os.path.join(exp_dir, "recon", "mesh.obj")
    EX.save_obj(mesh_path, verts, faces)
    print(f"extracted mesh: {len(verts)} verts / {len(faces)} faces -> {mesh_path}")

    gt_mesh_path = rc.get("gt_mesh")
    if gt_mesh_path and os.path.exists(gt_mesh_path):
        from dynhor_tpu.utils import geometry as G
        from dynhor_tpu.utils.objio import load_obj

        gt = load_obj(gt_mesh_path)
        gt_verts = np.asarray(G.center_and_normalize_verts(jnp.asarray(gt.verts)))
        cd = EX.chamfer_distance(verts, faces, gt_verts, gt.faces)
        print(f"chamfer vs {gt_mesh_path}: {cd:.5f}")
        board.add_scalar("neus/chamfer", cd, int(state.step))
    if history.get("psnr"):
        print(f"final psnr {history['psnr'][-1]:.2f} dB")
    board.close()


if __name__ == "__main__":
    main()
