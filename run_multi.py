#!/usr/bin/env python
"""Multi-sequence batched pose tracking (BASELINE config #5: several videos
tracked together, their frames pooled into one sharded refine).

    python run_multi.py --config_paths configs/custom_shoes.yaml configs/custom_kettle.yaml

Per sequence: host preprocessing, prior scoring and gating run as usual;
then ALL sequences' frames refine in ONE vmapped/sharded Adam loop
(dynhor_tpu/parallel/multiseq.py — per-frame padded meshes); the joint
temporal stage and artifact export run per sequence.
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def main() -> None:
    from dynhor_tpu.utils.compcache import enable_persistent_cache
    enable_persistent_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_paths", type=str, nargs="+", required=True)
    parser.add_argument("--exps_root", type=str, default="exps")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from dynhor_tpu.io.artifacts import Board, copy_config, save_pose_npzs
    from dynhor_tpu.io.config import experiment_dir, load_config
    from dynhor_tpu.models import dino as dino_mod
    from dynhor_tpu.parallel import multiseq as MS
    from dynhor_tpu.tracker import jointopt as J
    from dynhor_tpu.tracker import pipeline as PL
    from dynhor_tpu.tracker import priors as P
    from dynhor_tpu.tracker import refine as RF
    from dynhor_tpu.tracker import selection as S
    from dynhor_tpu.utils import camera as cam
    from dynhor_tpu.utils import geometry as G

    configs = [load_config(p) for p in args.config_paths]
    base = configs[0]["system"]
    dino_params, dino_cfg = dino_mod.load_params(
        base["dino"].get("checkpoint"),
        dino_mod.DinoConfig(smaller_edge_size=int(base["dino"]["smaller_edge_size"])),
    )

    # ---- per-sequence preprocessing + prior scoring + gating ----
    seqs, anns, meshes, targets_list, rot_inits, trans_inits, K_fulls = (
        [], [], [], [], [], [], []
    )
    for config in configs:
        sysc = config["system"]
        s = int(sysc["crop_size"])
        seq = PL.load_sequence(config["data_info"]["dataroot"])
        ann = PL.process_frames(seq, s, float(sysc["bbox_expansion"]))
        mesh = PL.load_mesh(
            config["data_info"]["obj_path"],
            bool(config["data_info"].get("normalize_mesh", True)),
        )
        f_frames, h, w = seq.obj_masks.shape
        K_full = np.asarray(cam.intrinsics_from_image(h, w, float(sysc["focal_factor"])))
        ma = PL._mesh_arrays(mesh)

        pc = sysc["prior"]
        prior_cfg = P.PriorConfig(
            num_views=int(pc["num_views"]),
            distance_scale=float(pc["distance_scale"]),
            crop_size=s,
            bbox_expansion=float(sysc["bbox_expansion"]),
            view_chunk=int(pc["view_chunk"]),
            face_chunk=int(sysc["face_chunk"]),
        )
        view_rots = P.prior_view_rotations(
            jax.random.PRNGKey(int(pc.get("seed", 0))), prior_cfg
        )
        priors_row = jnp.swapaxes(view_rots, -1, -2)
        gt_feats, cos_masks = P.frame_gt_features(
            dino_params, dino_cfg, jnp.asarray(ann.crop_images),
            jnp.asarray(ann.target_masks),
        )
        radius, _ = P.mesh_radius_center(ma.verts)  # camera-distance radius
        window = P.compute_window(
            prior_cfg, float(P.mesh_norm_radius(ma.verts)),
            float(prior_cfg.distance_scale * radius),
        )
        scores = P.prior_scores_batched(
            dino_params, dino_cfg, ma.verts, ma.faces, ma.face_uvs, ma.texture,
            view_rots, gt_feats, cos_masks, prior_cfg, window,
            host_batch=int(pc.get("host_batch", 1000)),
        )
        gate = S.gate_all_frames(scores, priors_row)
        pts = jnp.einsum("vj,bjk->bvk", ma.verts, gate.rotation_init)
        trans0 = cam.tco_init_from_boxes_autodepth(
            jnp.asarray(ann.bbox_xywh), pts,
            jnp.broadcast_to(jnp.asarray(K_full), (f_frames, 3, 3)),
        )
        K_rois = cam.get_K_crop_resize(
            jnp.broadcast_to(jnp.asarray(K_full), (f_frames, 3, 3)),
            jnp.asarray(ann.square_xyxy), s,
        )
        seqs.append(seq)
        anns.append(ann)
        meshes.append(mesh)
        targets_list.append(
            RF.FrameTargets(jnp.asarray(ann.target_masks), gt_feats, K_rois)
        )
        rot_inits.append(gate.rotation_init)
        trans_inits.append(trans0)
        K_fulls.append(K_full)
        print(f"prepared {config['seq_name']}: {f_frames} frames")

    # ---- pooled multi-sequence refine ----
    batch = MS.build_batch(meshes, targets_list)
    rot_all = jnp.concatenate(rot_inits)
    trans_all = jnp.concatenate(trans_inits)
    cfg0 = configs[0]["system"]

    # Counted per-tile face cap over ALL pooled frames at their init poses
    # (fixed caps silently drop faces at edge-on poses; tracker/pipeline
    # does the same for single sequences).
    from dynhor_tpu.ops.rasterize import project_perspective
    from dynhor_tpu.ops.rasterize_tiled import max_active_tiles_load, max_tile_load

    s0 = int(cfg0["crop_size"])

    sig0 = float(cfg0["sigma"])

    def _load_one(verts_i, faces_i, R_i, t_i, K_i):
        vp = project_perspective(verts_i @ R_i + jnp.reshape(t_i, (1, 3)), K_i)
        margin = 6.0 * sig0 + 1.0
        return (
            max_tile_load(vp, faces_i, (s0, s0), margin=margin),
            max_active_tiles_load(vp, faces_i, (s0, s0), margin=margin),
        )

    loads, actives = jax.vmap(_load_one)(
        batch.mesh_verts, batch.mesh_faces, rot_all, trans_all,
        batch.targets.K_rois,
    )
    worst = int(loads.max())
    cap = max(256, min(-(-int(worst * 1.5) // 128) * 128, int(batch.mesh_faces.shape[1])))
    t_total = (-(-s0 // 16)) ** 2
    act = max(8, min(-(-int(int(actives.max()) * 1.5) // 8) * 8, t_total))
    act_cap = act if act < t_total else None
    print(f"pooled refine: per-tile face cap {cap}, active-tile cap {act_cap} (counted)")

    refine_cfg = RF.RefineConfig(
        num_iterations=int(cfg0["init_num_iterations"]),
        lr=float(cfg0["init_lr"]),
        crop_size=s0,
        sigma=float(cfg0["sigma"]),
        face_chunk=int(cfg0["face_chunk"]),
        mode="fine",
        max_faces_per_tile=cap,
        max_active_tiles=act_cap,
        offscreen_weight=float(cfg0["offscreen_weight"]),
    )
    res = MS.refine_poses_multi(
        batch, rot_all, trans_all, dino_params, dino_cfg, refine_cfg
    )
    print(f"pooled refine over {rot_all.shape[0]} frames from {len(configs)} sequences done")

    # ---- per-sequence joint + export ----
    off = 0
    for config, seq, ann, mesh, targets, K_full in zip(
        configs, seqs, anns, meshes, targets_list, K_fulls
    ):
        sysc = config["system"]
        n = len(seq.frame_ids)
        rot6d = res.rot6d[off : off + n]
        trans = res.translations[off : off + n]
        off += n
        joint_cfg = J.JointConfig(
            num_iterations=int(sysc["joint_num_iterations"]),
            lr=float(sysc["joint_lr"]),
            lw_sil_obj=float(sysc["loss"]["lw_sil_obj"]),
            lw_smooth_obj=float(sysc["loss"]["lw_smooth_obj"]),
            crop_size=int(sysc["crop_size"]),
            sigma=float(sysc["sigma"]),
            face_chunk=int(sysc["face_chunk"]),
            max_faces_per_tile=cap,
            max_active_tiles=act_cap,
        )
        ma = PL._mesh_arrays(mesh)
        jres = J.joint_optimize(
            ma.verts, ma.faces, G.rot6d_to_matrix(rot6d), trans,
            targets.K_rois, jnp.asarray(ann.target_masks), joint_cfg,
        )
        exp_dir = experiment_dir(config, args.exps_root)
        os.makedirs(exp_dir, exist_ok=True)
        if config.get("_config_path"):
            copy_config(exp_dir, config["_config_path"])
        board = Board(exp_dir)
        board.add_history({k: np.asarray(v) for k, v in jres.history.items()})
        save_pose_npzs(
            exp_dir, seq.frame_ids,
            np.asarray(G.rot6d_to_matrix(jres.rot6d)),
            np.asarray(jres.translations), K_full,
        )
        board.close()
        print(
            f"{config['seq_name']}: joint iou {float(jres.history['iou_object'][-1]):.4f}"
            f" -> {exp_dir}/obj_infos"
        )


if __name__ == "__main__":
    main()
