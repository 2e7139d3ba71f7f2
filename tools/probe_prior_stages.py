#!/usr/bin/env python
"""Phase-level timing of the two-stage prior retrieval (VERDICT r2 #2).

Splits the 6,000-view prior-scoring wall clock into: cap counting,
stage-A prescreen (further split into raster+crop vs DINO+cosine), and
stage-B full-res rescore — so optimization targets the measured
bottleneck rather than the assumed one.

    python tools/probe_prior_stages.py --config configs/custom_shoes.yaml
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    from dynhor_tpu.utils.compcache import enable_persistent_cache

    enable_persistent_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/custom_shoes.yaml")
    ap.add_argument("--views", type=int, default=0, help="override num_views")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dynhor_tpu.io.config import load_config
    from dynhor_tpu.models import dino as dino_mod
    from dynhor_tpu.tracker import pipeline as PL
    from dynhor_tpu.tracker import priors as P

    cfg = load_config(args.config)
    sysc = cfg["system"]
    seq = PL.load_sequence(cfg["data_info"]["dataroot"])
    ann = PL.process_frames(seq, int(sysc["crop_size"]), float(sysc["bbox_expansion"]))
    mesh = PL.load_mesh(cfg["data_info"]["obj_path"], bool(cfg["data_info"]["normalize_mesh"]))
    dparams, dcfg = dino_mod.load_params(
        sysc["dino"].get("checkpoint"),
        dino_mod.DinoConfig(smaller_edge_size=int(sysc["dino"]["smaller_edge_size"])),
    )
    ma = PL._mesh_arrays(mesh)
    pc = sysc["prior"]
    s = int(sysc["crop_size"])
    prior_cfg = P.PriorConfig(
        num_views=args.views or int(pc["num_views"]),
        render_h=int(pc["render_hw"][0]),
        render_w=int(pc["render_hw"][1]),
        distance_scale=float(pc["distance_scale"]),
        crop_size=s,
        bbox_expansion=float(sysc["bbox_expansion"]),
        view_chunk=int(pc["view_chunk"]),
        face_chunk=int(sysc["face_chunk"]),
        max_faces_per_tile=int(pc.get("max_faces_per_tile", 1280)),
    )
    key = jax.random.PRNGKey(int(pc.get("seed", 0)))
    view_rots = P.prior_view_rotations(key, prior_cfg)
    gt_feats, cos_masks = P.frame_gt_features(
        dparams, dcfg, jnp.asarray(ann.crop_images), jnp.asarray(ann.target_masks)
    )
    jax.block_until_ready(gt_feats)
    radius, center = P.mesh_radius_center(ma.verts)
    norm_r = float(P.mesh_norm_radius(ma.verts))
    window = P.compute_window(prior_cfg, norm_r, float(prior_cfg.distance_scale * radius))
    ps = pc.get("prescreen") or {}
    edge, scale, topk = int(ps.get("edge", 224)), int(ps.get("scale", 2)), int(ps.get("topk", 48))
    host_batch = int(pc.get("host_batch", 1000))
    n = int(view_rots.shape[0])

    def clock(name, fn):
        t0 = time.time()
        out = fn()
        jax.block_until_ready(out)
        dt = time.time() - t0
        print(f"{name:42s} {dt:7.1f} s", flush=True)
        return out, dt

    # ---- stage A config (mirror prior_scores_two_stage) ----
    cfg_lo = dataclasses.replace(
        prior_cfg,
        render_h=prior_cfg.render_h // scale,
        render_w=prior_cfg.render_w // scale,
        crop_size=prior_cfg.crop_size // scale,
        view_chunk=prior_cfg.view_chunk * scale,
    )
    dcfg_lo = dataclasses.replace(dcfg, smaller_edge_size=edge)
    window_lo = P.compute_window(cfg_lo, norm_r, float(cfg_lo.distance_scale * radius))
    print(f"[{n} views; window {window} -> prescreen {window_lo}; "
          f"crop {prior_cfg.crop_size} -> {cfg_lo.crop_size}; DINO edge "
          f"{dcfg.smaller_edge_size} -> {edge}]")

    (gt_lo, cm_lo), _ = clock("frame features (prescreen res)", lambda: P.frame_gt_features(
        dparams, dcfg_lo, jnp.asarray(ann.crop_images), jnp.asarray(ann.target_masks),
        prior_cfg.dino_dtype,
    ))

    _, t_cap = clock("required_prior_cap (full window)", lambda: jnp.zeros(()) * P.required_prior_cap(
        ma.verts, ma.faces, view_rots, prior_cfg, window,
        float(prior_cfg.distance_scale * radius), center,
    ))

    scores_lo, t_a = clock("stage A: prescreen ALL views", lambda: P.prior_scores_batched(
        dparams, dcfg_lo, ma.verts, ma.faces, ma.face_uvs, ma.texture,
        view_rots, gt_lo, cm_lo, cfg_lo, window_lo, host_batch,
    ))

    # stage A split: raster+crop only (scores discarded, DINO skipped) — by
    # timing one slice's render+crop under the same chunking.
    dparams16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), dparams)
    K_full = P.prior_camera(cfg_lo)
    off = jnp.array([[0, 0, (cfg_lo.render_w - window_lo) / 2.0],
                     [0, 0, (cfg_lo.render_h - window_lo) / 2.0],
                     [0, 0, 0]], jnp.float32)
    K_win = K_full - off
    distance = float(prior_cfg.distance_scale * radius)

    cap_lo = P.required_prior_cap(
        ma.verts, ma.faces, view_rots, cfg_lo, window_lo, distance, center)
    cfg_lo_c = dataclasses.replace(cfg_lo, max_faces_per_tile=cap_lo)

    def render_only(Rs):
        chunk = cfg_lo_c.view_chunk
        Rs_ = Rs.reshape(-1, chunk, 3, 3)

        def score_chunk(R_chunk):
            t = jnp.concatenate(
                [jnp.zeros((chunk, 2)), jnp.full((chunk, 1), distance)], axis=1
            ) - jnp.einsum("nij,j->ni", R_chunk, jnp.asarray(center))

            def one(Rc, tc):
                rgba, _, ov = P._render_one_view(
                    ma.verts, ma.faces, ma.face_uvs, ma.texture, Rc, tc,
                    K_win, window_lo, cfg_lo_c.face_chunk,
                    cfg_lo_c.max_faces_per_tile,
                )
                crop_img, _, _ = P._crop_view(rgba, cfg_lo_c.crop_size, cfg_lo_c.bbox_expansion)
                return crop_img

            return jax.vmap(one)(R_chunk, t).sum(axis=(1, 2, 3))

        return jax.lax.map(score_chunk, Rs_)

    ro = jax.jit(render_only)
    one_kilo = view_rots[:host_batch]
    _ = jax.block_until_ready(ro(one_kilo))  # compile
    t0 = time.time()
    _ = jax.block_until_ready(ro(one_kilo))
    t_render = (time.time() - t0) * (n / host_batch)
    print(f"{'  stage A split: raster+crop only':42s} {t_render:7.1f} s (extrapolated)")
    print(f"{'  stage A split: DINO+cosine (residual)':42s} {t_a - t_render:7.1f} s")

    # ---- stage B ----
    k = min(topk, n)
    top_idx = np.argpartition(-np.asarray(scores_lo), k - 1, axis=1)[:, :k]
    idx = np.unique(top_idx.reshape(-1))
    print(f"[stage B rescores {idx.size} unique views]")
    _, t_b = clock("stage B: full-res rescore", lambda: P.prior_scores_batched(
        dparams, dcfg, ma.verts, ma.faces, ma.face_uvs, ma.texture,
        view_rots[jnp.asarray(idx)], gt_feats, cos_masks, prior_cfg, window,
        host_batch,
    ))
    print(f"{'TOTAL (cap + A + B)':42s} {t_cap + t_a + t_b:7.1f} s")


if __name__ == "__main__":
    main()
