#!/usr/bin/env python
"""Component-level timing of the fine refine step on the current backend.

Breaks the 8-frame fine Adam step into its pieces so optimization work
targets the real bottleneck (VERDICT round 1: ~80% of the step was outside
the ViT).  Each timing jits the piece fwd+bwd (grad w.r.t. pose params
where meaningful) and reports steady-state ms per 8-frame batch.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

FRAMES = 8
CROP = 256


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000.0


def main():
    from dynhor_tpu.models import dino as D
    from dynhor_tpu.ops import rasterize as rz
    from dynhor_tpu.ops.rasterize_tiled import bin_faces, rasterize_tiled
    from dynhor_tpu.ops.raster_pallas import rasterize_silhouette_pallas
    from dynhor_tpu.ops.silhouette_pallas import soft_silhouette_pallas
    from dynhor_tpu.ops.resize import resize_bicubic_align_corners
    from dynhor_tpu.ops.shading import fine_lights, phong_shade
    from dynhor_tpu.tracker import refine as RF
    from dynhor_tpu.utils import geometry as G
    from dynhor_tpu.utils.objio import load_obj

    mesh_data = load_obj("assets/shoes/1229a2e6e97e_A_basketball_shoes_.obj")
    verts = G.center_and_normalize_verts(jnp.asarray(mesh_data.verts))
    mesh = RF.MeshArrays(
        verts=verts,
        faces=jnp.asarray(mesh_data.faces),
        face_uvs=jnp.asarray(mesh_data.face_uvs),
        texture=jnp.asarray(mesh_data.texture),
    )
    dparams, dcfg = D.load_params(None)
    s = CROP
    K = jnp.array([[s * 1.2, 0, s / 2], [0, s * 1.2, s / 2], [0, 0, 1.0]], jnp.float32)
    key = jax.random.PRNGKey(0)
    rot = G.random_rotations(key, FRAMES)
    trans = jnp.tile(jnp.array([[0.0, 0.0, 2.0]]), (FRAMES, 1))
    p = dcfg.feat_size ** 2
    gt = jax.random.normal(jax.random.PRNGKey(1), (FRAMES, p, dcfg.embed_dim))
    gt = gt / jnp.linalg.norm(gt, axis=-1, keepdims=True)
    tm = jnp.zeros((FRAMES, s, s)).at[:, 64:192, 64:192].set(1.0)
    targets = RF.FrameTargets(
        target_masks=tm, gt_feats=gt, K_rois=jnp.tile(K, (FRAMES, 1, 1))
    )
    r6 = G.matrix_to_rot6d(rot)
    tr = trans[:, None, :]

    def vpix(r6_, tr_):
        R = G.rot6d_to_matrix(r6_)
        vt = jnp.einsum("vj,bjk->bvk", verts, R) + tr_
        vp = jax.vmap(lambda v, k: rz.project_perspective(v, k))(vt, targets.K_rois)
        return vt, vp

    vt0, vp0 = jax.jit(vpix)(r6, tr)

    # Counted per-tile face cap, like bench.py/the pipeline: the default
    # 640 silently drops face-tile pairs on this scene (worst load ~1420
    # at the silhouette margin), which would inflate every raster timing
    # below on corrupted (pair-dropped) rasters.
    from dynhor_tpu.ops.rasterize_tiled import max_active_tiles_load, max_tile_load

    worst, n_act = (
        int(x)
        for x in jax.jit(
            lambda vp_: tuple(
                jax.vmap(
                    lambda v: f(v, mesh.faces, (s, s), margin=6.0 * 0.25 + 1.0)
                )(vp_).max()
                for f in (max_tile_load, max_active_tiles_load)
            )
        )(vp0)
    )
    cap = max(256, min(-(-int(worst * 1.5) // 128) * 128, int(mesh.faces.shape[0])))
    act_cap = max(8, min(-(-int(n_act * 1.5) // 8) * 8, (-(-s // 16)) ** 2))
    print(f"[counted per-tile face cap {cap} (worst load {worst}); active-tile cap {act_cap} (worst {n_act})]")

    # --- piece: bin_faces alone (fwd only; runs inside every raster) ---
    def binf(vp_):
        return jax.vmap(lambda v: bin_faces(v, mesh.faces, (s, s), 16, cap, 3.0).indices)(vp_)
    print(f"bin_faces x8 fwd:           {timeit(jax.jit(binf), vp0):8.2f} ms")

    # --- piece: fused raster+sil fwd ---
    def fused_f(vp_):
        frag, sil, _ = jax.vmap(
            lambda v: rasterize_silhouette_pallas(v, mesh.faces, (s, s), max_faces=cap)
        )(vp_)
        return sil.sum() + frag.bary.sum()
    print(f"fused raster+sil x8 fwd:    {timeit(jax.jit(fused_f), vp0):8.2f} ms")

    # --- piece: fused raster+sil fwd+bwd (grad wrt verts_pix) ---
    gf = jax.jit(jax.grad(fused_f))
    print(f"fused raster+sil x8 f+b:    {timeit(gf, vp0):8.2f} ms")

    # --- piece: same, active-tile compacted (the production config) ---
    def fused_act(vp_):
        frag, sil, _ = jax.vmap(
            lambda v: rasterize_silhouette_pallas(
                v, mesh.faces, (s, s), max_faces=cap, max_active_tiles=act_cap
            )
        )(vp_)
        return sil.sum() + frag.bary.sum()
    print(f"  + active-tile compaction: {timeit(jax.jit(jax.grad(fused_act)), vp0):8.2f} ms")

    # --- old path: separate rasterize_tiled + pallas silhouette ---
    def old_f(vp_):
        frag = jax.vmap(lambda v: rasterize_tiled(v, mesh.faces, (s, s), max_faces=cap))(vp_)
        sil = jax.vmap(lambda v: soft_silhouette_pallas(v, mesh.faces, (s, s), max_faces=cap))(vp_)
        return sil.sum() + frag.bary.sum()
    print(f"OLD separate x8 fwd:        {timeit(jax.jit(old_f), vp0):8.2f} ms")
    print(f"OLD separate x8 f+b:        {timeit(jax.jit(jax.grad(old_f)), vp0):8.2f} ms")

    # --- piece: phong + resize-to-518 (fwd+bwd wrt verts) ---
    def shade_f(vt_, vp_):
        def one(v, vpx):
            vn = rz.compute_vertex_normals(v, mesh.faces)
            frag, _, _ = rasterize_silhouette_pallas(vpx, mesh.faces, (s, s), max_faces=cap)
            rgba = phong_shade(frag, mesh.faces, v, vn, mesh.face_uvs, mesh.texture, fine_lights())
            rgb = rgba[..., :3].transpose(2, 0, 1)
            return resize_bicubic_align_corners(rgb[None], dcfg.smaller_edge_size, dcfg.smaller_edge_size)
        return jax.vmap(one)(vt_, vp_).sum()
    print(f"raster+phong+resize x8 f+b: {timeit(jax.jit(jax.grad(shade_f)), vt0, vp0):8.2f} ms")

    # --- piece: ViT fwd+bwd (bf16) ---
    dp16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), dparams)
    imgs = jax.random.uniform(key, (FRAMES, 3, dcfg.smaller_edge_size, dcfg.smaller_edge_size))

    def vit_f(x):
        return D.forward_tokens(dp16, x.astype(jnp.bfloat16), dcfg).astype(jnp.float32).sum()
    print(f"ViT-B/14 x8 fwd+bwd bf16:   {timeit(jax.jit(jax.grad(vit_f)), imgs):8.2f} ms")

    # --- full fine step (current impl) ---
    import optax

    cfg = RF.RefineConfig(
        num_iterations=1, crop_size=s, mode="fine", max_faces_per_tile=cap,
        max_active_tiles=act_cap,
    )

    def full_loss(params, dp):
        def one(r, t, m_, g_, k_):
            l, _, _ = RF._frame_loss(r, t, mesh, m_, g_, k_, dp, dcfg, cfg)
            return l
        return jax.vmap(one)(params["rot6d"], params["trans"], targets.target_masks,
                             targets.gt_feats, targets.K_rois).sum()

    opt = optax.adam(0.01)
    params = {"rot6d": r6, "trans": tr}
    ost = opt.init(params)

    @jax.jit
    def step(params, ost, dp):
        g = jax.grad(full_loss)(params, dp)
        up, ost = opt.update(g, ost, params)
        return optax.apply_updates(params, up), ost

    t = timeit(lambda: step(params, ost, dp16), n=10)
    print(f"FULL fine step x8 (fused):  {t:8.2f} ms  -> {FRAMES / (t / 1000.0) / 100.0:.3f} frames/s @100 iters")


if __name__ == "__main__":
    main()
