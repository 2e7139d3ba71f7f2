#!/usr/bin/env python
"""Breakdown of the 8-frame fine refine step: coarse-mode step vs fine step
vs ViT-only f+b, each timed in THIS process with an end-of-loop value fetch
(bogus-fast timings after remote-compiler crashes are silently dropped
work — see .claude/skills/verify/SKILL.md)."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dynhor_tpu.utils.compcache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

FRAMES = 8
CROP = 256


def main() -> None:
    import dataclasses

    import optax

    import dynhor_tpu.ops.rasterize as RZ
    from dynhor_tpu.models import dino as D
    from dynhor_tpu.ops.rasterize_tiled import max_active_tiles_load, max_tile_load
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
    rot = G.random_rotations(jax.random.PRNGKey(0), FRAMES)
    trans = jnp.tile(jnp.array([[0.0, 0.0, 1.75]]), (FRAMES, 1))

    @jax.jit
    def make_target(R_row, t):
        vp = RZ.project_perspective(verts @ R_row + t, K)
        frag = RZ.rasterize(vp, mesh.faces, (s, s), face_chunk=512)
        return (frag.pix_to_face >= 0).astype(jnp.float32)

    masks = jnp.stack([make_target(rot[i], trans[i]) for i in range(FRAMES)])
    p = dcfg.feat_size**2
    gt = jax.random.normal(jax.random.PRNGKey(1), (FRAMES, p, dcfg.embed_dim))
    gt = gt / jnp.linalg.norm(gt, axis=-1, keepdims=True)
    targets = RF.FrameTargets(masks, gt, jnp.tile(K, (FRAMES, 1, 1)))

    def _load(R_row, t):
        vp = RZ.project_perspective(verts @ R_row + t, K)
        margin = 6.0 * 0.25 + 1.0
        return (
            max_tile_load(vp, mesh.faces, (s, s), margin=margin),
            max_active_tiles_load(vp, mesh.faces, (s, s), margin=margin),
        )

    loads, actives = jax.vmap(_load)(rot, trans)
    cap = max(256, min(-(-int(int(loads.max()) * 1.5) // 128) * 128, int(mesh.faces.shape[0])))
    act = max(8, -(-int(int(actives.max()) * 1.5) // 8) * 8)

    def timed(name, fn, *args):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        compile_s = time.perf_counter() - t0
        n = 10
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n * 1e3
        # value fetch: assert real work happened
        leaf = jax.tree.leaves(out)[0]
        val = float(jnp.asarray(leaf).reshape(-1)[0])
        print(f"{name:34s} {dt:7.1f} ms  (compile {compile_s:5.1f}s, probe {val:.3e})", flush=True)
        return dt

    # dino params must be jit ARGUMENTS, not closure constants: closed-over
    # weights get baked into the StableHLO as literals and the remote
    # compiler rejects the payload (HTTP 413 length limit exceeded).
    dp16_arg = jax.tree.map(lambda a: a.astype(jnp.bfloat16), dparams)

    def step_fn(mode):
        cfg = RF.RefineConfig(
            num_iterations=1, crop_size=s, mode=mode, face_chunk=512,
            max_faces_per_tile=cap, max_active_tiles=act,
        )
        opt = optax.adam(cfg.lr)

        def total(params, dp):
            def one(r6, t, tm, gf, Kr):
                loss, _, _ = RF._frame_loss(
                    r6, t, mesh, tm, gf, Kr, dp, dcfg, cfg,
                )
                return loss

            return jax.vmap(one)(
                params["rot6d"], params["trans"], targets.target_masks,
                targets.gt_feats, targets.K_rois,
            ).sum()

        params = {"rot6d": G.matrix_to_rot6d(rot), "trans": trans[:, None, :]}
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state, dp):
            loss, grads = jax.value_and_grad(total)(params, dp)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        return step, params, opt_state

    # ViT-only f+b (fused front end, frozen remat, bf16)
    dp16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), dparams)
    rgb = jax.random.uniform(jax.random.PRNGKey(2), (FRAMES, 3, s, s))

    def vit_loss(im):
        f = D.forward_tokens_from_crop(dp16, im, dcfg, remat="frozen")
        return (f.astype(jnp.float32) ** 2).mean()

    timed("ViT f+b (fused front, frozen)", jax.jit(jax.grad(vit_loss)), rgb)

    step_c, pc_, oc_ = step_fn("coarse")
    timed("coarse step (raster+sil+losses+adam)", step_c, pc_, oc_, None)
    step_f, pf_, of_ = step_fn("fine")
    timed("fine step (all)", step_f, pf_, of_, dp16_arg)


if __name__ == "__main__":
    main()
