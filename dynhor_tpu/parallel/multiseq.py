"""Multi-sequence batched tracking: N videos' frames pooled into ONE
vmapped refine, sharded across chips (BASELINE.json config #5: "4 videos
pmapped across chips").

Different sequences track different objects, so the per-frame loss carries
ITS OWN mesh: meshes are padded to common (V_max, F_max) — padding verts
repeat vertex 0 and padding faces are degenerate (0,0,0), which both
rasterizers ignore (zero screen area) — then the whole (seq*frames) pool
runs as one batch with the frame axis sharded (parallel/mesh.py).  The
joint temporal stage couples frames only within a sequence, so it runs
per sequence afterwards (cheap relative to the refine).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import dino as dino_mod
from ..tracker import refine as RF
from ..utils import geometry as G
from ..utils.objio import MeshData

Array = jax.Array


def pad_mesh(mesh: MeshData, v_max: int, f_max: int) -> MeshData:
    """Pad to (v_max, f_max): repeated vertex 0 / degenerate faces."""
    v = np.asarray(mesh.verts)
    f = np.asarray(mesh.faces)
    uv = np.asarray(mesh.face_uvs)
    v_pad = np.concatenate([v, np.tile(v[:1], (v_max - len(v), 1))]) if len(v) < v_max else v
    f_pad = np.concatenate([f, np.zeros((f_max - len(f), 3), f.dtype)]) if len(f) < f_max else f
    uv_pad = (
        np.concatenate([uv, np.zeros((f_max - len(uv), 3, 2), uv.dtype)])
        if len(uv) < f_max else uv
    )
    return dataclasses.replace(mesh, verts=v_pad, faces=f_pad, face_uvs=uv_pad)


class MultiSeqBatch(NamedTuple):
    """Frame pool across sequences (leading axis = pooled frames)."""

    mesh_verts: Array  # (N, V, 3) per-frame canonical verts
    mesh_faces: Array  # (N, F, 3)
    mesh_uvs: Array  # (N, F, 3, 2)
    mesh_tex: Array  # (N, Ht, Wt, 3) (textures padded to common size)
    targets: RF.FrameTargets  # leading axis N
    seq_id: np.ndarray  # (N,) which sequence each frame belongs to


def build_batch(
    meshes: list[MeshData],
    per_seq_targets: list[RF.FrameTargets],
) -> MultiSeqBatch:
    """Pool frames of several sequences, padding meshes/textures."""
    v_max = max(m.verts.shape[0] for m in meshes)
    f_max = max(m.faces.shape[0] for m in meshes)
    ht = max(m.texture.shape[0] for m in meshes)
    wt = max(m.texture.shape[1] for m in meshes)
    mv, mf, muv, mtex, seq_id = [], [], [], [], []
    tgt_fields = {k: [] for k in RF.FrameTargets._fields}
    for s, (mesh, tgt) in enumerate(zip(meshes, per_seq_targets)):
        m = pad_mesh(mesh, v_max, f_max)
        tex = np.ones((ht, wt, 3), np.float32)
        tex[: m.texture.shape[0], : m.texture.shape[1]] = m.texture
        n = tgt.target_masks.shape[0]
        for _ in range(n):
            mv.append(m.verts)
            mf.append(m.faces)
            muv.append(m.face_uvs)
            mtex.append(tex)
        seq_id.extend([s] * n)
        for k in RF.FrameTargets._fields:
            tgt_fields[k].append(np.asarray(getattr(tgt, k)))
    targets = RF.FrameTargets(
        **{k: jnp.asarray(np.concatenate(v)) for k, v in tgt_fields.items()}
    )
    return MultiSeqBatch(
        mesh_verts=jnp.asarray(np.stack(mv)),
        mesh_faces=jnp.asarray(np.stack(mf)),
        mesh_uvs=jnp.asarray(np.stack(muv)),
        mesh_tex=jnp.asarray(np.stack(mtex)),
        targets=targets,
        seq_id=np.asarray(seq_id, np.int32),
    )


def refine_poses_multi(
    batch: MultiSeqBatch,
    rot_init_row: Array,
    trans_init: Array,
    dino_params,
    dino_cfg: dino_mod.DinoConfig | None,
    cfg: RF.RefineConfig = RF.RefineConfig(),
    iters_per_launch: int = 25,
    frames_per_launch: int | None = None,
) -> RF.RefineResult:
    """Like tracker.refine.refine_poses, but vmapped over PER-FRAME meshes
    (the pooled multi-sequence batch).  The pooled frame axis is the shard
    axis for multi-chip.  Runs in host-side launches of
    ``iters_per_launch`` steps with carried state + transient-fault retry
    (monolithic multi-minute device programs trip some TPU runtimes'
    watchdog — same structure as refine_poses).

    ``frames_per_launch`` micro-batches the FRAME axis host-side: fine-mode
    frames are independent (per-frame params/Adam state, summed loss), so
    slicing the pool is numerically exact, and it bounds HBM — 40 pooled
    fine-mode frames OOM a single 16 GB v5e (ViT activations + per-frame
    padded meshes) while 2x20 fit.  Default: 16 for fine mode, whole pool
    for coarse.  The last group is padded to the group size so every group
    reuses one compiled launch."""
    import jax

    from ..utils.retry import retry_on_device_error

    n_pool = int(rot_init_row.shape[0])
    if frames_per_launch is None:
        # ~16 fine-mode frames fit one 16 GB chip; the shard axis divides
        # per-device residency, so the cap scales with visible devices.
        frames_per_launch = (
            16 * max(1, len(jax.devices())) if cfg.mode == "fine" else n_pool
        )
    g = max(1, min(frames_per_launch, n_pool))
    if g < n_pool:
        if trans_init.ndim == 2:
            trans_init = trans_init[:, None, :]
        pad = (-n_pool) % g

        def _pad(x):
            if pad == 0:
                return x
            return jnp.concatenate([x, jnp.repeat(x[:1], pad, axis=0)], axis=0)

        batch_p = MultiSeqBatch(
            *(_pad(a) for a in batch[:4]),
            RF.FrameTargets(*(_pad(x) for x in batch.targets)),
            np.concatenate([batch.seq_id, np.repeat(batch.seq_id[:1], pad)]),
        )
        rot_p, trans_p = _pad(rot_init_row), _pad(trans_init)
        parts = []
        for i in range(0, n_pool + pad, g):
            sl = slice(i, i + g)
            parts.append(
                refine_poses_multi(
                    MultiSeqBatch(
                        *(a[sl] for a in batch_p[:4]),
                        RF.FrameTargets(*(x[sl] for x in batch_p.targets)),
                        batch_p.seq_id[sl],
                    ),
                    rot_p[sl], trans_p[sl], dino_params, dino_cfg, cfg,
                    iters_per_launch, frames_per_launch=g,
                )
            )
        return RF.RefineResult(
            rot6d=jnp.concatenate([p.rot6d for p in parts])[:n_pool],
            translations=jnp.concatenate([p.translations for p in parts])[:n_pool],
            final_loss=jnp.concatenate([p.final_loss for p in parts])[:n_pool],
            final_iou=jnp.concatenate([p.final_iou for p in parts])[:n_pool],
            max_overflow=jnp.stack(
                [p.max_overflow for p in parts]
            ).max(),
        )

    total = cfg.num_iterations
    chunk = max(min(iters_per_launch, total), 1)
    n_launches = -(-total // chunk) if total else 0
    state = None
    result = None
    done = 0
    max_overflow = 0

    def one_launch(cfg_l, st):
        r, st2 = _multi_launch(
            batch, rot_init_row, trans_init, dino_params, dino_cfg, cfg_l, st
        )
        jax.block_until_ready(r.rot6d)
        return r, st2

    for _ in range(max(n_launches, 1)):
        it = min(chunk, total - done) if total else 0
        cfg_l = dataclasses.replace(cfg, num_iterations=it)
        result, state = retry_on_device_error(
            one_launch, cfg_l, state, tag="multiseq-refine"
        )
        max_overflow = max(max_overflow, int(result.max_overflow))
        done += it
        if done >= total:
            break
    if max_overflow > 0:
        print(
            f"WARNING: tile-bin overflow DURING pooled refinement (max"
            f" {max_overflow} face-tile pairs dropped in a step) — raise"
            " max_faces_per_tile",
            flush=True,
        )
    return result


@functools.partial(jax.jit, static_argnames=("dino_cfg", "cfg"))
def _multi_launch(
    batch: MultiSeqBatch,
    rot_init_row: Array,
    trans_init: Array,
    dino_params,
    dino_cfg: dino_mod.DinoConfig | None,
    cfg: RF.RefineConfig = RF.RefineConfig(),
    carry_state=None,
):
    """One device launch of cfg.num_iterations pooled Adam steps."""
    import optax

    if trans_init.ndim == 2:
        trans_init = trans_init[:, None, :]

    def one(r6, t, mv, mf, muv, mtex, tm, gf, K):
        mesh = RF.MeshArrays(verts=mv, faces=mf, face_uvs=muv, texture=mtex)
        return RF._frame_loss(r6, t, mesh, tm, gf, K, dino_params, dino_cfg, cfg)

    def total_loss(p):
        losses, ious, ovs = jax.vmap(one)(
            p["rot6d"], p["trans"], batch.mesh_verts, batch.mesh_faces,
            batch.mesh_uvs, batch.mesh_tex, batch.targets.target_masks,
            batch.targets.gt_feats, batch.targets.K_rois,
        )
        return losses.sum(), (losses, ious, ovs.max())

    opt = optax.adam(cfg.lr)
    if carry_state is None:
        params = {
            "rot6d": G.matrix_to_rot6d(rot_init_row),
            "trans": trans_init.astype(jnp.float32),
        }
        opt_state = opt.init(params)
    else:
        params, opt_state = carry_state

    def step(_, carry):
        params, opt_state, _, _, max_ov = carry
        (_, (losses, ious, ov)), grads = jax.value_and_grad(
            total_loss, has_aux=True
        )(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, losses, ious, jnp.maximum(max_ov, ov)

    n = rot_init_row.shape[0]
    init = (
        params, opt_state, jnp.zeros((n,)), jnp.zeros((n,)),
        jnp.zeros((), jnp.int32),
    )
    params, opt_state, losses, ious, max_ov = jax.lax.fori_loop(
        0, cfg.num_iterations, step, init
    )
    return (
        RF.RefineResult(params["rot6d"], params["trans"], losses, ious, max_ov),
        (params, opt_state),
    )
