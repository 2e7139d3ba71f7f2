"""Joint all-frames temporal optimization (one jitted optax loop).

Behavioral reference: ObjTracker/jointopt.py — Joint_Optimizer (15-91) and
joint_optimize (93-161): all frames' {rot6d, trans} optimized together for
200 Adam steps with per-group learning rates (rotations x10,
jointopt.py:135-141); loss = lw_sil * (masked silhouette L2 / keep.sum() /
num_frames) + lw_smooth * mean squared vertex velocity
(losses.py:66-84); soft-IoU logged as a metric.

TPU design: the reference is already batched over frames; here the whole
200-step loop is one jit (lax.fori_loop), the silhouette raster vmaps over
the frame axis, and per-step scalars are accumulated on-device and
returned for TensorBoard writing on the host (jointopt.py:151-155 parity).
The frame axis shards over chips; the smoothness term's 1-frame halo is
the only cross-shard coupling (SURVEY.md §3.3).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..ops import rasterize as rz
from ..ops.silhouette import soft_silhouette
from ..utils import geometry as G
from ..utils.masks import batch_mask_iou

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class JointConfig:
    num_iterations: int = 200  # configs/custom_shoes.yaml:14
    lr: float = 1e-4  # configs/custom_shoes.yaml:15
    rotation_lr_mult: float = 10.0  # jointopt.py:140
    lw_sil_obj: float = 1.0  # configs/custom_shoes.yaml:17
    lw_smooth_obj: float = 10.0  # configs/custom_shoes.yaml:18
    crop_size: int = 256
    sigma: float = 0.25
    face_chunk: int = 512
    optimize_object_scale: bool = False  # jointopt.py:41-48 (off: run.py:159)
    use_tiled: bool = True  # tile-binned rasterization (see tracker/refine.py)
    tile_size: int = 16
    max_faces_per_tile: int = 640
    # Active-tile compaction for the fused raster (see tracker/refine.py).
    max_active_tiles: int | None = None
    silhouette_impl: str = "auto"  # "auto" | "pallas" | "tiled" | "dense"


class JointResult(NamedTuple):
    rot6d: Array  # (B, 3, 2) row convention
    translations: Array  # (B, 1, 3)
    scale: Array  # () |scale| actually applied
    history: dict[str, Array]  # per-step scalars (loss terms + iou metric)


def _sil_and_smooth(
    params, verts, faces, K_rois, ref_masks, keep_masks, cfg: JointConfig
):
    rots = G.rot6d_to_matrix(params["rot6d"])  # (B, 3, 3)
    scale = jnp.abs(params["scale"])
    verts_t = scale * jnp.einsum("vj,bjk->bvk", verts, rots) + params["trans"]

    s = cfg.crop_size

    def render(v, K):
        vp = rz.project_perspective(v, K)
        # Pure-soft silhouette as the objective (see tracker/refine.py);
        # hard mask only for the logged IoU metric.
        impl = cfg.silhouette_impl
        if impl == "auto":
            impl = (
                "pallas"
                if cfg.use_tiled and jax.default_backend() == "tpu"
                else ("tiled" if cfg.use_tiled else "dense")
            )
        if impl == "pallas":
            # Fused kernel: the hard z-buffer mask rides along with the soft
            # mass at no extra raster cost, so the logged IoU is the TRUE
            # hard-raster IoU (reference losses.py:73-78), not a
            # thresholded-soft proxy.
            from ..ops.raster_pallas import rasterize_silhouette_pallas

            frag, soft, ov = rasterize_silhouette_pallas(
                vp, faces, (s, s), sigma=cfg.sigma, tile=cfg.tile_size,
                max_faces=cfg.max_faces_per_tile,
                max_active_tiles=cfg.max_active_tiles,
            )
            hard = (frag.pix_to_face >= 0).astype(jnp.float32)
            return soft, hard, ov
        elif impl == "tiled":
            from ..ops.rasterize_tiled import soft_silhouette_tiled

            soft = soft_silhouette_tiled(
                vp, faces, (s, s), sigma=cfg.sigma, tile=cfg.tile_size,
                max_faces=cfg.max_faces_per_tile,
            )
        else:
            soft = soft_silhouette(vp, faces, (s, s), sigma=cfg.sigma, face_chunk=cfg.face_chunk)
        # Thresholded soft as the IoU metric proxy on the non-fused paths
        # (a second hard rasterization would roughly double raster cost).
        hard = jax.lax.stop_gradient((soft > 0.5).astype(jnp.float32))
        return soft, hard, jnp.zeros((), jnp.int32)

    sil, hard, ovs = jax.vmap(render)(verts_t, K_rois)  # (B, S, S) masks
    image = keep_masks * sil
    # losses.py:66-78: sum of squared residuals over the whole batch,
    # normalized by keep.sum(), then by num_frames.
    l_sil = jnp.sum((image - ref_masks) ** 2) / keep_masks.sum() / verts_t.shape[0]
    l_smooth = jnp.mean((verts_t[1:] - verts_t[:-1]) ** 2)  # losses.py:80-84
    iou = batch_mask_iou(keep_masks * hard, ref_masks).mean()
    return l_sil, l_smooth, iou, ovs.max()


def joint_optimize(
    verts: Array,
    faces: Array,
    rot_init_row: Array,
    trans_init: Array,
    K_rois: Array,
    target_masks: Array,
    cfg: JointConfig = JointConfig(),
    iters_per_launch: int = 50,
) -> JointResult:
    """Stage-2 joint optimization.

    Runs in host-side launches of ``iters_per_launch`` steps (state carried,
    histories concatenated) — monolithic multi-minute device programs trip
    some TPU runtimes' watchdog.

    Args:
      verts: (V, 3) canonical vertices; faces: (F, 3).
      rot_init_row: (B, 3, 3) row-convention rotations from stage 1.
      trans_init: (B, 1, 3) or (B, 3).
      K_rois: (B, 3, 3) crop intrinsics in pixel units.
      target_masks: (B, S, S) tri-valued {-1, 0, 1}.
    """
    import dataclasses

    import numpy as np

    total = cfg.num_iterations
    chunk = max(min(iters_per_launch, total), 1)
    state = None
    result = None
    hists = []
    done = 0
    from ..utils.retry import retry_on_device_error

    def one_launch(cfg_l, st):
        r, st2 = _joint_launch(
            verts, faces, rot_init_row, trans_init, K_rois, target_masks,
            cfg_l, st,
        )
        jax.block_until_ready(r.rot6d)
        return r, st2

    while True:
        it = min(chunk, total - done) if total else 0
        cfg_l = dataclasses.replace(cfg, num_iterations=it)
        result, state = retry_on_device_error(one_launch, cfg_l, state, tag="joint-opt")
        hists.append(result.history)
        done += it
        if done >= total or total == 0:
            break
    history = {
        k: jnp.concatenate([h[k] for h in hists]) for k in hists[0]
    }
    max_ov = int(np.asarray(history["bin_overflow"]).max()) if len(history["bin_overflow"]) else 0
    if max_ov > 0:
        print(
            f"WARNING: tile-bin overflow DURING joint optimization (max"
            f" {max_ov} face-tile pairs or active tiles dropped in a step) —"
            " both caps are auto-counted"
            " (tracker/pipeline._counted_refine_cap); raise"
            " system.cap_headroom (default 1.5) or set an explicit"
            " system.max_faces_per_tile override (disables compaction)",
            flush=True,
        )
    return JointResult(result.rot6d, result.translations, result.scale, history)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _joint_launch(
    verts: Array,
    faces: Array,
    rot_init_row: Array,
    trans_init: Array,
    K_rois: Array,
    target_masks: Array,
    cfg: JointConfig = JointConfig(),
    carry_state=None,
) -> tuple[JointResult, tuple]:
    """One device launch of cfg.num_iterations joint Adam steps."""
    if trans_init.ndim == 2:
        trans_init = trans_init[:, None, :]
    ref_masks = (target_masks > 0).astype(jnp.float32)
    keep_masks = (target_masks >= 0).astype(jnp.float32)

    def loss_fn(p):
        l_sil, l_smooth, iou, ov = _sil_and_smooth(
            p, verts, faces, K_rois, ref_masks, keep_masks, cfg
        )
        total = cfg.lw_sil_obj * l_sil + cfg.lw_smooth_obj * l_smooth
        return total, (l_sil, l_smooth, iou, ov)

    labels = {"rot6d": "rot", "trans": "other", "scale": "other" if cfg.optimize_object_scale else "frozen"}
    opt = optax.multi_transform(
        {
            "rot": optax.adam(cfg.lr * cfg.rotation_lr_mult),
            "other": optax.adam(cfg.lr),
            "frozen": optax.set_to_zero(),
        },
        labels,
    )
    if carry_state is None:
        params = {
            "rot6d": G.matrix_to_rot6d(rot_init_row),
            "trans": trans_init.astype(jnp.float32),
            "scale": jnp.ones(()),
        }
        opt_state = opt.init(params)
    else:
        params, opt_state = carry_state

    def step(i, carry):
        params, opt_state, hist = carry
        (total, (l_sil, l_smooth, iou, ov)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        hist = {
            "loss": hist["loss"].at[i].set(total),
            "loss_sil_obj": hist["loss_sil_obj"].at[i].set(l_sil),
            "loss_smooth_obj": hist["loss_smooth_obj"].at[i].set(l_smooth),
            "iou_object": hist["iou_object"].at[i].set(iou),
            "bin_overflow": hist["bin_overflow"].at[i].set(ov.astype(jnp.float32)),
        }
        return params, opt_state, hist

    t = cfg.num_iterations
    hist0 = {k: jnp.zeros((t,)) for k in ["loss", "loss_sil_obj", "loss_smooth_obj", "iou_object", "bin_overflow"]}
    params, opt_state, hist = jax.lax.fori_loop(0, t, step, (params, opt_state, hist0))
    return (
        JointResult(params["rot6d"], params["trans"], jnp.abs(params["scale"]), hist),
        (params, opt_state),
    )
