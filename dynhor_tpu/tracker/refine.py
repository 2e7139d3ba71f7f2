"""Per-frame pose refinement, vmapped across the whole video (optax Adam).

Behavioral reference: ObjTracker/pose_initializtion.py — the ObjTracker
module (32-186) and its 100-step Adam loop (347-356).  Loss terms:
  * iou: 1 - soft-IoU of (keep_mask * silhouette) vs the object mask
    (coarse_forward/forward, losses.py batch_mask_iou);
  * sem: masked DINO-cosine between the textured Phong render and the
    frame crop's features, gradients THROUGH the frozen ViT (164-184);
  * offscreen: 1e5 x out-of-frustum vertex penalty (119-141, nr NDC
    conventions with far=100).

TPU re-design: the reference optimizes one frame at a time in a Python
loop (421-445) — each of its num_frames x 100 steps runs a batch-1 ViT
forward+backward and two batch-1 rasterizations.  Here the per-frame loss
is a pure function of (rot6d, trans); ``vmap`` batches it across ALL
frames, so 100 big batched steps replace num_frames x 100 tiny ones — the
MXU sees (F x 1370 x 768) matmuls instead of (1 x 1370 x 768).  One jitted
``lax.fori_loop`` drives Adam (optax); nothing re-traces per frame.
The frame axis is the natural shard axis for multi-chip
(parallel/mesh.py).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models import dino as dino_mod
from ..ops import rasterize as rz
from ..ops.rasterize_tiled import rasterize_tiled, soft_silhouette_tiled
from ..ops.resize import resize_nearest
from ..ops.shading import fine_lights, phong_shade, phong_shade_tiles
from ..ops.silhouette import soft_silhouette
from ..utils import camera as cam
from ..utils import geometry as G
from ..utils.masks import batch_mask_iou

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class RefineConfig:
    num_iterations: int = 100  # configs/custom_shoes.yaml:12
    lr: float = 0.01  # configs/custom_shoes.yaml:13
    crop_size: int = 256  # constants.py:2
    lw_sem: float = 1.0  # pose_initializtion.py:51
    lw_mask: float = 1.0  # stored but never applied in the reference (quirk,
    # pose_initializtion.py:107,149,162) — kept for config parity, unused.
    offscreen_weight: float = 1e5  # pose_initializtion.py:154,185
    far: float = 100.0  # neural_renderer Renderer default far plane
    mode: str = "fine"  # "fine" | "coarse" (pose_initializtion.py:349-352)
    sigma: float = 0.25  # soft-silhouette edge band (ours; nr is hard)
    face_chunk: int = 512
    # Tile-binned rasterization (ops/rasterize_tiled.py): ~5x faster at the
    # production crop scale; set use_tiled=False for the dense reference
    # path (tiny/odd-scale inputs where the per-tile cap could overflow).
    use_tiled: bool = True
    tile_size: int = 16
    max_faces_per_tile: int = 640
    # Active-tile compaction for the fused Pallas raster: the kernel (and
    # its gather-bound row packing) runs only over tiles with >= 1
    # candidate face.  Counted per scene like the face cap
    # (rasterize_tiled.max_active_tiles_load; pipeline counts both);
    # None = dense over all tiles.  Measured 1.95x on the raster f+b at
    # the production scene (75% of tiles empty).
    max_active_tiles: int | None = None
    # Soft-silhouette implementation: "auto" = Pallas fused kernel on TPU
    # (ops/silhouette_pallas.py, ~4x over the XLA tiled path), XLA tiled
    # elsewhere; or force "pallas" | "tiled" | "dense".
    silhouette_impl: str = "auto"
    # DINO compute dtype for the sem loss: bfloat16 puts the ViT matmuls on
    # the MXU's fast path; the perceptual-loss gradient tolerates it (the
    # backbone is frozen; only the direction of the image gradient matters).
    dino_dtype: str = "bfloat16"
    # Rematerialization of ViT blocks in the sem-loss backward.  Measured
    # on v5e at 8 frames (ViT f+b): "frozen" 121.5 ms < True (full
    # per-block remat) 130.2 ms < "dots" 150.2 ms (saved-attention-probs
    # HBM writes cost more than the recompute); no-remat crashes this TPU
    # compiler outright.  "frozen" saves three named per-block activations
    # and exploits that the backbone has no weight grads (models/dino.py).
    dino_remat: bool | str = "frozen"


class MeshArrays(NamedTuple):
    verts: Array  # (V, 3) canonical (normalized) vertices
    faces: Array  # (F, 3)
    face_uvs: Array  # (F, 3, 2)
    texture: Array  # (Ht, Wt, 3)


class FrameTargets(NamedTuple):
    target_masks: Array  # (B, S, S) tri-valued {-1, 0, 1}
    gt_feats: Array  # (B, P, D) normalized frame DINO features
    K_rois: Array  # (B, 3, 3) crop intrinsics in PIXEL units (S-scale)


def offscreen_penalty(verts_cam: Array, K01: Array, far: float) -> Array:
    """Out-of-frustum penalty (pose_initializtion.py:119-141)."""
    ndc = cam.project_ndc(verts_cam, K01)
    xy = ndc[..., :2]
    z = ndc[..., 2]
    lower_right = jax.nn.relu(xy - 1.0).sum((-1, -2))
    upper_left = jax.nn.relu(-1.0 - xy).sum((-1, -2))
    behind = jax.nn.relu(-z).sum(-1)
    too_far = jax.nn.relu(z - far).sum(-1)
    return lower_right + upper_left + behind + too_far


def _frame_loss(
    rot6d: Array,
    trans: Array,
    mesh: MeshArrays,
    target_mask: Array,
    gt_feat: Array,
    K_roi: Array,
    dino_params: dict[str, Any] | None,
    dino_cfg: dino_mod.DinoConfig | None,
    cfg: RefineConfig,
) -> tuple[Array, Array, Array]:
    """Loss of ONE frame given (3,2) rot6d / (1,3) trans.

    Returns (loss, iou, overflow) — overflow is the tile-bin drop count
    (always 0 on the non-fused paths; see ops/raster_pallas.py)."""
    s = cfg.crop_size
    R = G.rot6d_to_matrix(rot6d[None])[0]
    verts_t = mesh.verts @ R + trans[0]  # row convention (camera space)

    ref_mask = (target_mask > 0).astype(jnp.float32)
    keep_mask = (target_mask >= 0).astype(jnp.float32)

    vp = rz.project_perspective(verts_t, K_roi)
    # Pure-soft silhouette as the optimization objective: a consistent
    # (value, gradient) pair keeps Adam honest; the linear-distance sigmoid
    # approximates true antialiased coverage, so the soft optimum coincides
    # with the reference's hard-mask optimum to sub-pixel accuracy.  The
    # reported IoU metric uses the hard mask (reference loss value parity).
    impl = cfg.silhouette_impl
    if impl == "auto":
        impl = (
            "pallas"
            if cfg.use_tiled and jax.default_backend() == "tpu"
            else ("tiled" if cfg.use_tiled else "dense")
        )
    overflow = jnp.zeros((), jnp.int32)
    compact = None
    if impl == "pallas":
        # One binning + one fused kernel for hard raster AND soft mass
        # (ops/raster_pallas.py) — the separate-raster path binned twice
        # and streamed (tiles x pixels x faces) through HBM.  The fine mode
        # also requests the compacted active-tile raster so Phong shading
        # runs on active tiles only (ops/shading.phong_shade_tiles).
        from ..ops.raster_pallas import rasterize_silhouette_pallas

        want_compact = cfg.mode == "fine" and cfg.max_active_tiles is not None
        out = rasterize_silhouette_pallas(
            vp, mesh.faces, (s, s), sigma=cfg.sigma, tile=cfg.tile_size,
            max_faces=cfg.max_faces_per_tile,
            max_active_tiles=cfg.max_active_tiles,
            return_compact=want_compact,
        )
        if want_compact:
            frag, soft, overflow, compact = out
        else:
            frag, soft, overflow = out
    elif impl == "tiled":
        frag = rasterize_tiled(
            vp, mesh.faces, (s, s), tile=cfg.tile_size,
            max_faces=cfg.max_faces_per_tile,
        )
        soft = soft_silhouette_tiled(
            vp, mesh.faces, (s, s), sigma=cfg.sigma, tile=cfg.tile_size,
            max_faces=cfg.max_faces_per_tile,
        )
    else:
        if cfg.use_tiled:
            frag = rasterize_tiled(
                vp, mesh.faces, (s, s), tile=cfg.tile_size,
                max_faces=cfg.max_faces_per_tile,
            )
        else:
            frag = rz.rasterize(vp, mesh.faces, (s, s), face_chunk=cfg.face_chunk)
        soft = soft_silhouette(
            vp, mesh.faces, (s, s), sigma=cfg.sigma, face_chunk=cfg.face_chunk
        )
    hard = (frag.pix_to_face >= 0).astype(jnp.float32)
    render_mask = keep_mask * soft
    loss = 1.0 - batch_mask_iou(render_mask, ref_mask)
    iou = batch_mask_iou(keep_mask * hard, ref_mask)

    K01 = K_roi.at[:2].divide(jnp.float32(s))
    loss = loss + cfg.offscreen_weight * offscreen_penalty(
        verts_t[None], K01[None], cfg.far
    )[0]

    if cfg.mode == "fine":
        vn = rz.compute_vertex_normals(verts_t, mesh.faces)
        if compact is not None:
            rgba = phong_shade_tiles(
                compact, (s, s), cfg.tile_size, mesh.faces, verts_t, vn,
                mesh.face_uvs, mesh.texture, fine_lights(),
            )
        else:
            rgba = phong_shade(
                frag, mesh.faces, verts_t, vn, mesh.face_uvs, mesh.texture,
                fine_lights(),
            )
        rgb = rgba[..., :3].transpose(2, 0, 1)  # (3, S, S)
        # Fused resize(518)+ImageNet-normalize+patch-embed: the upsampled
        # image (and its backward) never materializes; the embed matmul
        # runs in the params' dtype (pre-cast once in refine_poses).
        feats = dino_mod.forward_tokens_from_crop(
            dino_params, rgb[None], dino_cfg, remat=cfg.dino_remat,
        )[0].astype(jnp.float32)  # (P, D) — NOT normalized (reference :172,183)
        fs = dino_cfg.feat_size
        ref_small = resize_nearest(ref_mask, fs, fs).reshape(-1)  # (P,)
        cos = jnp.sum(gt_feat * feats, axis=-1) / (
            jnp.linalg.norm(gt_feat, axis=-1) * jnp.linalg.norm(feats, axis=-1) + 1e-6
        )
        sem = (ref_small * (1.0 - cos)).sum() / (ref_small.sum() + 1e-6)
        loss = loss + cfg.lw_sem * sem

    return loss, jax.lax.stop_gradient(iou), overflow


class RefineResult(NamedTuple):
    rot6d: Array  # (B, 3, 2)
    translations: Array  # (B, 1, 3)
    final_loss: Array  # (B,)
    final_iou: Array  # (B,)
    # Max tile-bin drop count seen over ALL frames and iterations of the
    # launch (0 = every raster was exact; see ops/raster_pallas.py).
    max_overflow: Array = jnp.zeros((), jnp.int32)


def refine_poses(
    mesh: MeshArrays,
    targets: FrameTargets,
    rot_init_row: Array,
    trans_init: Array,
    dino_params: dict[str, Any] | None,
    dino_cfg: dino_mod.DinoConfig | None,
    cfg: RefineConfig = RefineConfig(),
    iters_per_launch: int = 25,
    carry_state=None,
    return_state: bool = False,
) -> RefineResult:
    """Refine all frames' poses jointly-batched (independently-parameterized).

    The Adam loop runs in host-side launches of ``iters_per_launch`` steps
    (state carried across launches, one compile): monolithic multi-minute
    device programs trip some TPU runtimes' watchdog (see
    .claude/skills/verify/SKILL.md).

    Args:
      rot_init_row: (B, 3, 3) row-convention rotation inits (from gating).
      trans_init: (B, 3) or (B, 1, 3) translation inits (autodepth).
      carry_state: optional (params, opt_state) to resume from (the init
        args are then ignored; used by refine_poses_multihyp to continue
        the per-frame tournament winners).
      return_state: also return the final (params, opt_state).

    Returns: RefineResult (row-convention 6D rotations)
    [, (params, opt_state) if return_state].
    """
    total = cfg.num_iterations
    chunk = max(min(iters_per_launch, total), 1)
    n_launches = -(-total // chunk) if total else 0
    state = carry_state
    result = None
    done = 0
    from ..utils.retry import retry_on_device_error

    def one_launch(cfg_l, st):
        r, st2 = _refine_launch(
            mesh, targets, rot_init_row, trans_init, dino_params, dino_cfg,
            cfg_l, st,
        )
        jax.block_until_ready(r.rot6d)
        return r, st2

    max_overflow = 0
    for _ in range(max(n_launches, 1)):
        it = min(chunk, total - done) if total else 0
        cfg_l = dataclasses.replace(cfg, num_iterations=it)
        result, state = retry_on_device_error(one_launch, cfg_l, state, tag="refine")
        max_overflow = max(max_overflow, int(result.max_overflow))
        done += it
        if done >= total:
            break
    if max_overflow > 0:
        print(
            f"WARNING: tile-bin overflow DURING refinement (max {max_overflow}"
            " face-tile pairs or active tiles dropped in a step) — both caps"
            " are auto-counted at the init poses"
            " (tracker/pipeline._counted_refine_cap); raise"
            " system.cap_headroom (default 1.5) or set an explicit"
            " system.max_faces_per_tile override (disables compaction)",
            flush=True,
        )
    if return_state:
        return result, state
    return result


class MultiHypResult(NamedTuple):
    result: RefineResult  # per-frame WINNER poses/losses (B, ...)
    winner: Array  # (B,) int32 winning hypothesis slot per frame
    tournament_loss: Array  # (B, K) per-hypothesis loss at selection time


def _viterbi_select(rots_row, losses, smooth_weight: float = 1.0 / 45.0):
    """Temporally-consistent winner selection over the hypothesis lattice.

    Per-frame ``argmin(loss)`` cannot disambiguate silhouette-preserving
    pose families (a near-symmetric object renders the same mask at R and
    its 180-degree flip, and the semantic term is weak without pretrained
    features) — measured on shoes2: 8/10 frames stuck ~165 deg off while
    2 frames found the true pose at an equal loss.  A video's TRUE pose
    track is smooth, so the winner is chosen per sequence, not per frame:
    dynamic programming over the (F, K) lattice with

      unary(f, k)     = per-frame loss gap (L - min over slots), scaled
                        by the MEDIAN positive gap across the whole
                        lattice and clipped at 6 so one diverged
                        hypothesis cannot dominate.  The scale must be
                        global, not per-frame: a per-frame z-score with
                        K=2 maps EVERY gap to exactly 2 sigma (std of two
                        values is half their gap), erasing the difference
                        between a noise-level tie and a decisive signal;
      pairwise(f,i,j) = geodesic angle between consecutive frames' REFINED
                        hypothesis poses, in degrees x ``smooth_weight``
                        (default 1/45: a 180-deg flip between neighbours
                        costs 4 units — decisive vs the ~1-unit loss gap
                        of a symmetric-flip tie, overridable by a slot
                        that is uniformly better across frames).

    Host-side numpy Viterbi: F<=~40 frames, K<=8 hypotheses — microseconds.
    The reference has no analogue (it refines exactly one init per frame);
    this is the TPU-side mitigation for gate misses, VERDICT r4 next #1.
    """
    import numpy as np

    R = np.asarray(rots_row, np.float64)  # (B, K, 3, 3)
    L = np.asarray(losses, np.float64)  # (B, K)
    b, k = L.shape
    if b == 1 or k == 1:
        return jnp.argmin(jnp.asarray(L), axis=1).astype(jnp.int32)
    gaps = L - L.min(axis=1, keepdims=True)  # (B, K), >= 0
    pos = gaps[gaps > 1e-12]
    sigma = float(np.median(pos)) if pos.size else 1.0
    unary = np.clip(gaps / sigma, 0.0, 6.0)  # (B, K)
    # trace(A B^T) = sum(A * B) -> geodesic angle between hyp poses of
    # consecutive frames: ang[f, i, j] = angle(R[f, i], R[f+1, j]).
    tr = np.einsum("fiab,fjab->fij", R[:-1], R[1:])
    ang = np.degrees(np.arccos(np.clip((tr - 1.0) / 2.0, -1.0, 1.0)))
    pair = smooth_weight * ang  # (B-1, K, K)

    best = unary[0].copy()
    back = np.zeros((b, k), np.int32)
    for f in range(1, b):
        tot = best[:, None] + pair[f - 1]  # (K_prev, K)
        back[f] = np.argmin(tot, axis=0)
        best = tot.min(axis=0) + unary[f]
    win = np.zeros(b, np.int32)
    win[-1] = int(np.argmin(best))
    for f in range(b - 1, 0, -1):
        win[f - 1] = back[f, win[f]]
    return jnp.asarray(win, jnp.int32)


def refine_poses_multihyp(
    mesh: MeshArrays,
    targets: FrameTargets,
    rot_inits_row: Array,
    trans_inits: Array,
    dino_params: dict[str, Any] | None,
    dino_cfg: dino_mod.DinoConfig | None,
    cfg: RefineConfig = RefineConfig(),
    tournament_iters: int | None = None,
    iters_per_launch: int = 25,
    select: str = "viterbi",
    smooth_weight: float = 1.0 / 45.0,
    propagate_rounds: int = 0,
) -> MultiHypResult:
    """Multi-hypothesis refinement: K inits per frame, winner by final loss.

    The reference plumbs ``num_initializations`` but never enables it
    (pose_initializtion.py:258,390); this is that affordance, TPU-native:
    each hypothesis slot runs the SAME compiled vmapped-refine program
    (K host-side launches of (B,) frames — no recompiles, same peak HBM as
    single-hypothesis), a per-frame winner is selected by current total
    loss after ``tournament_iters`` steps, and only the winner continues
    for the remaining iterations (Adam state gathered per frame, exact).

    Cost: K x tournament_iters + (num_iterations - tournament_iters)
    frame-iterations vs num_iterations for single-hypothesis.

    Args:
      rot_inits_row: (B, K, 3, 3) hypothesis rotations
        (selection.build_hypotheses).
      trans_inits: (B, K, 3) autodepth translations per hypothesis.
      tournament_iters: steps before winner selection (None/0 or
        >= num_iterations = refine every hypothesis to the full count and
        select at the end — highest quality, full K x cost).
      select: "viterbi" (default) picks the temporally-consistent winner
        path over the whole sequence (_viterbi_select); "loss" is the
        per-frame argmin (the r4 behavior — keeps silhouette-flip ties).
      smooth_weight: Viterbi pairwise weight, loss-sigmas per degree of
        consecutive-frame pose disagreement.
      propagate_rounds: extra tournament rounds where each frame's
        hypothesis slots are RE-SEEDED from its neighbours' current
        PER-FRAME-ARGMIN winners (slot 0 = own winner, then frames f-1,
        f+1, f-2, ... up to K slots, each with the frame's own winner
        translation).  A frame whose original hypothesis set contained
        nothing near the true pose inherits it from a neighbour that
        found it — the tracking prior the per-frame reference never
        exploits.  Seeding deliberately ignores ``select``: the Viterbi
        path is one consistent family, and seeding every frame from it
        would erase the minority frames that disagree; the temporal
        prior is applied once, at the final selection.
    """
    import numpy as np

    b, k = rot_inits_row.shape[:2]
    if k == 1:
        res = refine_poses(
            mesh, targets, rot_inits_row[:, 0], trans_inits[:, 0],
            dino_params, dino_cfg, cfg, iters_per_launch,
        )
        return MultiHypResult(res, jnp.zeros((b,), jnp.int32),
                              res.final_loss[:, None])

    total = cfg.num_iterations
    t_iters = tournament_iters if tournament_iters else total
    t_iters = min(max(int(t_iters), 1), total)
    cfg_t = dataclasses.replace(cfg, num_iterations=t_iters)

    def tournament(rots_bk, trans_bk):
        results, states = [], []
        for j in range(k):
            r, st = refine_poses(
                mesh, targets, rots_bk[:, j], trans_bk[:, j],
                dino_params, dino_cfg, cfg_t, iters_per_launch,
                return_state=True,
            )
            results.append(r)
            states.append(st)
        losses = jnp.stack([r.final_loss for r in results], axis=1)  # (B, K)
        rots = jnp.stack(
            [G.rot6d_to_matrix(r.rot6d) for r in results], axis=1
        )  # (B, K, 3, 3)
        return results, states, losses, rots

    def final_select(rots, losses):
        if select == "viterbi":
            return _viterbi_select(rots, losses, smooth_weight)
        return jnp.argmin(losses, axis=1).astype(jnp.int32)

    results, states, losses, rots_ref = tournament(rot_inits_row, trans_inits)

    for _ in range(max(int(propagate_rounds), 0)):
        # Propagation seeds use the PER-FRAME argmin, not the Viterbi path:
        # the Viterbi winner is one consistent family for the whole
        # sequence, and seeding every frame from it would discard the
        # minority frames whose best-loss hypothesis disagrees — exactly
        # the frames that rescue the rest when the consistent family is
        # the wrong one.  Argmin seeding spreads each frame's own loss
        # evidence to its neighbours; the temporal prior enters only at
        # the FINAL selection below, once every frame has seen its
        # neighbours' candidates.
        win_np = np.asarray(jnp.argmin(losses, axis=1))
        rots_np = np.asarray(rots_ref, np.float32)  # (B, K, 3, 3)
        win_rot = rots_np[np.arange(b), win_np]  # (B, 3, 3)
        trans_all = jnp.stack(
            [r.translations[:, 0] for r in results], axis=1
        )  # (B, K, 3)
        win_trans = np.asarray(trans_all, np.float32)[np.arange(b), win_np]
        # Neighbour offsets 0, -1, +1, -2, +2, ... clamped to the sequence.
        offs = [0]
        d = 1
        while len(offs) < k:
            offs.append(-d)
            if len(offs) < k:
                offs.append(d)
            d += 1
        prop_rots = np.stack(
            [win_rot[np.clip(np.arange(b) + o, 0, b - 1)] for o in offs],
            axis=1,
        )  # (B, K, 3, 3) — rotation from the neighbour's winner,
        prop_trans = np.repeat(win_trans[:, None], k, axis=1)  # own trans
        results, states, losses, rots_ref = tournament(
            jnp.asarray(prop_rots), jnp.asarray(prop_trans)
        )

    win = final_select(rots_ref, losses)

    def pick(*xs):
        x0 = xs[0]
        if getattr(x0, "ndim", 0) == 0 or x0.shape[0] != b:
            return x0  # scalar leaves (Adam step count) are hypothesis-equal
        st = jnp.stack(xs, axis=1)  # (B, K, ...)
        idx = win.reshape((b,) + (1,) * (st.ndim - 1)).astype(jnp.int32)
        return jnp.take_along_axis(st, idx, axis=1)[:, 0]

    rem = total - t_iters
    if rem > 0:
        state_w = jax.tree.map(pick, states[0], *states[1:])
        cfg_r = dataclasses.replace(cfg, num_iterations=rem)
        res = refine_poses(
            mesh, targets, rot_inits_row[:, 0], trans_inits[:, 0],
            dino_params, dino_cfg, cfg_r, iters_per_launch,
            carry_state=state_w,
        )
    else:
        res = RefineResult(*jax.tree.map(pick, *[tuple(r) for r in results]))
    return MultiHypResult(res, win, losses)


@functools.partial(jax.jit, static_argnames=("dino_cfg", "cfg"))
def _refine_launch(
    mesh: MeshArrays,
    targets: FrameTargets,
    rot_init_row: Array,
    trans_init: Array,
    dino_params: dict[str, Any] | None,
    dino_cfg: dino_mod.DinoConfig | None,
    cfg: RefineConfig = RefineConfig(),
    carry_state=None,
) -> tuple[RefineResult, Any]:
    """One device launch of cfg.num_iterations Adam steps."""
    if trans_init.ndim == 2:
        trans_init = trans_init[:, None, :]
    if dino_params is not None and cfg.dino_dtype == "bfloat16":
        dino_params = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16), dino_params
        )

    def total_loss(p):
        def one(r6, t, tm, gf, K):
            return _frame_loss(
                r6, t, mesh, tm, gf, K, dino_params, dino_cfg, cfg
            )

        losses, ious, overflows = jax.vmap(one)(
            p["rot6d"], p["trans"], targets.target_masks, targets.gt_feats,
            targets.K_rois,
        )
        return losses.sum(), (losses, ious, overflows.max())

    opt = optax.adam(cfg.lr)
    if carry_state is None:
        params = {
            "rot6d": G.matrix_to_rot6d(rot_init_row),  # (B, 3, 2)
            "trans": trans_init.astype(jnp.float32),  # (B, 1, 3)
        }
        opt_state = opt.init(params)
    else:
        params, opt_state = carry_state

    def step(_, carry):
        params, opt_state, _, _, max_ov = carry
        (_, (losses, ious, ov)), grads = jax.value_and_grad(total_loss, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, losses, ious, jnp.maximum(max_ov, ov)

    b = rot_init_row.shape[0]
    init = (
        params, opt_state, jnp.zeros((b,)), jnp.zeros((b,)),
        jnp.zeros((), jnp.int32),
    )
    params, opt_state, losses, ious, max_ov = jax.lax.fori_loop(
        0, cfg.num_iterations, step, init
    )
    return (
        RefineResult(params["rot6d"], params["trans"], losses, ious, max_ov),
        (params, opt_state),
    )
