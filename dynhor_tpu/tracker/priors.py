"""Prior-view rendering + DINO scoring, fused per chunk (pure JAX).

Behavioral reference: ObjTracker/utils/render.py:125-285 (6,000 random or
azimuth x elevation x roll grid Phong renders of the template mesh at
384x384, distance 3.5 x radius) and pose_initializtion.py:188-246
(per-view square crop -> 256^2 -> DINO features) + :294-297 (masked cosine
scores of every frame against every prior view).

TPU re-design (this is NOT a transcription):
  * The reference renders all views (x100 chunks), spills images to CPU
    (render.py:272), re-uploads per view for cropping
    (pose_initializtion.py:197), stores 6000 x 1369 x 768 features on CPU
    ("save the memory") and computes the cosine on CPU per frame.  Here the
    whole chain render -> bbox -> ROI crop -> DINO -> cosine-vs-all-frames
    runs inside ONE jit as a lax.map over view chunks; only the (F, N)
    score matrix and the (N, 3, 3) rotations survive.  Nothing is
    materialized at 6000-scale.
  * Rendering happens in a reduced central WINDOW: the camera always looks
    at the mesh center from a fixed distance, so the silhouette lies in a
    known disc; rendering the enclosing window with a principal-point-
    shifted K is pixel-identical to the reference's full-frame render
    followed by cropping, at a fraction of the rasterization cost.
"""
from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any

import jax
import jax.numpy as jnp

from ..models import dino as dino_mod
from ..ops import rasterize as rz
from ..ops import silhouette  # noqa: F401  (re-exported for kernels tests)
from ..ops.resize import resize_nearest
from ..ops.roi_align import roi_align
from ..ops.shading import default_lights, phong_shade
from ..utils import bbox as bboxu
from ..utils import geometry as G

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class PriorConfig:
    """Prior rendering knobs (reference hard-codes most of these —
    SURVEY.md §5 'config system')."""

    num_views: int = 6000  # run.py:132
    render_h: int = 384  # constants.py:4
    render_w: int = 384
    distance_scale: float = 3.5  # run.py:133
    focal_ndc: float = 1.0  # PyTorch3D PerspectiveCameras default focal
    crop_size: int = 256  # constants.py:2 REND_SIZE
    bbox_expansion: float = 0.3  # constants.py:3
    view_chunk: int = 25
    face_chunk: int = 512
    # Per-tile face cap for the prior raster.  The object fills ~60% of the
    # window, so dense tiles hold ~700-800 candidates at 16-px tiles
    # (measured on the shoes mesh); 1280 leaves real headroom.  Overflow is
    # surfaced by prior_scores_and_rotations and warned on by the pipeline
    # (silently dropped faces corrupt prior images AND their DINO scores).
    max_faces_per_tile: int = 1280
    window: int | None = None  # auto from geometry if None
    grid: tuple[int, int, int] | None = None  # (azimuth, elevation, roll)
    # DINO compute dtype for prior/frame feature extraction (forward-only,
    # retrieval scores tolerate bf16; MXU fast path).
    dino_dtype: str = "bfloat16"


# Resolution of the silhouette-IoU retrieval channel (side of the square
# grid both the prior-view crop mask and the frame crop mask are nearest-
# downsampled to before the IoU).  Both crops are square boxes around the
# object's own tight bbox with the same expansion factor, so the IoU is a
# scale-normalized shape similarity; 32^2 cells resolve ~10-degree view
# changes on the demo meshes while costing one (F, P) x (C, P) matmul.
SIL_RES = 32


def mesh_radius_center(verts: Array) -> tuple[Array, Array]:
    """radius = max |coordinate| of the bbox; center = bbox center.

    Matches render.py:128-130 (bbox.abs().max(), bbox.mean(2)).
    """
    vmin = verts.min(axis=0)
    vmax = verts.max(axis=0)
    radius = jnp.maximum(jnp.abs(vmin), jnp.abs(vmax)).max()
    center = (vmin + vmax) / 2.0
    return radius, center


def mesh_norm_radius(verts: Array) -> Array:
    """Max vertex 2-norm from the bbox center (silhouette bound for
    compute_window)."""
    vmin = verts.min(axis=0)
    vmax = verts.max(axis=0)
    center = (vmin + vmax) / 2.0
    return jnp.linalg.norm(verts - center, axis=1).max()


def prior_camera(cfg: PriorConfig) -> Array:
    """Full-frame pixel intrinsics for prior renders (PyTorch3D NDC focal
    -> pixels: f = focal_ndc * min(H, W) / 2, principal at image center)."""
    f = cfg.focal_ndc * min(cfg.render_h, cfg.render_w) / 2.0
    return jnp.array(
        [[f, 0.0, cfg.render_w / 2.0], [0.0, f, cfg.render_h / 2.0], [0.0, 0.0, 1.0]],
        jnp.float32,
    )


def compute_window(cfg: PriorConfig, radius: float, distance: float) -> int:
    """Side of the central square window guaranteed to contain the
    silhouette plus bbox padding/expansion, rounded up to a multiple of 8.

    ``radius`` must BOUND the vertex 2-norm from the mesh center (use
    ``float(jnp.linalg.norm(verts - center, axis=1).max())``), NOT the
    per-axis bbox radius the camera-distance heuristic uses — per-axis
    underestimates the silhouette by up to sqrt(3) and would clip it.
    """
    f = cfg.focal_ndc * min(cfg.render_h, cfg.render_w) / 2.0
    if distance <= radius:
        return min(cfg.render_h, cfg.render_w)
    pix_r = f * radius / math.sqrt(max(distance**2 - radius**2, 1e-9))
    # +5 px bbox pad (run.py:37-40), x(1+expansion) square growth, margin.
    half = (pix_r + 8.0) * (1.0 + cfg.bbox_expansion) + 8.0
    side = int(math.ceil(2.0 * half / 8.0) * 8)
    return min(side, min(cfg.render_h, cfg.render_w))


def prior_view_rotations(key: Array, cfg: PriorConfig) -> Array:
    """World-to-camera rotations for all prior views (N, 3, 3).

    Random mode: uniform SO(3) (render.py:56-93 Avro'92).
    Grid mode: azimuth x elevation look-at grid with in-plane rolls
    (render.py:95-123,221-234).
    """
    if cfg.grid is None:
        return G.random_rotations(key, cfg.num_views)
    na, ne, nr = cfg.grid
    base = G.spherical_camera_rotations(na, ne)  # (na*ne+2, 3, 3)
    rolls = G.roll_matrices(nr)  # (nr, 3, 3)
    # Roll in the camera frame: R' = R_roll @ R.
    out = jnp.einsum("rij,njk->rnik", rolls, base).reshape(-1, 3, 3)
    return out


def _render_one_view(
    verts: Array,
    faces: Array,
    face_uvs: Array,
    texture: Array,
    R_cv: Array,
    t_cv: Array,
    K_win: Array,
    window: int,
    face_chunk: int,
    max_faces: int = 1280,
):
    """Render one prior view in the window.

    Returns (rgba (S,S,4), zbuf, overflow () int32) — overflow counts
    face-tile pairs dropped by the raster's static per-tile cap; nonzero
    means the prior image (and every DINO score derived from it) is
    corrupted, so callers must surface it."""
    verts_cam = verts @ R_cv.T + t_cv
    vn = rz.compute_vertex_normals(verts_cam, faces)
    vp = rz.project_perspective(verts_cam, K_win)
    if jax.default_backend() == "tpu":
        from ..ops.raster_pallas import rasterize_pallas

        frag, overflow = rasterize_pallas(
            vp, faces, (window, window), max_faces=max_faces
        )
    else:
        from ..ops.rasterize_tiled import bin_faces, rasterize_tiled

        frag = rasterize_tiled(vp, faces, (window, window), max_faces=max_faces)
        overflow = bin_faces(
            vp, faces, (window, window), max_faces=max_faces, margin=0.0
        ).overflow
    img = phong_shade(frag, faces, verts_cam, vn, face_uvs, texture, default_lights())
    return img, frag.zbuf, overflow


def _crop_view(rgba: Array, crop_size: int, bbox_expansion: float):
    """Mask-driven square crop of one rendered view.

    Mirrors pose_initializtion.py:199-218: tight bbox (+5 px) on the alpha
    mask, squared with expansion, ROI-cropped to crop_size; image pixels
    outside the mask turn white.

    Returns (crop_img (3,S,S), crop_mask (S,S) bool, box_xyxy (4,)).
    """
    mask = rgba[..., 3] > 0.5
    box = bboxu.mask_tight_bbox_xyxy(mask, pad=5.0)
    sq = bboxu.make_bbox_square(bboxu.bbox_xy_to_wh(box), bbox_expansion)
    sq_xyxy = bboxu.bbox_wh_to_xy(sq)
    img = rgba[..., :3].transpose(2, 0, 1)  # (3, S, S)
    crop_img = roi_align(img, sq_xyxy, crop_size)
    crop_mask = roi_align(mask[None].astype(jnp.float32), sq_xyxy, crop_size)[0] >= 0.5
    crop_img = jnp.where(crop_mask[None], crop_img, 1.0)
    return crop_img, crop_mask, sq_xyxy


def _dino_feats_of_crops(
    dino_params, dino_cfg, crop_imgs: Array, dtype: str = "bfloat16"
) -> Array:
    """(B,3,S,S) crops -> L2-normalized DINO patch tokens (B, P, D) f32.

    Mirrors pose_initializtion.py:224-226 (bicubic to 518, extract,
    F.normalize).  The ViT runs in ``dtype`` (bf16 default, forward-only).
    """
    # Fused resize(518)+ImageNet-normalize+patch-embed (models/dino.py
    # fused_patch_tokens): the upsampled image never materializes; the
    # embed matmul runs in the params' dtype (bf16 MXU path when cast).
    if dtype == "bfloat16":
        dino_params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), dino_params)
    feats = dino_mod.forward_tokens_from_crop(
        dino_params, crop_imgs, dino_cfg
    ).astype(jnp.float32)
    return feats / jnp.maximum(jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-6)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "dino_cfg", "window", "view_mesh", "with_sil"),
)
def prior_scores_and_rotations(
    dino_params: dict[str, Any],
    dino_cfg: dino_mod.DinoConfig,
    verts: Array,
    faces: Array,
    face_uvs: Array,
    texture: Array,
    view_rotations: Array,
    gt_feats: Array,
    cos_masks: Array,
    cfg: PriorConfig,
    window: int,
    view_mesh=None,
    with_sil: bool = False,
    sil_masks: Array | None = None,
) -> Array:
    """Fused prior pipeline: returns the (F, N) masked-cosine score matrix.

    Args:
      view_rotations: (N, 3, 3) world-to-camera rotations.
      gt_feats: (F, P, D) L2-normalized DINO features of the frame crops.
      cos_masks: (F, P) {0,1} object masks at DINO token resolution
        (pose_initializtion.py:290,294).
      window: static render window side (compute_window).
      view_mesh: optional jax.sharding.Mesh with a "views" axis — the
        per-chunk view axis is shard-constrained over it, so each device
        renders/DINO-encodes its own view slice and only the (F, N) score
        matrix is gathered (SURVEY.md §2.3 "views" parallel axis).
      with_sil: also return an (F, N) silhouette-IoU score matrix (crop
        masks nearest-downsampled to SIL_RES^2, IoU vs ``sil_masks``) —
        the shape-retrieval channel for multi-hypothesis initialization
        (tracker/selection.build_hypotheses).  Near-free: the crop masks
        already exist for the white-background composite.
      sil_masks: (F, SIL_RES^2) {0,1} frame masks (required iff with_sil).

    Returns (scores, overflow) or (scores, sil_scores, overflow).
    """
    if with_sil and sil_masks is None:
        raise ValueError("with_sil=True requires sil_masks")
    if cfg.dino_dtype == "bfloat16":
        # Cast once here (outside the view-chunk map; the in-function cast
        # below is then a no-op).
        dino_params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), dino_params)
    radius, center = mesh_radius_center(verts)
    distance = cfg.distance_scale * radius
    K_full = prior_camera(cfg)
    off_x = (cfg.render_w - window) / 2.0
    off_y = (cfg.render_h - window) / 2.0
    K_win = K_full - jnp.array(
        [[0.0, 0.0, off_x], [0.0, 0.0, off_y], [0.0, 0.0, 0.0]], jnp.float32
    )

    n = view_rotations.shape[0]
    chunk = cfg.view_chunk
    pad = (-n) % chunk
    Rs = jnp.concatenate([view_rotations, jnp.broadcast_to(jnp.eye(3), (pad, 3, 3))])
    n_chunks = Rs.shape[0] // chunk
    Rs = Rs.reshape(n_chunks, chunk, 3, 3)
    if view_mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        Rs = jax.lax.with_sharding_constraint(
            Rs, NamedSharding(view_mesh, PartitionSpec(None, "views", None, None))
        )

    cos_sum = cos_masks.sum(axis=1).clip(1e-6)  # (F,)

    def score_chunk(R_chunk: Array) -> Array:
        t = jnp.concatenate(
            [jnp.zeros((chunk, 2)), jnp.full((chunk, 1), distance)], axis=1
        ) - jnp.einsum("nij,j->ni", R_chunk, center)

        def one(Rc, tc):
            rgba, _, ov = _render_one_view(
                verts, faces, face_uvs, texture, Rc, tc, K_win, window,
                cfg.face_chunk, cfg.max_faces_per_tile,
            )
            crop_img, crop_mask, _ = _crop_view(
                rgba, cfg.crop_size, cfg.bbox_expansion
            )
            m_sil = resize_nearest(
                crop_mask.astype(jnp.float32), SIL_RES, SIL_RES
            ).reshape(-1)
            return crop_img, m_sil, ov

        crops, m_sils, ovs = jax.vmap(one)(R_chunk, t)  # (C,3,S,S),(C,P'),(C,)
        feats = _dino_feats_of_crops(
            dino_params, dino_cfg, crops, cfg.dino_dtype
        )  # (C, P, D)
        sim = jnp.einsum("fpd,cpd->fcp", gt_feats, feats)  # cosine per token
        masked = jnp.einsum("fcp,fp->fc", sim, cos_masks)
        sem = masked / cos_sum[:, None]  # (F, C)
        if with_sil:
            inter = jnp.einsum("fp,cp->fc", sil_masks, m_sils)
            union = (
                sil_masks.sum(1)[:, None] + m_sils.sum(1)[None, :] - inter
            )
            sil = inter / jnp.maximum(union, 1.0)
            return (sem, sil), ovs.max()
        return (sem,), ovs.max()

    out, ovs = jax.lax.map(score_chunk, Rs)  # each (n_chunks, F, C)
    f_frames = gt_feats.shape[0]
    mats = tuple(
        jnp.moveaxis(m, 0, 1).reshape(f_frames, -1)[:, :n] for m in out
    )
    return (*mats, ovs.max())


@functools.partial(jax.jit, static_argnames=("window", "tile", "margin", "chunk"))
def _max_tile_counts_chunk(
    verts, faces, R_chunk, t_chunk, K_win, window: int, tile: int = 16,
    margin: float = 3.0, chunk: int = 0,
):
    """Max per-tile candidate-face count over a chunk of views (no top_k)."""
    from ..ops.rasterize_tiled import max_tile_load

    def one(Rc, tc):
        vp = rz.project_perspective(verts @ Rc.T + tc, K_win)
        return max_tile_load(vp, faces, (window, window), tile, margin)

    return jax.lax.map(lambda rt: one(*rt), (R_chunk, t_chunk)).max()


def required_prior_cap(
    verts, faces, view_rotations, cfg: "PriorConfig", window: int,
    distance, center, chunk: int = 500, headroom: float = 1.05,
) -> int:
    """Smallest safe max_faces_per_tile for THESE views (rounded up to 128).

    Degenerate (edge-on) views can pack far more faces into one tile than
    any fixed default; counting candidates per tile for every view (cheap —
    one fused jit, no compaction) lets the scoring pipeline compile ONCE
    with a sufficient cap instead of overflow-and-retry.
    """
    K_full = prior_camera(cfg)
    off_x = (cfg.render_w - window) / 2.0
    off_y = (cfg.render_h - window) / 2.0
    K_win = K_full - jnp.array(
        [[0.0, 0.0, off_x], [0.0, 0.0, off_y], [0.0, 0.0, 0.0]], jnp.float32
    )
    n = view_rotations.shape[0]
    pad = (-n) % chunk
    # Pad with the LAST REAL view (not identity): padding views feed the
    # max-tile-load reduction, so synthetic poses must not be able to
    # inflate the counted cap (ADVICE r2).
    Rs = jnp.concatenate(
        [view_rotations, jnp.broadcast_to(view_rotations[-1], (pad, 3, 3))]
    ) if pad else view_rotations
    ts = jnp.concatenate(
        [jnp.zeros((Rs.shape[0], 2)), jnp.full((Rs.shape[0], 1), distance)], axis=1
    ) - jnp.einsum("nij,j->ni", Rs, jnp.asarray(center))
    worst = 0.0
    from ..utils.retry import retry_on_device_error

    for i in range(0, Rs.shape[0], chunk):
        c = retry_on_device_error(
            lambda i=i: jax.block_until_ready(_max_tile_counts_chunk(
                verts, faces, Rs[i : i + chunk], ts[i : i + chunk], K_win,
                window, margin=0.0,  # raster-only prior path bins at margin 0
            )),
            tag="prior-cap-count",
        )
        worst = max(worst, float(c))
    cap = int(-(-worst * headroom // 128) * 128)
    return max(128, min(cap, int(faces.shape[0])))


def prior_scores_batched(
    dino_params,
    dino_cfg,
    verts,
    faces,
    face_uvs,
    texture,
    view_rotations,
    gt_feats,
    cos_masks,
    cfg: PriorConfig,
    window: int,
    host_batch: int = 1000,
    view_mesh=None,
    with_sil: bool = False,
    sil_masks: Array | None = None,
):
    """prior_scores_and_rotations in host-side slices of ``host_batch`` views.

    One monolithic device program over all 6,000 views runs for minutes and
    trips the device watchdog on some TPU runtimes (observed as
    'UNAVAILABLE: TPU device error' mid-scoring).  Slicing at the host
    keeps each launch ~20 s; the jit is shape-stable so only the first
    slice compiles.

    Returns (F, N) scores, or (scores, sil_scores) when with_sil.
    """
    import numpy as np

    n = view_rotations.shape[0]
    host_batch = min(host_batch, n)
    # Pad to a multiple so every slice hits the same compiled shape — with
    # the LAST REAL view, not identity: the padded array feeds the counted
    # cap below, and synthetic poses must not inflate it (ADVICE r2).
    pad = (-n) % host_batch
    if pad:
        view_rotations = jnp.concatenate(
            [view_rotations, jnp.broadcast_to(view_rotations[-1], (pad, 3, 3))]
        )
    from ..utils.retry import retry_on_device_error

    def one_slice(i, cfg_l):
        *mats, ov = prior_scores_and_rotations(
            dino_params, dino_cfg, verts, faces, face_uvs, texture,
            view_rotations[i : i + host_batch], gt_feats, cos_masks, cfg_l, window,
            view_mesh=view_mesh, with_sil=with_sil, sil_masks=sil_masks,
        )
        return jax.block_until_ready((tuple(mats), ov))

    # Degenerate (edge-on) views can pack more faces into one tile than any
    # fixed cap; count candidates per tile across ALL views first (cheap, no
    # compaction) so scoring compiles once with a sufficient cap.  The
    # overflow-retry loop below remains as a backstop.
    f_total = int(faces.shape[0])
    radius, center = mesh_radius_center(verts)
    cap = required_prior_cap(
        verts, faces, view_rotations, cfg, window,
        float(cfg.distance_scale * radius), center,
    )
    if cap != cfg.max_faces_per_tile:
        print(f"prior rendering: per-tile face cap {cap} (counted)", flush=True)
    cfg_l = dataclasses.replace(cfg, max_faces_per_tile=cap)
    while True:
        outs = []
        max_ov = 0
        for i in range(0, n + pad, host_batch):
            mats, ov = retry_on_device_error(one_slice, i, cfg_l, tag="prior-scoring")
            outs.append(mats)
            max_ov = max(max_ov, int(ov))
        if max_ov == 0 or cfg_l.max_faces_per_tile >= f_total:
            break
        new_cap = min(cfg_l.max_faces_per_tile * 2, f_total)
        print(
            f"prior rendering: tile-bin overflow (max {max_ov} dropped) —"
            f" rerunning all views at max_faces_per_tile={new_cap}",
            flush=True,
        )
        cfg_l = dataclasses.replace(cfg_l, max_faces_per_tile=new_cap)
    if max_ov > 0:
        print(
            f"WARNING: tile-bin overflow in prior rendering persists at the"
            f" full-mesh cap ({max_ov} dropped) — scores may be corrupted",
            flush=True,
        )
    cat = tuple(
        jnp.concatenate([o[j] for o in outs], axis=1)[:, :n]
        for j in range(len(outs[0]))
    )
    return cat if with_sil else cat[0]


def prior_scores_two_stage(
    dino_params,
    dino_cfg,
    verts,
    faces,
    face_uvs,
    texture,
    view_rotations,
    crop_images,
    target_masks,
    gt_feats,
    cos_masks,
    cfg: PriorConfig,
    window: int,
    host_batch: int = 1000,
    prescreen_edge: int = 112,
    prescreen_scale: int = 2,
    topk: int = 24,
    view_mesh=None,
    with_sil: bool = False,
):
    """Two-stage prior retrieval: cheap prescreen of ALL views, full-res
    rescoring of the per-frame top-K union.

    The reference scores every one of the 6,000 prior views at full
    resolution (render 384² -> crop 256² -> DINO @518² -> masked cosine,
    pose_initializtion.py:188-246,294-297) even though the temporal gate
    only ever consumes each frame's top-5/10 candidates
    (pose_initializtion.py:298-321).  Measured round 2, that scan was HALF
    the end-to-end wall clock (78-80 s of 160 s).  TPU redesign:

      stage A  render every view at 1/``prescreen_scale`` window, DINO at
               ``prescreen_edge`` (8² tokens at the default 112 vs 37² —
               ~20x fewer ViT FLOPs,
               ~4x fewer raster pixels), full (F, N) cheap score matrix;
      stage B  full-res rescore of the union of per-frame top-``topk``
               prescreen candidates (a few hundred views, not 6,000);
      fill     non-rescored entries get per-frame affine-calibrated
               prescreen scores (least-squares fit of lo->hi on the
               rescored set), clamped strictly below the frame's rescored
               minimum — so the gate's top-k comes from full-res-scored
               views by construction, while its global statistics (max -
               std(ddof=1) re-acceptance bound, angle-closest-view score
               lookup, selection.py) stay on the full-res scale.

    Gate equivalence vs single-stage full-res scoring is asserted on the
    demo sequence in tests/test_priors_window.py and tools/ab_prescreen.py.

    Args:
      crop_images: (F, 3, S, S) frame crops in [0, 1] (needed to extract
        prescreen-resolution frame features).
      target_masks: (F, S, S) tri-valued masks.
      gt_feats/cos_masks: FULL-resolution frame features (stage B).
      with_sil: also return the (F, N) silhouette-IoU matrix (from the
        prescreen pass — the SIL_RES grid is render-resolution-independent,
        so prescreen sil scores serve hypothesis retrieval directly).

    Returns (F, N) scores on the full-res scale (+ sil scores if with_sil).
    """
    import numpy as np

    n = int(view_rotations.shape[0])
    f_frames = int(gt_feats.shape[0])
    sil_masks = None
    if with_sil:
        sil_masks = resize_nearest(
            (target_masks > 0).astype(jnp.float32), SIL_RES, SIL_RES
        ).reshape(f_frames, -1)
    # Prescreen only pays off when it prunes: below ~2 candidate sets'
    # worth of views, score everything at full res directly.
    if n <= 2 * topk * max(f_frames, 1) or n <= 4 * topk:
        return prior_scores_batched(
            dino_params, dino_cfg, verts, faces, face_uvs, texture,
            view_rotations, gt_feats, cos_masks, cfg, window, host_batch,
            view_mesh, with_sil=with_sil, sil_masks=sil_masks,
        )

    # ---- stage A: low-res prescreen of all N views ----
    cfg_lo = dataclasses.replace(
        cfg,
        render_h=cfg.render_h // prescreen_scale,
        render_w=cfg.render_w // prescreen_scale,
        crop_size=cfg.crop_size // prescreen_scale,
        # Per-view FLOPs shrink ~prescreen_scale^2 but the half-window
        # raster's counted per-tile cap RISES (denser tiles), so scale the
        # view batch by prescreen_scale only: better MXU utilization in the
        # prescreen ViT without risking raster-buffer OOM.
        view_chunk=cfg.view_chunk * prescreen_scale,
    )
    dino_cfg_lo = dataclasses.replace(
        dino_cfg, smaller_edge_size=prescreen_edge
    )
    radius, center = mesh_radius_center(verts)
    norm_r = float(mesh_norm_radius(verts))
    window_lo = compute_window(
        cfg_lo, norm_r, float(cfg_lo.distance_scale * radius)
    )
    gt_feats_lo, cos_masks_lo = frame_gt_features(
        dino_params, dino_cfg_lo, crop_images, target_masks, cfg.dino_dtype
    )
    out_lo = prior_scores_batched(
        dino_params, dino_cfg_lo, verts, faces, face_uvs, texture,
        view_rotations, gt_feats_lo, cos_masks_lo, cfg_lo, window_lo,
        host_batch, view_mesh, with_sil=with_sil, sil_masks=sil_masks,
    )
    scores_lo, sil_scores = out_lo if with_sil else (out_lo, None)
    scores_lo_np = np.asarray(scores_lo)

    # ---- stage B: full-res rescore of the per-frame top-K union ----
    k = min(topk, n)
    top_idx = np.argpartition(-scores_lo_np, k - 1, axis=1)[:, :k]
    idx = np.unique(top_idx.reshape(-1))
    sub = prior_scores_batched(
        dino_params, dino_cfg, verts, faces, face_uvs, texture,
        view_rotations[jnp.asarray(idx)], gt_feats, cos_masks, cfg, window,
        host_batch, view_mesh,
    )
    sub_np = np.asarray(sub)  # (F, |idx|)

    # ---- per-frame affine calibration of the non-rescored tail ----
    lo_sub = scores_lo_np[:, idx]
    lo_mu = lo_sub.mean(axis=1, keepdims=True)
    hi_mu = sub_np.mean(axis=1, keepdims=True)
    lo_c = lo_sub - lo_mu
    denom = (lo_c * lo_c).sum(axis=1, keepdims=True)
    a = np.where(
        denom > 1e-12, ((sub_np - hi_mu) * lo_c).sum(axis=1, keepdims=True)
        / np.maximum(denom, 1e-12), 1.0,
    )
    b = hi_mu - a * lo_mu
    scores = a * scores_lo_np + b
    # Clamp the fill strictly below each frame's rescored minimum: the gate's
    # top-k must come from full-res-scored views by CONSTRUCTION (an affine
    # estimate from a weakly-correlated prescreen must never outrank a real
    # score).  The prescreen already ranked these views below its top-K, so
    # the clamp encodes exactly that ordering; max/std statistics for the
    # re-acceptance bound (selection.py) stay on the full-res scale.
    scores = np.minimum(scores, sub_np.min(axis=1, keepdims=True) - 1e-4)
    scores[np.arange(f_frames)[:, None], idx[None, :]] = sub_np
    if with_sil:
        return jnp.asarray(scores), sil_scores
    return jnp.asarray(scores)


def render_mesh_opencv_pose(
    verts: Array,
    faces: Array,
    face_uvs: Array,
    texture: Array,
    R_cv: Array,
    t_cv: Array,
    K: Array,
    h: int,
    w: int,
    face_chunk: int = 512,
):
    """Render a mesh under an explicit OpenCV pose (parity surface for
    ObjTracker/utils/render.py:193-219 render_mesh_opencv_pose).

    Returns (rgba (H, W, 4), depth (H, W) with -1 background).
    """
    verts_cam = verts @ R_cv.T + t_cv
    vn = rz.compute_vertex_normals(verts_cam, faces)
    vp = rz.project_perspective(verts_cam, K)
    frag = rz.rasterize(vp, faces, (h, w), face_chunk=face_chunk)
    img = phong_shade(frag, faces, verts_cam, vn, face_uvs, texture, default_lights())
    return img, frag.zbuf


def frame_gt_features(
    dino_params, dino_cfg, crop_images: Array, target_masks: Array,
    dino_dtype: str = "bfloat16",
) -> tuple[Array, Array]:
    """Per-frame DINO features + token-resolution cosine masks.

    Mirrors pose_initializtion.py:286-294: crop image bicubic -> 518,
    extract + normalize; mask>0 nearest -> 37^2.

    Args:
      crop_images: (F, 3, S, S) in [0, 1].
      target_masks: (F, S, S) tri-valued {-1, 0, 1}.

    Returns: (gt_feats (F, P, D), cos_masks (F, P)).
    """
    feats = _dino_feats_of_crops(dino_params, dino_cfg, crop_images, dino_dtype)
    fs = dino_cfg.feat_size
    masks = resize_nearest((target_masks > 0).astype(jnp.float32), fs, fs)
    return feats, masks.reshape(masks.shape[0], -1)
