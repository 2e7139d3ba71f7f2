"""DKM-correspondence outlier voting on pose trajectories.

Capability target (SURVEY.md §2.4, BASELINE.json config #2): the reference
README ships DKM dense correspondences "for reconstruction and
outlier-voting" (README.md:43); the voting code itself is unreleased, so
this is designed from the stated purpose:

  1. For every correspondence pair (i, j): lift the matched pixels of
     frame i to 3D via the posed mesh's rendered depth, reproject into
     frame j with frame j's pose, and score the pair by the MEDIAN
     reprojection error against the matched pixels (median -> robust to
     bad matches).
  2. Voting: a frame's score is the MIN of its pair errors; frames whose
     score exceeds ``threshold_px`` are outliers.  Rationale: a bad frame
     corrupts ALL its pairs (its best pair is still bad), while a good
     frame adjacent to a bad one keeps at least one clean pair — the min
     cannot be dragged up by corrupted partners.
  3. Repair: outlier poses are replaced by SLERP/linear interpolation
     between the nearest inlier neighbors, optionally followed by a
     re-refine with the repaired init (pipeline hook).

All geometry is jit-compiled; the voting itself is tiny host numpy.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..neus.trainer import CorrData
from ..ops import rasterize as rz
from ..ops.rasterize_tiled import rasterize_tiled
from ..utils import geometry as G

Array = jax.Array


@functools.partial(jax.jit, static_argnames=("image_hw", "max_faces"))
def _frame_depths(
    verts: Array, faces: Array, R_rows: Array, Ts: Array, K: Array,
    image_hw: tuple[int, int], max_faces: int = 2048,
) -> Array:
    """Rendered z-buffers for all frames (F, H, W); -1 where no surface."""

    def one(R, t):
        vc = verts @ R + t
        vp = rz.project_perspective(vc, K)
        frag = rasterize_tiled(vp, faces, image_hw, max_faces=max_faces)
        return frag.zbuf

    return jax.vmap(one)(R_rows, Ts)


@jax.jit
def _pair_errors(
    depths: Array, R_rows: Array, Ts: Array, K: Array, corr: CorrData
) -> tuple[Array, Array]:
    """Per-match reprojection error (M,) and validity (M,) (surface hit)."""
    fi, fj = corr.frame_i, corr.frame_j
    xy_i = corr.xy_i
    xi = jnp.clip(xy_i[:, 0].astype(jnp.int32), 0, depths.shape[2] - 1)
    yi = jnp.clip(xy_i[:, 1].astype(jnp.int32), 0, depths.shape[1] - 1)
    z = depths[fi, yi, xi]
    valid = z > 0
    # Backproject pixel (frame i, camera space), lift to object space.
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    x_cam = (xy_i[:, 0] - cx) / fx * z
    y_cam = (xy_i[:, 1] - cy) / fy * z
    p_cam_i = jnp.stack([x_cam, y_cam, z], axis=-1)
    Ri = R_rows[fi]
    p_obj = jnp.einsum("nj,nkj->nk", p_cam_i - Ts[fi], Ri)  # R^T = inverse (row conv)
    # Project into frame j.
    p_cam_j = jnp.einsum("nj,njk->nk", p_obj, R_rows[fj]) + Ts[fj]
    u = fx * p_cam_j[:, 0] / jnp.maximum(p_cam_j[:, 2], 1e-6) + cx
    v = fy * p_cam_j[:, 1] / jnp.maximum(p_cam_j[:, 2], 1e-6) + cy
    err = jnp.linalg.norm(jnp.stack([u, v], -1) - corr.xy_j, axis=-1)
    return err, valid


class OutlierReport(NamedTuple):
    frame_scores: np.ndarray  # (F,) min-of-pairs reprojection error (px)
    outliers: np.ndarray  # (F,) bool
    pair_errors: dict  # (i, j) -> median error over the pair's matches


def vote_outliers(
    verts: Array,
    faces: Array,
    R_rows: Array,
    Ts: Array,
    K: Array,
    corr: CorrData,
    image_hw: tuple[int, int],
    threshold_px: float = 8.0,
) -> OutlierReport:
    """Score every frame by correspondence reprojection consistency."""
    f_frames = R_rows.shape[0]
    depths = _frame_depths(verts, faces, jnp.asarray(R_rows), jnp.asarray(Ts), jnp.asarray(K), image_hw)
    err, valid = _pair_errors(depths, jnp.asarray(R_rows), jnp.asarray(Ts), jnp.asarray(K), corr)
    err = np.asarray(err)
    valid = np.asarray(valid)
    fi = np.asarray(corr.frame_i)
    fj = np.asarray(corr.frame_j)

    pair_errors: dict = {}
    votes: dict[int, list[float]] = {i: [] for i in range(f_frames)}
    for (a, b) in {(int(x), int(y)) for x, y in zip(fi, fj)}:
        sel = (fi == a) & (fj == b) & valid
        if sel.sum() < 4:
            continue
        med = float(np.median(err[sel]))
        pair_errors[(a, b)] = med
        votes[a].append(med)
        votes[b].append(med)

    scores = np.full(f_frames, np.nan)
    for i, v in votes.items():
        if v:
            scores[i] = float(np.min(v))
    outliers = np.zeros(f_frames, bool)
    known = ~np.isnan(scores)
    outliers[known] = scores[known] > threshold_px
    return OutlierReport(scores, outliers, pair_errors)


def interpolate_poses(
    R_rows: np.ndarray, Ts: np.ndarray, outliers: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Replace outlier poses by SLERP / linear interpolation between the
    nearest inlier neighbors (endpoint outliers copy the nearest inlier)."""
    f = len(R_rows)
    inlier_idx = np.nonzero(~outliers)[0]
    if len(inlier_idx) == 0 or not outliers.any():
        return np.asarray(R_rows).copy(), np.asarray(Ts).copy()
    quats = np.asarray(G.matrix_to_quaternion(jnp.asarray(R_rows)))
    R_out = np.asarray(R_rows).copy()
    T_out = np.asarray(Ts).copy()
    for i in np.nonzero(outliers)[0]:
        before = inlier_idx[inlier_idx < i]
        after = inlier_idx[inlier_idx > i]
        if len(before) and len(after):
            a, b = int(before[-1]), int(after[0])
            t = (i - a) / (b - a)
            q = np.asarray(
                G.quaternion_slerp(jnp.asarray(quats[a]), jnp.asarray(quats[b]), jnp.float32(t))
            )
            R_out[i] = np.asarray(G.quaternion_to_matrix(jnp.asarray(q)))
            T_out[i] = (1 - t) * Ts[a] + t * Ts[b]
        else:
            src = int(before[-1]) if len(before) else int(after[0])
            R_out[i] = R_rows[src]
            T_out[i] = Ts[src]
    return R_out, T_out
