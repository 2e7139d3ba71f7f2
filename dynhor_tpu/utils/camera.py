"""Intrinsics / pose algebra (pure JAX).

Behavioral reference: ObjTracker/utils/camera.py.

All functions are jit/vmap-safe (static shapes, no Python branching on
traced values).  Vertices are row vectors: world-to-camera is
``verts @ R_row + T`` where ``R_row = R_cv^T`` (see utils/geometry.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def batch_proj2d(verts: Array, K: Array) -> Array:
    """Pinhole projection of camera-space points to pixels.

    Matches ObjTracker/utils/camera.py:18-24 (without extrinsics).

    Args:
      verts: (..., V, 3) camera-space points.
      K: (..., 3, 3) intrinsics.

    Returns: (..., V, 2) pixel coordinates.
    """
    hom = jnp.einsum("...ij,...vj->...vi", K, verts)
    return hom[..., :2] / hom[..., 2:]


def project_ndc(
    verts_cam: Array,
    K01: Array,
    eps: float = 1e-9,
    dist_coeffs: Array | None = None,
) -> Array:
    """Project camera-space verts with a [0,1]-normalized K to nr-style NDC.

    Matches neural_renderer's projection as used by the reference with
    ``orig_size=1`` (ObjTracker/utils/camera.py:26-63,
    pose_initializtion.py:126-132): perspective divide, optional
    radial/tangential lens distortion, K in [0,1] units, y flip, then map
    to [-1, 1].

    Args:
      verts_cam: (..., V, 3).
      K01: (..., 3, 3) intrinsics normalized so the image spans [0, 1].
      dist_coeffs: optional (..., 5) OpenCV-style (k1, k2, p1, p2, k3)
        distortion coefficients (reference camera.py:45-56; it runs with
        all-zero coefficients in the released pipeline — SURVEY.md §2 C9).

    Returns: (..., V, 3) — (u, v) in [-1, 1] (y up) and camera-space depth z.
    """
    x = verts_cam[..., 0]
    y = verts_cam[..., 1]
    z = verts_cam[..., 2]
    x_ = x / (z + eps)
    y_ = y / (z + eps)
    if dist_coeffs is not None:
        d = jnp.asarray(dist_coeffs, verts_cam.dtype)
        k1, k2 = d[..., 0:1], d[..., 1:2]
        p1, p2 = d[..., 2:3], d[..., 3:4]
        k3 = d[..., 4:5]
        r2 = x_ * x_ + y_ * y_
        radial = 1.0 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2
        x_d = x_ * radial + 2.0 * p1 * x_ * y_ + p2 * (r2 + 2.0 * x_ * x_)
        y_d = y_ * radial + p1 * (r2 + 2.0 * y_ * y_) + 2.0 * p2 * x_ * y_
        x_, y_ = x_d, y_d
    ones = jnp.ones_like(z)
    v3 = jnp.stack([x_, y_, ones], axis=-1)
    uv1 = jnp.einsum("...ij,...vj->...vi", K01, v3)
    u = uv1[..., 0]
    v = 1.0 - uv1[..., 1]
    u = 2.0 * (u - 0.5)
    v = 2.0 * (v - 0.5)
    return jnp.stack([u, v, z], axis=-1)


def get_K_crop_resize(K: Array, boxes_xyxy: Array, crop_size: int) -> Array:
    """Intrinsics after cropping to ``boxes_xyxy`` and resizing to square.

    Matches ObjTracker/utils/camera.py:84-130 (BerkeleyAutomation
    perception convention, half-pixel-centered).

    Args:
      K: (..., 3, 3).
      boxes_xyxy: (..., 4) crop box (x1, y1, x2, y2) in source pixels.
      crop_size: output side length in pixels (static).

    Returns: (..., 3, 3) new intrinsics.
    """
    K = K.astype(jnp.float32)
    boxes = boxes_xyxy.astype(jnp.float32)
    final = jnp.float32(crop_size)
    crop_w = boxes[..., 2] - boxes[..., 0]
    crop_h = boxes[..., 3] - boxes[..., 1]
    crop_cj = (boxes[..., 0] + boxes[..., 2]) / 2.0
    crop_ci = (boxes[..., 1] + boxes[..., 3]) / 2.0

    cx = K[..., 0, 2] + (crop_w - 1.0) / 2.0 - crop_cj
    cy = K[..., 1, 2] + (crop_h - 1.0) / 2.0 - crop_ci

    center_x = (crop_w - 1.0) / 2.0
    center_y = (crop_h - 1.0) / 2.0
    scale_x = final / crop_w
    scale_y = final / crop_h
    scaled_center = (final - 1.0) / 2.0
    fx = scale_x * K[..., 0, 0]
    fy = scale_y * K[..., 1, 1]
    new_cx = scaled_center + scale_x * (cx - center_x)
    new_cy = scaled_center + scale_y * (cy - center_y)

    zeros = jnp.zeros_like(fx)
    ones = jnp.ones_like(fx)
    row0 = jnp.stack([fx, zeros, new_cx], axis=-1)
    row1 = jnp.stack([zeros, fy, new_cy], axis=-1)
    row2 = jnp.stack([zeros, zeros, ones], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def tco_init_from_boxes_autodepth(
    boxes_xywh: Array, model_points_3d: Array, K: Array, num_iters: int = 10
) -> Array:
    """BOP-style translation init: fit depth so the projected bbox diagonal
    matches the detection bbox diagonal; 10 fixed-point iterations.

    Matches ObjTracker/utils/camera.py:132-176
    (TCO_init_from_boxes_zup_autodepth).

    Args:
      boxes_xywh: (..., 4) detection box in xywh pixels.
      model_points_3d: (..., V, 3) rotated (camera-aligned) model points.
      K: (..., 3, 3) intrinsics.

    Returns: (..., 3) translation.
    """
    b = boxes_xywh
    boxes = jnp.stack(
        [b[..., 0], b[..., 1], b[..., 0] + b[..., 2], b[..., 1] + b[..., 3]], axis=-1
    )
    diag_bb = jnp.linalg.norm(boxes[..., 2:4] - boxes[..., 0:2], axis=-1)
    bb_centers = (boxes[..., 0:2] + boxes[..., 2:4]) / 2.0
    fxfy = jnp.stack([K[..., 0, 0], K[..., 1, 1]], axis=-1)
    cxcy = jnp.stack([K[..., 0, 2], K[..., 1, 2]], axis=-1)

    z = jnp.ones(b.shape[:-1] + (1,), dtype=model_points_3d.dtype)
    xy = (bb_centers - cxcy) * z / fxfy

    def body(_, carry):
        xy, z = carry
        trans = jnp.concatenate([xy, z], axis=-1)
        pts = model_points_3d + trans[..., None, :]
        proj = batch_proj2d(pts, K)
        pmin = jnp.min(proj, axis=-2)
        pmax = jnp.max(proj, axis=-2)
        # NOTE: reference computes (min - max).norm == (max - min).norm.
        diag_proj = jnp.linalg.norm(pmax - pmin, axis=-1)
        centers = (pmin + pmax) / 2.0
        z_new = z + z * (diag_proj / diag_bb - 1.0)[..., None]
        xy_new = xy + (bb_centers - centers) * z_new / fxfy
        return xy_new, z_new

    xy, z = jax.lax.fori_loop(0, num_iters, body, (xy, z))
    return jnp.concatenate([xy, z], axis=-1)


def transform_verts(
    verts: Array, rotations_row: Array, translations: Array, scale: Array | None = None
) -> Array:
    """``scale * verts @ R_row + T`` (row-vector convention).

    Matches ObjTracker/utils/camera.py:179-207 (compute_transformation_persp)
    and pose_initializtion.py:112-117 (apply_transformation).

    Args:
      verts: (V, 3) or (..., V, 3).
      rotations_row: (..., 3, 3) row-convention rotations.
      translations: (..., 3) or (..., 1, 3).
      scale: optional (...,) intrinsic scale.

    Returns: (..., V, 3).
    """
    if translations.ndim == rotations_row.ndim:  # (..., 1, 3)
        translations = translations[..., 0, :]
    if scale is not None:
        verts = scale[..., None, None] * verts
    return jnp.einsum("...vj,...jk->...vk", verts, rotations_row) + translations[..., None, :]


def intrinsics_from_image(height: int, width: int, focal_factor: float = 1.2) -> jnp.ndarray:
    """Synthesized pinhole intrinsics: f = focal_factor*min(h,w), c = (w//2, h//2).

    Matches ObjTracker/run.py:119-123 and vis.py:36-37.
    """
    focal = focal_factor * min(height, width)
    return jnp.array(
        [[focal, 0.0, width // 2], [0.0, focal, height // 2], [0.0, 0.0, 1.0]],
        dtype=jnp.float32,
    )
