"""Hard z-buffer triangle rasterization (pure JAX, chunked; TPU-friendly).

Replaces PyTorch3D's ``MeshRasterizer`` (C++/CUDA) used for prior-view
rendering (ObjTracker/utils/render.py:125-156) and for the differentiable
textured render in the fine loss (pose_initializtion.py:409-419,169-170;
blur_radius=0, faces_per_pixel=1 — visibility is hard, gradients flow only
through barycentric interpolation and shading).

TPU design: no per-pixel triangle lists or dynamic binning (XLA needs
static shapes).  Instead a ``lax.scan`` over fixed-size face chunks keeps a
running (zmin, face_id) per pixel; each chunk is a dense (pixels x chunk)
coverage test on the VPU.  Everything vmaps over a batch/view axis, which
is how 6,000 prior views render as one jit (vs the reference's x100
chunked loop at render.py:261-268).

Convention: pixel (i, j) has center at continuous coords (j+0.5, i+0.5),
u right, v down, matching the projected pixel coordinates from
``project_perspective``.  Barycentrics are screen-space (PyTorch3D
perspective_correct=False default).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array

_BG_ZBUF = -1.0  # background zbuf value (PyTorch3D fragments.zbuf convention)


class Fragments(NamedTuple):
    pix_to_face: Array  # (H, W) int32, -1 where no face
    bary: Array  # (H, W, 3) screen-space barycentrics of the winning face
    zbuf: Array  # (H, W) camera-space depth, -1 background


def project_perspective(verts_cam: Array, K: Array) -> Array:
    """Camera-space verts -> (u_pix, v_pix, z_cam).

    Args:
      verts_cam: (..., V, 3), +z forward, y down (OpenCV).
      K: (..., 3, 3) pixel intrinsics.
    """
    z = verts_cam[..., 2:3]
    xy = verts_cam[..., :2] / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    fx = K[..., 0, 0][..., None]
    fy = K[..., 1, 1][..., None]
    cx = K[..., 0, 2][..., None]
    cy = K[..., 1, 2][..., None]
    u = fx * xy[..., 0] + cx
    v = fy * xy[..., 1] + cy
    return jnp.stack([u, v, verts_cam[..., 2]], axis=-1)


def _pad_faces(faces: Array, chunk: int) -> Array:
    f = faces.shape[0]
    pad = (-f) % chunk
    if pad:
        # Degenerate face (vertex 0 thrice): zero area, never wins a pixel.
        faces = jnp.concatenate([faces, jnp.zeros((pad, 3), faces.dtype)], axis=0)
    return faces


def _edge(ax, ay, bx, by, px, py):
    """Signed edge function: cross(b - a, p - a). Positive = p left of a->b."""
    return (bx - ax) * (py - ay) - (by - ay) * (px - ax)


@functools.partial(jax.jit, static_argnames=("image_size", "face_chunk"))
def rasterize(
    verts_pix: Array,
    faces: Array,
    image_size: tuple[int, int],
    face_chunk: int = 256,
    znear: float = 1e-2,
) -> Fragments:
    """Single-mesh hard rasterization.

    Args:
      verts_pix: (V, 3) projected (u, v, z) from project_perspective.
      faces: (F, 3) int32.
      image_size: (H, W), static.
      face_chunk: faces per scan step (memory knob), static.

    Returns: Fragments with (H, W) maps.
    """
    h, w = image_size
    p = h * w
    gx = (jnp.arange(w, dtype=jnp.float32) + 0.5)[None, :].repeat(h, 0).reshape(-1)
    gy = (jnp.arange(h, dtype=jnp.float32) + 0.5)[:, None].repeat(w, 1).reshape(-1)

    faces_p = _pad_faces(faces, face_chunk)
    n_chunks = faces_p.shape[0] // face_chunk
    face_verts = verts_pix[faces_p]  # (Fp, 3, 3)
    face_verts = face_verts.reshape(n_chunks, face_chunk, 3, 3)
    face_ids = jnp.arange(faces_p.shape[0], dtype=jnp.int32).reshape(n_chunks, face_chunk)

    def chunk_body(carry, inp):
        zbuf, fid = carry
        fv, ids = inp  # (FC, 3, 3), (FC,)
        x0, y0, z0 = fv[:, 0, 0], fv[:, 0, 1], fv[:, 0, 2]
        x1, y1, z1 = fv[:, 1, 0], fv[:, 1, 1], fv[:, 1, 2]
        x2, y2, z2 = fv[:, 2, 0], fv[:, 2, 1], fv[:, 2, 2]
        area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)  # (FC,)
        # Double-where: 1/area must not be EVALUATED at degenerate faces —
        # its backward is inf/NaN there even when the where discards it.
        degen = jnp.abs(area) < 1e-12
        inv_area = jnp.where(degen, 0.0, 1.0 / jnp.where(degen, 1.0, area))
        # (P, FC) edge functions -> signed barycentrics (sign-normalized by
        # the area so both windings rasterize).
        e12 = _edge(x1, y1, x2, y2, gx[:, None], gy[:, None])
        e20 = _edge(x2, y2, x0, y0, gx[:, None], gy[:, None])
        e01 = _edge(x0, y0, x1, y1, gx[:, None], gy[:, None])
        w0 = e12 * inv_area
        w1 = e20 * inv_area
        w2 = e01 * inv_area
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & (jnp.abs(area) > 1e-12)
        z = w0 * z0 + w1 * z1 + w2 * z2
        valid = inside & (z > znear)
        z = jnp.where(valid, z, jnp.inf)
        j = jnp.argmin(z, axis=1)  # (P,)
        zc = jnp.take_along_axis(z, j[:, None], axis=1)[:, 0]
        idc = ids[j]
        better = zc < zbuf
        return (jnp.where(better, zc, zbuf), jnp.where(better, idc, fid)), None

    init = (jnp.full((p,), jnp.inf), jnp.full((p,), -1, jnp.int32))
    (zbuf, fid), _ = jax.lax.scan(
        jax.checkpoint(chunk_body), init, (face_verts, face_ids)
    )

    hit = fid >= 0
    bary = barycentrics_at(verts_pix, faces_p, fid, gx, gy)
    return Fragments(
        pix_to_face=fid.reshape(h, w),
        bary=jnp.where(hit[:, None], bary, 0.0).reshape(h, w, 3),
        zbuf=jnp.where(hit, zbuf, _BG_ZBUF).reshape(h, w),
    )


def barycentrics_at(
    verts_pix: Array, faces: Array, pix_to_face: Array, gx: Array, gy: Array
) -> Array:
    """Differentiable screen-space barycentrics of the selected faces.

    Visibility (pix_to_face) is non-differentiable (hard raster), but given
    the winning face the barycentrics are smooth in the vertices — this is
    the gradient path of the reference's fine loss (PyTorch3D
    blur_radius=0, faces_per_pixel=1; pose_initializtion.py:409-419).

    Args:
      verts_pix: (V, 3).
      faces: (F, 3).
      pix_to_face: (P,) int32, may contain -1.
      gx, gy: (P,) pixel-center coords.

    Returns: (P, 3) barycentrics (unclamped, normalized).
    """
    fidx = jnp.clip(pix_to_face, 0, faces.shape[0] - 1)
    fv = verts_pix[faces[fidx]]  # (P, 3, 3)
    x0, y0 = fv[:, 0, 0], fv[:, 0, 1]
    x1, y1 = fv[:, 1, 0], fv[:, 1, 1]
    x2, y2 = fv[:, 2, 0], fv[:, 2, 1]
    area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
    degen = jnp.abs(area) < 1e-12  # double-where (see rasterize chunk body)
    inv_area = jnp.where(degen, 0.0, 1.0 / jnp.where(degen, 1.0, area))
    w0 = _edge(x1, y1, x2, y2, gx, gy) * inv_area
    w1 = _edge(x2, y2, x0, y0, gx, gy) * inv_area
    w2 = _edge(x0, y0, x1, y1, gx, gy) * inv_area
    return jnp.stack([w0, w1, w2], axis=-1)


def barycentrics_from_rows(
    rows_xy: Array, pix_to_face: Array, gx: Array, gy: Array
) -> Array:
    """``barycentrics_at`` from pre-packed per-face xy rows — ONE gather hop.

    Args:
      rows_xy: (F, C>=6) packed [x0 y0 x1 y1 x2 y2 ...] (differentiable;
        e.g. ops/raster_pallas' rows_all).  The chained
        verts_pix[faces[fidx]] gather in barycentrics_at costs as much as a
        raster kernel at production scale; this variant reuses the packing
        the fused raster already built.
      pix_to_face: (P,) int32, may contain -1.
      gx, gy: (P,) pixel-center coords.

    Returns: (P, 3) barycentrics (unclamped, normalized).
    """
    fidx = jnp.clip(pix_to_face, 0, rows_xy.shape[0] - 1)
    r = rows_xy[fidx]  # (P, C)
    x0, y0, x1, y1 = r[:, 0], r[:, 1], r[:, 2], r[:, 3]
    x2, y2 = r[:, 4], r[:, 5]
    area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
    degen = jnp.abs(area) < 1e-12  # double-where (see rasterize chunk body)
    inv_area = jnp.where(degen, 0.0, 1.0 / jnp.where(degen, 1.0, area))
    w0 = _edge(x1, y1, x2, y2, gx, gy) * inv_area
    w1 = _edge(x2, y2, x0, y0, gx, gy) * inv_area
    w2 = _edge(x0, y0, x1, y1, gx, gy) * inv_area
    return jnp.stack([w0, w1, w2], axis=-1)


def interpolate_attributes(fragments: Fragments, faces: Array, vert_attrs: Array) -> Array:
    """Barycentric interpolation of per-vertex attributes at hit pixels.

    Args:
      fragments: from rasterize (H, W maps).
      faces: (F, 3).
      vert_attrs: (V, D).

    Returns: (H, W, D); zeros at background.
    """
    h, w = fragments.pix_to_face.shape
    fid = fragments.pix_to_face.reshape(-1)
    bary = fragments.bary.reshape(-1, 3)
    fidx = jnp.clip(fid, 0, faces.shape[0] - 1)
    attrs = vert_attrs[faces[fidx]]  # (P, 3, D)
    out = jnp.einsum("pk,pkd->pd", bary, attrs)
    out = jnp.where((fid >= 0)[:, None], out, 0.0)
    return out.reshape(h, w, -1)


def interpolate_face_attributes(fragments: Fragments, face_attrs: Array) -> Array:
    """Like interpolate_attributes but with per-face-corner attrs (F, 3, D)."""
    h, w = fragments.pix_to_face.shape
    fid = fragments.pix_to_face.reshape(-1)
    bary = fragments.bary.reshape(-1, 3)
    fidx = jnp.clip(fid, 0, face_attrs.shape[0] - 1)
    attrs = face_attrs[fidx]  # (P, 3, D)
    out = jnp.einsum("pk,pkd->pd", bary, attrs)
    out = jnp.where((fid >= 0)[:, None], out, 0.0)
    return out.reshape(h, w, -1)


def compute_vertex_normals(verts: Array, faces: Array) -> Array:
    """Area-weighted vertex normals (PyTorch3D verts_normals semantics).

    Args:
      verts: (V, 3); faces: (F, 3).

    Returns: (V, 3) unit normals.
    """
    v0 = verts[faces[:, 0]]
    v1 = verts[faces[:, 1]]
    v2 = verts[faces[:, 2]]
    fn = jnp.cross(v1 - v0, v2 - v0)  # magnitude = 2*area
    vn = jnp.zeros_like(verts)
    vn = vn.at[faces[:, 0]].add(fn)
    vn = vn.at[faces[:, 1]].add(fn)
    vn = vn.at[faces[:, 2]].add(fn)
    # Double-where normalization: vertices whose incident faces are all
    # degenerate (mesh-pad faces, UV-sphere poles) have EXACTLY zero
    # normals; naive eps tricks either NaN the VJP (d|v|/dv at 0) or blow
    # up gradients (1/eps scale).  Unsafe rows get normal 0 with a clean
    # zero gradient.
    n2 = jnp.sum(vn * vn, axis=-1, keepdims=True)
    safe = n2 > 1e-12
    n2_safe = jnp.where(safe, n2, 1.0)
    return jnp.where(safe, vn / jnp.sqrt(n2_safe), 0.0)
