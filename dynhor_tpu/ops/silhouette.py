"""Differentiable soft silhouette rasterizer (pure JAX, chunked scan).

Replaces neural_renderer's CUDA silhouette rasterizer + hand-written
backward (reference: ``nr.renderer.Renderer(..., mode='silhouettes')`` at
ObjTracker/pose_initializtion.py:98-105,146-147,160 and utils/losses.py:36-40,68).

TPU design: instead of a hard rasterizer with a bespoke visibility
backward (neural_renderer's approach — inherently scatter/atomic-heavy and
a poor fit for the MXU/VPU), we use SoftRas-style soft coverage
(Liu et al., ICCV'19): each face contributes a sigmoid of its signed
squared distance to the pixel, faces aggregate by probabilistic union.
The forward is smooth, the backward is plain autodiff through elementwise
VPU math — no atomics, no sorting, static shapes.  As sigma -> 0 the soft
mask converges to the hard silhouette, so converged poses match the
hard-edge reference within tolerance (SURVEY.md §7 "hard parts").

The probabilistic union 1 - prod_f (1 - p_f) is computed in log space:
log(1 - sigmoid(x)) = -softplus(x), so a scan over face chunks accumulates
sum_f softplus(logit_f) per pixel — one (pixels,) carry, O(chunk) memory,
rematerialized backward.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


def _point_segment_dist2(px, py, ax, ay, bx, by, eps=1e-12):
    """Squared distance from point p to segment a-b. All (..., ) broadcastable."""
    abx = bx - ax
    aby = by - ay
    apx = px - ax
    apy = py - ay
    denom = abx * abx + aby * aby
    t = jnp.clip((apx * abx + apy * aby) / jnp.maximum(denom, eps), 0.0, 1.0)
    dx = apx - t * abx
    dy = apy - t * aby
    return dx * dx + dy * dy


@functools.partial(
    jax.jit, static_argnames=("image_size", "face_chunk", "dist_mode")
)
def soft_silhouette(
    verts_pix: Array,
    faces: Array,
    image_size: tuple[int, int],
    sigma: float = 0.25,
    face_chunk: int = 512,
    znear: float = 1e-2,
    dist_mode: str = "linear",
) -> Array:
    """Soft silhouette in [0, 1].

    Args:
      verts_pix: (V, 3) projected (u_pix, v_pix, z_cam) — see
        ops.rasterize.project_perspective.  Gradients flow to these.
      faces: (F, 3) int32.
      image_size: (H, W), static.
      sigma: edge softness.  With dist_mode="linear" (default) the logit is
        ``signed_d / sigma`` — the sigmoid then approximates true
        antialiased pixel coverage (slope 1/(4 sigma) per px at the edge;
        sigma=0.25 matches the ideal 1 px linear ramp), which keeps the
        soft optimum unbiased w.r.t. the hard silhouette.  dist_mode=
        "squared" is the original SoftRas ``sign * d^2 / sigma`` (flat at
        the edge; biases object scale/depth slightly — kept for ablation).
      face_chunk: faces per scan step (memory knob), static.
      znear: faces entirely behind this depth are dropped.

    Returns: (H, W) float32 coverage.
    """
    h, w = image_size
    p = h * w
    gx = (jnp.arange(w, dtype=jnp.float32) + 0.5)[None, :].repeat(h, 0).reshape(-1)
    gy = (jnp.arange(h, dtype=jnp.float32) + 0.5)[:, None].repeat(w, 1).reshape(-1)

    f = faces.shape[0]
    pad = (-f) % face_chunk
    if pad:
        faces = jnp.concatenate([faces, jnp.zeros((pad, 3), faces.dtype)], axis=0)
    n_chunks = faces.shape[0] // face_chunk
    face_verts = verts_pix[faces].reshape(n_chunks, face_chunk, 3, 3)
    # Padded faces are degenerate (zero area) and are masked out below via
    # the real-face mask.
    real = (jnp.arange(faces.shape[0]) < f).reshape(n_chunks, face_chunk)

    inv_sigma = 1.0 / sigma

    def chunk_body(carry, inp):
        acc = carry  # (P,) accumulated softplus mass
        fv, real_mask = inp
        x0, y0, z0 = fv[:, 0, 0], fv[:, 0, 1], fv[:, 0, 2]
        x1, y1, z1 = fv[:, 1, 0], fv[:, 1, 1], fv[:, 1, 2]
        x2, y2, z2 = fv[:, 2, 0], fv[:, 2, 1], fv[:, 2, 2]
        area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
        degen = jnp.abs(area) < 1e-12  # double-where: no 1/0 in backward
        inv_area = jnp.where(degen, 0.0, 1.0 / jnp.where(degen, 1.0, area))
        px = gx[:, None]
        py = gy[:, None]
        # Signed inside test via sign-normalized barycentrics (both windings).
        w0 = ((x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)) * inv_area
        w1 = ((x0 - x2) * (py - y2) - (y0 - y2) * (px - x2)) * inv_area
        w2 = ((x1 - x0) * (py - y0) - (y1 - y0) * (px - x0)) * inv_area
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & (jnp.abs(area) > 1e-12)
        sign = jnp.where(inside, 1.0, -1.0)
        d2 = jnp.minimum(
            _point_segment_dist2(px, py, x0, y0, x1, y1),
            jnp.minimum(
                _point_segment_dist2(px, py, x1, y1, x2, y2),
                _point_segment_dist2(px, py, x2, y2, x0, y0),
            ),
        )
        if dist_mode == "linear":
            logit = sign * jnp.sqrt(jnp.maximum(d2, 1e-12)) * inv_sigma
        else:  # "squared" (SoftRas)
            logit = sign * d2 * inv_sigma
        # Faces behind the camera, padded, or degenerate (zero area — e.g.
        # multi-sequence mesh padding uses (0,0,0) faces) do not contribute;
        # a degenerate face otherwise adds mass near its collapsed point.
        visible = (
            real_mask
            & ((z0 > znear) | (z1 > znear) | (z2 > znear))
            & (jnp.abs(area) > 1e-12)
        )
        mass = jnp.where(visible[None, :], jax.nn.softplus(logit), 0.0)
        return acc + mass.sum(axis=1), None

    acc, _ = jax.lax.scan(
        jax.checkpoint(chunk_body), jnp.zeros((p,)), (face_verts, real)
    )
    return (1.0 - jnp.exp(-acc)).reshape(h, w)


def silhouette_straight_through(
    verts_pix: Array,
    faces: Array,
    image_size: tuple[int, int],
    hard: Array | None = None,
    sigma: float = 0.25,
    face_chunk: int = 512,
) -> Array:
    """Hard silhouette forward, soft silhouette backward (straight-through).

    The soft union dips to ~0.75 in a sub-pixel band along interior mesh
    edges (two adjacent faces each contribute ~0.5 there) — harmless for
    gradients but a forward-value mismatch vs the reference's hard
    neural_renderer mask.  This wrapper returns the exact hard coverage in
    the forward pass while routing gradients through the soft rasterizer:
    ``soft + stop_grad(hard - soft)``.

    Args:
      hard: optional precomputed (H, W) hard coverage (e.g. from the same
        ops.rasterize fragments the textured render uses — free reuse).
    """
    soft = soft_silhouette(
        verts_pix, faces, image_size, sigma=sigma, face_chunk=face_chunk
    )
    if hard is None:
        from .rasterize import rasterize

        frag = rasterize(verts_pix, faces, image_size, face_chunk=face_chunk)
        hard = (frag.pix_to_face >= 0).astype(soft.dtype)
    return soft + jax.lax.stop_gradient(hard - soft)
