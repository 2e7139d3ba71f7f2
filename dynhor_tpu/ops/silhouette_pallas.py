"""Pallas TPU kernel: fused tile-binned soft silhouette with custom VJP.

The XLA tiled implementation (ops/rasterize_tiled.py) streams (tiles,
pixels, faces) temporaries through HBM; this kernel keeps each tile's
face list and the (pixels x faces) intermediates in VMEM, writing only the
(pixels,) mass vector — the op becomes VPU-compute-bound instead of
HBM-bound.

Layout: faces are packed per tile as ROWS of a (T, 8, M) tensor
(x0 y0 x1 y1 x2 y2 visible pad) so the face axis M sits on the 128-wide
lane dimension; the (P x M) broadcasts happen entirely in VMEM.

The backward pass is a second Pallas kernel evaluating a hand-derived
analytic VJP of the per-tile mass (_tile_mass_grad_analytic — exact vs
autodiff, verified in f64; no jax.vjp re-trace, no scatter); the
face-gather upstream stays in XLA, whose transpose handles the verts
scatter-add.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rasterize_tiled import bin_faces

Array = jax.Array


def _tile_mass(rows: Array, px: Array, py: Array, sigma: float, dist_mode: str) -> Array:
    """Per-tile softplus mass.

    Args:
      rows: (8, M) packed face rows [x0 y0 x1 y1 x2 y2 vis pad].
      px, py: (P, 1) pixel-center coordinates.

    Returns: (P,) mass = sum_f softplus(logit_f).
    """
    x0, y0 = rows[0][None, :], rows[1][None, :]
    x1, y1 = rows[2][None, :], rows[3][None, :]
    x2, y2 = rows[4][None, :], rows[5][None, :]
    vis = rows[6][None, :]

    area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
    degen = jnp.abs(area) < 1e-12  # double-where: no 1/0 in backward
    inv_area = jnp.where(degen, 0.0, 1.0 / jnp.where(degen, 1.0, area))
    w0 = ((x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)) * inv_area
    w1 = ((x0 - x2) * (py - y2) - (y0 - y2) * (px - x2)) * inv_area
    w2 = ((x1 - x0) * (py - y0) - (y1 - y0) * (px - x0)) * inv_area
    inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & (jnp.abs(area) > 1e-12)
    sign = jnp.where(inside, 1.0, -1.0)

    def seg_d2(ax, ay, bx, by):
        abx = bx - ax
        aby = by - ay
        apx = px - ax
        apy = py - ay
        denom = abx * abx + aby * aby
        t = jnp.clip((apx * abx + apy * aby) / jnp.maximum(denom, 1e-12), 0.0, 1.0)
        dx = apx - t * abx
        dy = apy - t * aby
        return dx * dx + dy * dy

    d2 = jnp.minimum(
        seg_d2(x0, y0, x1, y1), jnp.minimum(seg_d2(x1, y1, x2, y2), seg_d2(x2, y2, x0, y0))
    )
    if dist_mode == "linear":
        logit = sign * jnp.sqrt(jnp.maximum(d2, 1e-12)) / sigma
    else:
        logit = sign * d2 / sigma
    visible = (vis > 0.5) & (jnp.abs(area) > 1e-12)  # exclude degenerate faces
    mass = jnp.where(visible, jax.nn.softplus(logit), 0.0)
    return mass.sum(axis=1)


def _tile_mass_grad_analytic(
    rows: Array, px: Array, py: Array, g: Array, sigma: float, dist_mode: str
) -> Array:
    """Hand-derived VJP of ``_tile_mass`` w.r.t. ``rows`` (one pass, all M).

    The jax.vjp-in-kernel backward re-traces the forward per 128-face chunk
    because vjp residuals (~25 (P, M) primals) exceed VMEM; the analytic
    form needs only a handful of live (P, M) temporaries, so the whole face
    axis fits in one pass (~2-3x faster backward).

    Math: mass = sum_f vis_f . softplus(logit_f); the only differentiable
    path is logit <- d2 <- min over 3 point-segment distances.  For segment
    (a, b) with clipped projection t, the envelope theorem (interior t is
    the minimizer; boundary t is constant) gives
        dd2/da = 2(t-1).(dx, dy),   dd2/db = -2t.(dx, dy)
    which matches autodiff exactly away from ties/degeneracies (masked).

    Args:
      rows: (8, M) packed face rows; g: (P, 1) upstream cotangent d/dmass.

    Returns: (8, M) cotangent (vis/pad rows zero).
    """
    x0, y0 = rows[0][None, :], rows[1][None, :]
    x1, y1 = rows[2][None, :], rows[3][None, :]
    x2, y2 = rows[4][None, :], rows[5][None, :]
    vis = rows[6][None, :]

    area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
    degen = jnp.abs(area) < 1e-12
    inv_area = jnp.where(degen, 0.0, 1.0 / jnp.where(degen, 1.0, area))
    w0 = ((x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)) * inv_area
    w1 = ((x0 - x2) * (py - y2) - (y0 - y2) * (px - x2)) * inv_area
    w2 = ((x1 - x0) * (py - y0) - (y1 - y0) * (px - x0)) * inv_area
    inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & (jnp.abs(area) > 1e-12)
    sign = jnp.where(inside, 1.0, -1.0)

    def seg(ax, ay, bx, by):
        abx = bx - ax
        aby = by - ay
        apx = px - ax
        apy = py - ay
        denom = abx * abx + aby * aby
        t = jnp.clip((apx * abx + apy * aby) / jnp.maximum(denom, 1e-12), 0.0, 1.0)
        dx = apx - t * abx
        dy = apy - t * aby
        return t, dx, dy, dx * dx + dy * dy

    t01, dx01, dy01, d01 = seg(x0, y0, x1, y1)
    t12, dx12, dy12, d12 = seg(x1, y1, x2, y2)
    t20, dx20, dy20, d20 = seg(x2, y2, x0, y0)
    d2 = jnp.minimum(d01, jnp.minimum(d12, d20))

    visible = (vis > 0.5) & (jnp.abs(area) > 1e-12)
    d2s = jnp.maximum(d2, 1e-12)
    if dist_mode == "linear":
        logit = sign * jnp.sqrt(d2s) / sigma
        dfac = jnp.where(d2 > 1e-12, 0.5 / (sigma * jnp.sqrt(d2s)), 0.0)
    else:
        logit = sign * d2 / sigma
        dfac = 1.0 / sigma
    # d mass / d d2 per (pixel, face), including the upstream cotangent.
    coef = jnp.where(visible, g * jax.nn.sigmoid(logit) * sign * dfac, 0.0)

    # Exclusive argmin-segment masks (priority 01 > 12 > 20 on exact ties,
    # matching the nested-min structure; ties are measure-zero).
    s01 = d01 <= d2
    s12 = (d12 <= d2) & ~s01
    s20 = ~s01 & ~s12

    c01 = jnp.where(s01, coef, 0.0)
    c12 = jnp.where(s12, coef, 0.0)
    c20 = jnp.where(s20, coef, 0.0)

    # Endpoint gradients of each segment's d2 (t constant — see docstring).
    def acc(c, t, dx, dy):
        ga = (c * 2.0 * (t - 1.0) * dx, c * 2.0 * (t - 1.0) * dy)
        gb = (c * -2.0 * t * dx, c * -2.0 * t * dy)
        return ga, gb

    (a01x, a01y), (b01x, b01y) = acc(c01, t01, dx01, dy01)
    (a12x, a12y), (b12x, b12y) = acc(c12, t12, dx12, dy12)
    (a20x, a20y), (b20x, b20y) = acc(c20, t20, dx20, dy20)

    gx0 = (a01x + b20x).sum(axis=0)
    gy0 = (a01y + b20y).sum(axis=0)
    gx1 = (b01x + a12x).sum(axis=0)
    gy1 = (b01y + a12y).sum(axis=0)
    gx2 = (b12x + a20x).sum(axis=0)
    gy2 = (b12y + a20y).sum(axis=0)
    zero = jnp.zeros_like(gx0)
    return jnp.stack([gx0, gy0, gx1, gy1, gx2, gy2, zero, zero], axis=0)


def _pixel_coords(tile: int):
    p = tile * tile
    idx = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)  # iota must be int on TPU
    px = jnp.mod(idx, tile).astype(jnp.float32) + 0.5
    py = (idx // tile).astype(jnp.float32) + 0.5
    return px, py


_TB = 8  # tiles per kernel program (satisfies the >=8-sublane block rule)


def _fwd_kernel(rows_ref, out_ref, *, tile: int, tiles_w: int, sigma: float, dist_mode: str):
    px, py = _pixel_coords(tile)
    i = pl.program_id(0)
    for t in range(_TB):
        gidx = i * _TB + t
        ox = (jnp.mod(gidx, tiles_w) * tile).astype(jnp.float32)
        oy = ((gidx // tiles_w) * tile).astype(jnp.float32)
        out_ref[t, :] = _tile_mass(rows_ref[t], px + ox, py + oy, sigma, dist_mode)


def _bwd_kernel(rows_ref, g_ref, drows_ref, *, tile: int, tiles_w: int, sigma: float, dist_mode: str):
    # One tile per program, faces chunked by 256 for VMEM headroom; each
    # chunk is ONE analytic-gradient pass (no jax.vjp re-trace — see
    # _tile_mass_grad_analytic).  Total mass is a sum over faces, so
    # per-chunk gradients are exact.
    px, py = _pixel_coords(tile)
    gidx = pl.program_id(0)
    ox = (jnp.mod(gidx, tiles_w) * tile).astype(jnp.float32)
    oy = ((gidx // tiles_w) * tile).astype(jnp.float32)

    p = tile * tile
    g = g_ref[0].reshape(-1)[:p]
    m = rows_ref.shape[2]
    fc = 128  # m is padded to a multiple of 128 by the callers
    for c in range(0, m, fc):
        drows_ref[0, :, c : c + fc] = _tile_mass_grad_analytic(
            rows_ref[0, :, c : c + fc], px + ox, py + oy, g[:, None],
            sigma, dist_mode,
        )


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def _tile_masses(rows: Array, tile: int, tiles_w: int, sigma: float, dist_mode: str):
    return _tile_masses_fwd_impl(rows, tile, tiles_w, sigma, dist_mode)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _tile_masses_fwd_impl(rows, tile, tiles_w, sigma, dist_mode):
    t, _, m = rows.shape
    p = tile * tile
    kern = functools.partial(
        _fwd_kernel, tile=tile, tiles_w=tiles_w, sigma=sigma, dist_mode=dist_mode
    )
    assert t % _TB == 0, "tile count must be padded to a multiple of _TB"
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((t, p), jnp.float32),
        grid=(t // _TB,),
        in_specs=[
            pl.BlockSpec((_TB, 8, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TB, p), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(rows)


def _tile_masses_fwd(rows, tile, tiles_w, sigma, dist_mode):
    out = _tile_masses_fwd_impl(rows, tile, tiles_w, sigma, dist_mode)
    return out, (rows,)


def _tile_masses_bwd(tile, tiles_w, sigma, dist_mode, res, g):
    (rows,) = res
    t, _, m = rows.shape
    p = tile * tile
    # Lane-pad the cotangent to (T, 8, ceil(P/8/128)*128) so each block's
    # last two dims satisfy the (8, 128k) rule with one tile per program.
    lanes = -(-p // (8 * 128)) * 128
    g_pad = jnp.zeros((t, 8 * lanes), g.dtype).at[:, :p].set(g).reshape(t, 8, lanes)
    kern = functools.partial(
        _bwd_kernel, tile=tile, tiles_w=tiles_w, sigma=sigma, dist_mode=dist_mode
    )
    drows = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((t, 8, m), jnp.float32),
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, 8, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, lanes), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(rows, g_pad)
    return (drows,)


_tile_masses.defvjp(_tile_masses_fwd, _tile_masses_bwd)


@functools.partial(
    jax.jit,
    static_argnames=("image_size", "tile", "max_faces", "dist_mode", "sigma", "znear"),
)
def soft_silhouette_pallas(
    verts_pix: Array,
    faces: Array,
    image_size: tuple[int, int],
    sigma: float = 0.25,
    tile: int = 16,
    max_faces: int = 640,
    znear: float = 1e-2,
    dist_mode: str = "linear",
) -> Array:
    """Drop-in replacement for ops.rasterize_tiled.soft_silhouette_tiled."""
    h, w = image_size
    bins = bin_faces(
        verts_pix, faces, image_size, tile, max_faces, margin=6.0 * sigma + 1.0
    )
    t_total, m = bins.indices.shape
    th, tw = -(-h // tile), -(-w // tile)

    fv = verts_pix[faces[bins.indices.reshape(-1)]].reshape(t_total, m, 3, 3)
    z_ok = (fv[..., 2] > znear).any(axis=-1)
    vis = (bins.valid & z_ok).astype(jnp.float32)
    rows = jnp.stack(
        [
            fv[..., 0, 0], fv[..., 0, 1],
            fv[..., 1, 0], fv[..., 1, 1],
            fv[..., 2, 0], fv[..., 2, 1],
            vis, jnp.zeros_like(vis),
        ],
        axis=1,
    )  # (T, 8, M)
    # Visibility/padding rows carry no gradient.
    rows = rows.at[:, 6:].set(jax.lax.stop_gradient(rows[:, 6:]))

    # Pad the face axis to a multiple of 128: the backward kernel slices
    # 128-wide face chunks, which would read/write out of bounds for
    # meshes with m % 128 != 0 (bin_faces clamps max_faces to F).
    pad_m = (-rows.shape[2]) % 128
    if pad_m:
        rows = jnp.concatenate(
            [rows, jnp.zeros(rows.shape[:2] + (pad_m,), rows.dtype)], axis=2
        )
    pad_t = (-t_total) % 8  # _TB
    if pad_t:
        rows = jnp.concatenate(
            [rows, jnp.zeros((pad_t,) + rows.shape[1:], rows.dtype)], axis=0
        )
    mass = _tile_masses(rows, tile, tw, sigma, dist_mode)[:t_total]  # (T, P)
    sil = 1.0 - jnp.exp(-mass)
    out = (
        sil.reshape(th, tw, tile, tile).transpose(0, 2, 1, 3)
        .reshape(th * tile, tw * tile)
    )
    return out[:h, :w]
