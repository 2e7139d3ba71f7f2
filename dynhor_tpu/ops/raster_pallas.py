"""Pallas TPU kernel: fused tile-binned hard raster + soft silhouette.

The fine refine step previously paid for tile binning TWICE (once for the
hard z-buffer raster in ops/rasterize_tiled.py, once for the Pallas soft
silhouette in ops/silhouette_pallas.py) and streamed the hard raster's
(tiles x pixels x faces) temporaries through HBM.  This kernel does ONE
binning and ONE VMEM-resident pass per tile that emits, per pixel:

  * the soft-silhouette mass  (differentiable, custom VJP),
  * the min hit depth         (hard z-buffer, non-differentiable),
  * the winning face slot     (argmin over the tile's face list).

Visibility gradients come from the soft mass exactly as in
ops/silhouette_pallas.py; pix_to_face/zbuf are hard (PyTorch3D
blur_radius=0 semantics — reference ObjTracker/pose_initializtion.py:409-419)
and the downstream barycentric/Phong gradient path is XLA
(ops/rasterize.barycentrics_at).

Face rows are packed (T, 16, M): [x0 y0 x1 y1 x2 y2 vis pad | z0 z1 z2
pad...] so the face axis M sits on the 128-wide lane dimension; the first 8
sublanes are the silhouette rows (identical layout to silhouette_pallas),
the z rows ride along for the depth test.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rasterize import Fragments, barycentrics_from_rows
from .rasterize_tiled import bin_faces
from .silhouette_pallas import (
    _TB,
    _pixel_coords,
    _tile_mass_grad_analytic,
)

Array = jax.Array

_BIG_Z = 3.0e38  # "no hit" depth sentinel (finite: inf-inf NaN traps in VPU min)


class CompactTiles(NamedTuple):
    """Active-tile raster outputs in the COMPACTED tile layout.

    Shading a 256² crop densely pays a (H·W)-row gather + scatter-add
    backward even though ~75% of tiles contain no candidate face
    (production shoes scene) — the same ROW-COUNT-bound cost the raster's
    active-tile compaction already eliminates.  This carries the compacted
    per-pixel raster results so ops/shading.phong_shade_tiles can shade
    ONLY active tiles and scatter the result into the dense background.

    Attributes:
      act_ids: (t_act,) int32 dense tile index of each compacted row
        (sentinel t_total for padding rows past the true active count).
      fid: (t_act, tile*tile) int32 winning face per pixel, -1 = no hit.
      bary: (t_act, tile*tile, 3) barycentrics (0 where no hit),
        differentiable w.r.t. the projected vertices.
    """

    act_ids: Array
    fid: Array
    bary: Array


_FWD_FC = 512  # face-chunk inside the fused fwd kernel: (P x M) temporaries
# at full M blow the VMEM scoped-allocation limit for large caps (observed
# at M=2560, window 176); mass/zmin/argmin all reduce across face chunks.


def _tile_mass_and_depth_ref(
    rows_ref, t: int, count, px: Array, py: Array, sigma: float,
    dist_mode: str, znear: float,
):
    """Per-tile fused pass, face axis chunked AND bounded by the tile's
    true candidate count.

    ``bin_faces`` packs valid faces as a contiguous low-slot prefix, so a
    while-style loop over ``cdiv(count, FC)`` chunks skips the padding
    entirely — per-tile compute scales with the tile's actual load, not
    with the global worst-case cap (edge-on poses force caps several times
    the typical load; see tracker/pipeline._counted_refine_cap).

    Args:
      rows_ref: (TB, 16, M) VMEM ref; t: static tile index in the block.
      count: traced () int32 — valid faces in this tile.

    Returns: (mass (P,), zmin (P,), jbest (P,) int32 slot index).
    """
    m = rows_ref.shape[2]
    p = px.shape[0]
    fc = min(_FWD_FC, m)
    n_chunks = pl.cdiv(count, fc)

    def body(ci, carry):
        mass, zmin, jbest = carry
        # The caller pads m only to a multiple of 128, so the last chunk's
        # natural offset can run past the block (undefined Mosaic reads).
        # Clamp the read window into bounds; the overlap re-reads slots an
        # earlier chunk already processed — harmless for min/argmin
        # (idempotent, strict < keeps the first slot) but the mass sum
        # would double-count, so mask overlap lanes out of the mass.
        start = ci * fc
        off = pl.multiple_of(jnp.minimum(start, m - fc), 128)
        chunk = rows_ref[t, :, pl.ds(off, fc)]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, fc), 1)
        keep = (off + lane) >= start
        mass_c, zmin_c, jbest_c = _tile_mass_and_depth_chunk(
            chunk, px, py, sigma, dist_mode, znear, keep
        )
        mass = mass + mass_c
        better = zmin_c < zmin  # strict: global argmin keeps the FIRST slot
        zmin = jnp.where(better, zmin_c, zmin)
        jbest = jnp.where(better, jbest_c + off, jbest)
        return mass, zmin, jbest

    init = (
        jnp.zeros((p,), jnp.float32),
        jnp.full((p,), _BIG_Z, jnp.float32),
        jnp.zeros((p,), jnp.int32),
    )
    return jax.lax.fori_loop(0, n_chunks, body, init)


def _tile_mass_and_depth_chunk(
    rows: Array, px: Array, py: Array, sigma: float, dist_mode: str,
    znear: float, keep: Array,
):
    x0, y0 = rows[0][None, :], rows[1][None, :]
    x1, y1 = rows[2][None, :], rows[3][None, :]
    x2, y2 = rows[4][None, :], rows[5][None, :]
    vis = rows[6][None, :]
    z0, z1, z2 = rows[8][None, :], rows[9][None, :], rows[10][None, :]

    area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
    degen = jnp.abs(area) < 1e-12
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
        seg_d2(x0, y0, x1, y1),
        jnp.minimum(seg_d2(x1, y1, x2, y2), seg_d2(x2, y2, x0, y0)),
    )
    if dist_mode == "linear":
        logit = sign * jnp.sqrt(jnp.maximum(d2, 1e-12)) / sigma
    else:
        logit = sign * d2 / sigma
    visible = (vis > 0.5) & (jnp.abs(area) > 1e-12)
    mass = jnp.where(visible & keep, jax.nn.softplus(logit), 0.0).sum(axis=1)

    z = w0 * z0 + w1 * z1 + w2 * z2  # (P, M)
    ok = inside & (z > znear) & visible
    zm = jnp.where(ok, z, _BIG_Z)
    jbest = jnp.argmin(zm, axis=1).astype(jnp.int32)  # (P,)
    zmin = jnp.min(zm, axis=1)
    return mass, zmin, jbest


def _tile_depth_chunk(
    rows: Array, px: Array, py: Array, znear: float
):
    """Hard-raster-only per-chunk pass (no silhouette math — used by the
    forward-only prior-view renderer, ~3x less VPU work than the fused
    chunk)."""
    x0, y0 = rows[0][None, :], rows[1][None, :]
    x1, y1 = rows[2][None, :], rows[3][None, :]
    x2, y2 = rows[4][None, :], rows[5][None, :]
    vis = rows[6][None, :]
    z0, z1, z2 = rows[8][None, :], rows[9][None, :], rows[10][None, :]

    area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
    degen = jnp.abs(area) < 1e-12
    inv_area = jnp.where(degen, 0.0, 1.0 / jnp.where(degen, 1.0, area))
    w0 = ((x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)) * inv_area
    w1 = ((x0 - x2) * (py - y2) - (y0 - y2) * (px - x2)) * inv_area
    w2 = ((x1 - x0) * (py - y0) - (y1 - y0) * (px - x0)) * inv_area
    inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & (jnp.abs(area) > 1e-12)
    z = w0 * z0 + w1 * z1 + w2 * z2
    ok = inside & (z > znear) & (vis > 0.5)
    zm = jnp.where(ok, z, _BIG_Z)
    jbest = jnp.argmin(zm, axis=1).astype(jnp.int32)
    zmin = jnp.min(zm, axis=1)
    return zmin, jbest


def _depth_fwd_kernel(
    counts_ref, rows_ref, zmin_ref, jbest_ref, *, tile: int, tiles_w: int,
    znear: float,
):
    px, py = _pixel_coords(tile)
    i = pl.program_id(0)
    m = rows_ref.shape[2]
    fc = min(_FWD_FC, m)
    p = tile * tile
    for t in range(_TB):
        gidx = i * _TB + t
        ox = (jnp.mod(gidx, tiles_w) * tile).astype(jnp.float32)
        oy = ((gidx // tiles_w) * tile).astype(jnp.float32)
        n_chunks = pl.cdiv(counts_ref[gidx, 0], fc)

        def body(ci, carry):
            zmin, jbest = carry
            # Clamp the last chunk into bounds (see _tile_mass_and_depth_ref);
            # min/argmin are idempotent over the re-read overlap.
            off = pl.multiple_of(jnp.minimum(ci * fc, m - fc), 128)
            zmin_c, jbest_c = _tile_depth_chunk(
                rows_ref[t, :, pl.ds(off, fc)], px + ox, py + oy, znear
            )
            better = zmin_c < zmin
            return (
                jnp.where(better, zmin_c, zmin),
                jnp.where(better, jbest_c + off, jbest),
            )

        zmin, jbest = jax.lax.fori_loop(
            0, n_chunks,
            body,
            (jnp.full((p,), _BIG_Z, jnp.float32), jnp.zeros((p,), jnp.int32)),
        )
        zmin_ref[t, :] = zmin
        jbest_ref[t, :] = jbest


def _fused_fwd_kernel(
    counts_ref, rows_ref, mass_ref, zmin_ref, jbest_ref, *, tile: int,
    tiles_w: int, sigma: float, dist_mode: str, znear: float,
):
    px, py = _pixel_coords(tile)
    i = pl.program_id(0)
    for t in range(_TB):
        gidx = i * _TB + t
        ox = (jnp.mod(gidx, tiles_w) * tile).astype(jnp.float32)
        oy = ((gidx // tiles_w) * tile).astype(jnp.float32)
        mass, zmin, jbest = _tile_mass_and_depth_ref(
            rows_ref, t, counts_ref[gidx, 0], px + ox, py + oy, sigma,
            dist_mode, znear,
        )
        mass_ref[t, :] = mass
        zmin_ref[t, :] = zmin
        jbest_ref[t, :] = jbest


def _sil_bwd_kernel(
    counts_ref, rows_ref, g_ref, drows_ref, *, tile: int, tiles_w: int,
    sigma: float, dist_mode: str,
):
    # Analytic gradient of the (differentiable) mass only, chunked by 128
    # faces for VMEM headroom (silhouette_pallas._tile_mass_grad_analytic).
    # z rows get zero gradient (hard visibility — reference semantics).
    px, py = _pixel_coords(tile)
    gidx = pl.program_id(0)
    ox = (jnp.mod(gidx, tiles_w) * tile).astype(jnp.float32)
    oy = ((gidx // tiles_w) * tile).astype(jnp.float32)

    p = tile * tile
    g = g_ref[0].reshape(-1)[:p]
    m = rows_ref.shape[2]
    fc = 128  # m is padded to a multiple of 128 by the caller
    drows_ref[:] = jnp.zeros_like(drows_ref)  # padding chunks stay zero
    n_chunks = pl.cdiv(counts_ref[gidx, 0], fc)

    def body(ci, _):
        off = pl.multiple_of(ci * fc, fc)
        drows_ref[0, 0:8, pl.ds(off, fc)] = _tile_mass_grad_analytic(
            rows_ref[0, 0:8, pl.ds(off, fc)], px + ox, py + oy, g[:, None],
            sigma, dist_mode,
        )
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _fused_tiles(
    rows: Array, counts: Array, tile: int, tiles_w: int, sigma: float,
    dist_mode: str, znear: float,
):
    return _fused_tiles_impl(rows, counts, tile, tiles_w, sigma, dist_mode, znear)


def _pack_tile_rows(
    rows_all: Array, indices: Array, valid: Array,
    tile_ids: Array | None = None, tile: int = 16, tiles_w: int = 1,
):
    """Gather packed per-face rows into per-tile layout + pad for the
    kernels.  Returns (rows (T_pad, 16, M_pad), counts (T_pad,)).

    ``tile_ids`` (active-tile compaction): row j holds tile ``tile_ids[j]``
    of the dense grid, but the kernels derive each program's pixel origin
    from its PROGRAM index j.  Shifting the xy rows by (true origin -
    assumed origin) makes the kernel's coordinate frame exact; mass, z,
    argmin slots, and all coordinate gradients are invariant to the
    constant per-tile shift, so nothing downstream changes."""
    t_total, m = indices.shape
    rows = rows_all[indices.reshape(-1)].reshape(t_total, m, 16)
    rows = jnp.swapaxes(rows, 1, 2)  # (T, 16, M)
    # Invalid (padding) slots must not contribute: zero their vis row.
    rows = rows.at[:, 6, :].multiply(
        jax.lax.stop_gradient(valid.astype(rows.dtype))
    )
    if tile_ids is not None:
        pos = jnp.arange(t_total, dtype=jnp.int32)
        dx = ((tile_ids % tiles_w) - (pos % tiles_w)).astype(rows.dtype) * tile
        dy = ((tile_ids // tiles_w) - (pos // tiles_w)).astype(rows.dtype) * tile
        shift = jnp.stack([dx, dy, dx, dy, dx, dy], axis=-1)  # (T, 6)
        rows = rows.at[:, :6, :].add(-shift[:, :, None])
    pad_m = (-m) % 128
    if pad_m:
        rows = jnp.concatenate(
            [rows, jnp.zeros(rows.shape[:2] + (pad_m,), rows.dtype)], axis=2
        )
    counts = valid.sum(axis=1).astype(jnp.int32)
    pad_t = (-t_total) % _TB
    if pad_t:
        rows = jnp.concatenate(
            [rows, jnp.zeros((pad_t,) + rows.shape[1:], rows.dtype)], axis=0
        )
        counts = jnp.concatenate([counts, jnp.zeros((pad_t,), jnp.int32)])
    return rows, jax.lax.stop_gradient(counts)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11, 12))
def _fused_tiles_invbwd(
    rows_all: Array, indices: Array, valid: Array, inv_flat: Array,
    inv_valid: Array, tile_ids: Array | None, t_total: int, m: int,
    tile: int, tiles_w: int, sigma: float, dist_mode: str, znear: float,
):
    """_fused_tiles with the GATHER inside the custom-VJP boundary.

    The backward maps per-(tile, slot) row gradients back to faces via the
    analytic inverse (rasterize_tiled.face_tile_inverse) — an (F x K)-row
    gather — instead of XLA's (T x M)-row scatter-add transpose of the
    forward gather (measured ~60 ms of the 8-frame backward; the Pallas
    kernels are ~5 ms).  ``tile_ids`` compacts onto active tiles (see
    _pack_tile_rows)."""
    rows, counts = _pack_tile_rows(rows_all, indices, valid, tile_ids, tile, tiles_w)
    return _fused_tiles_impl(rows, counts, tile, tiles_w, sigma, dist_mode, znear)


def _fused_tiles_invbwd_fwd(
    rows_all, indices, valid, inv_flat, inv_valid, tile_ids, t_total, m,
    tile, tiles_w, sigma, dist_mode, znear,
):
    rows, counts = _pack_tile_rows(rows_all, indices, valid, tile_ids, tile, tiles_w)
    out = _fused_tiles_impl(rows, counts, tile, tiles_w, sigma, dist_mode, znear)
    res = (rows, counts, inv_flat, inv_valid, tile_ids)
    return out, res


def _fused_tiles_invbwd_bwd(
    t_total, m, tile, tiles_w, sigma, dist_mode, znear, res, cts
):
    import numpy as _np

    rows, counts, inv_flat, inv_valid, tile_ids = res
    n_faces = inv_flat.shape[0]
    g_mass, _, _ = cts  # zmin/jbest are hard outputs: zero cotangent path
    t_pad = rows.shape[0]
    p = tile * tile
    lanes = -(-p // (8 * 128)) * 128
    g_lanes = (
        jnp.zeros((t_pad, 8 * lanes), g_mass.dtype).at[:, :p].set(g_mass)
        .reshape(t_pad, 8, lanes)
    )
    kern = functools.partial(
        _sil_bwd_kernel, tile=tile, tiles_w=tiles_w, sigma=sigma,
        dist_mode=dist_mode,
    )
    m_pad = rows.shape[2]
    drows = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((t_pad, 16, m_pad), jnp.float32),
        grid=(t_pad,),
        in_specs=[
            pl.BlockSpec((t_pad, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 16, m_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, lanes), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 16, m_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(counts.reshape(t_pad, 1), rows, g_lanes)
    # Analytic inverse: gather each face's (tile, slot) gradient rows.
    flat = jnp.swapaxes(drows[:t_total, :, :m], 1, 2).reshape(t_total * m, 16)
    k = inv_flat.shape[1]
    picked = flat[inv_flat.reshape(-1)].reshape(n_faces, k, 16)
    d_rows_all = jnp.where(inv_valid[..., None], picked, 0.0).sum(axis=1)
    zero_i = _np.zeros(inv_flat.shape, jax.dtypes.float0)
    return (
        d_rows_all,
        _np.zeros((t_total, m), jax.dtypes.float0),
        _np.zeros((t_total, m), jax.dtypes.float0),
        zero_i,
        _np.zeros(inv_valid.shape, jax.dtypes.float0),
        None if tile_ids is None else _np.zeros(tile_ids.shape, jax.dtypes.float0),
    )


_fused_tiles_invbwd.defvjp(_fused_tiles_invbwd_fwd, _fused_tiles_invbwd_bwd)


def _fused_tiles_impl(rows, counts, tile, tiles_w, sigma, dist_mode, znear):
    t, _, m = rows.shape
    p = tile * tile
    assert t % _TB == 0, "tile count must be padded to a multiple of _TB"
    kern = functools.partial(
        _fused_fwd_kernel, tile=tile, tiles_w=tiles_w, sigma=sigma,
        dist_mode=dist_mode, znear=znear,
    )
    return pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((t, p), jnp.float32),
            jax.ShapeDtypeStruct((t, p), jnp.float32),
            jax.ShapeDtypeStruct((t, p), jnp.int32),
        ),
        grid=(t // _TB,),
        in_specs=[
            # Full counts vector to every program (per-program (1,1) SMEM
            # blocks violate the TPU block-shape rule).
            pl.BlockSpec((t, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((_TB, 16, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((_TB, p), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TB, p), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TB, p), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=_interpret(),
    )(counts.reshape(t, 1), rows)


def _fused_tiles_fwd(rows, counts, tile, tiles_w, sigma, dist_mode, znear):
    out = _fused_tiles_impl(rows, counts, tile, tiles_w, sigma, dist_mode, znear)
    return out, (rows, counts)


def _fused_tiles_bwd(tile, tiles_w, sigma, dist_mode, znear, res, cts):
    rows, counts = res
    g_mass, _, _ = cts  # zmin/jbest are hard outputs: zero cotangent path
    t, _, m = rows.shape
    p = tile * tile
    lanes = -(-p // (8 * 128)) * 128
    g_pad = (
        jnp.zeros((t, 8 * lanes), g_mass.dtype).at[:, :p].set(g_mass)
        .reshape(t, 8, lanes)
    )
    kern = functools.partial(
        _sil_bwd_kernel, tile=tile, tiles_w=tiles_w, sigma=sigma,
        dist_mode=dist_mode,
    )
    drows = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((t, 16, m), jnp.float32),
        grid=(t,),
        in_specs=[
            pl.BlockSpec((t, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 16, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, lanes), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 16, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(counts.reshape(t, 1), rows, g_pad)
    import numpy as _np

    return (drows, _np.zeros(counts.shape, jax.dtypes.float0))


_fused_tiles.defvjp(_fused_tiles_fwd, _fused_tiles_bwd)


@functools.partial(
    jax.jit,
    static_argnames=(
        "image_size", "tile", "max_faces", "sigma", "znear", "dist_mode",
        "max_tiles_per_face", "max_active_tiles", "return_compact",
    ),
)
def rasterize_silhouette_pallas(
    verts_pix: Array,
    faces: Array,
    image_size: tuple[int, int],
    sigma: float = 0.25,
    tile: int = 16,
    max_faces: int = 640,
    znear: float = 1e-2,
    dist_mode: str = "linear",
    max_tiles_per_face: int = 32,
    max_active_tiles: int | None = None,
    return_compact: bool = False,
) -> tuple[Fragments, Array, Array] | tuple[Fragments, Array, Array, "CompactTiles | None"]:
    """Fused replacement for rasterize_tiled + soft_silhouette_pallas.

    One bin_faces (at the silhouette's margin — a superset of the hard
    raster's candidates; the in-kernel inside/z tests keep hard-raster
    results exact), one fused kernel.  The silhouette backward routes
    per-(tile, slot) gradients to faces via the analytic inverse mapping
    (face_tile_inverse) instead of a scatter-add.

    ``max_active_tiles`` (optional, counted per scene like ``max_faces`` —
    see rasterize_tiled.max_active_tiles_load) compacts the kernel onto
    the tiles that have at least one candidate face.  The per-tile load
    distribution is extremely skewed (production shoes scene: 75% of the
    256 tiles EMPTY, mean load 42 vs counted cap ~2176), and the raster's
    dominant cost is ROW-COUNT-bound gathers over (tiles x cap) packed
    rows — so skipping empty tiles cuts the gather volume, the kernel
    grid, and the backward cotangent by ~4x at identical results.  Empty
    tiles contribute exactly (mass 0, no hit): the compacted scatter-back
    fills those defaults.

    Returns (Fragments, soft_silhouette (H, W), overflow () int32); with
    ``return_compact=True`` a fourth element carrying the compacted
    active-tile raster (CompactTiles, for ops/shading.phong_shade_tiles)
    or None when compaction is off (``max_active_tiles`` None or >= the
    tile count) — shading then falls back to the dense path.
    The overflow count is the number of face-tile pairs DROPPED — by the
    static per-tile cap (corrupts values), by ``max_tiles_per_face`` in
    the backward inverse (loses gradient contributions of faces spanning
    more than that many tiles), or by ``max_active_tiles`` being smaller
    than the true active-tile count (whole tiles dropped).  Nonzero means
    silently corrupted output, so callers must surface it (the
    refine/joint loops carry the max across all steps and warn host-side;
    VERDICT r1 weak #5).
    """
    from .rasterize_tiled import face_tile_inverse

    h, w = image_size
    margin = 6.0 * sigma + 1.0
    bins = bin_faces(verts_pix, faces, image_size, tile, max_faces, margin=margin)
    t_total, m = bins.indices.shape
    th, tw = -(-h // tile), -(-w // tile)
    inv_flat, inv_valid, k_overflow = face_tile_inverse(
        verts_pix, faces, image_size, tile, max_faces, margin,
        k_max=max_tiles_per_face,
    )

    # Pack per-FACE rows once (F-sized, cheap), then compact per tile with
    # ONE contiguous row gather.  The naive verts_pix[faces[bins.indices]]
    # is a chained gather evaluated per (tile, slot) — measured as expensive
    # as the whole forward kernel at production caps.
    fv_all = verts_pix[faces]  # (F, 3, 3)
    z_ok_all = (fv_all[..., 2] > znear).any(axis=-1)
    zero_f = jnp.zeros((faces.shape[0],), verts_pix.dtype)
    rows_all = jnp.stack(
        [
            fv_all[:, 0, 0], fv_all[:, 0, 1],
            fv_all[:, 1, 0], fv_all[:, 1, 1],
            fv_all[:, 2, 0], fv_all[:, 2, 1],
            jax.lax.stop_gradient(z_ok_all.astype(verts_pix.dtype)),
            zero_f,
            jax.lax.stop_gradient(fv_all[:, 0, 2]),
            jax.lax.stop_gradient(fv_all[:, 1, 2]),
            jax.lax.stop_gradient(fv_all[:, 2, 2]),
            zero_f, zero_f, zero_f, zero_f, zero_f,
        ],
        axis=-1,
    )  # (F, 16): xy rows differentiable; vis/z hard (reference semantics)
    act_overflow = jnp.zeros((), jnp.int32)
    if max_active_tiles is not None and max_active_tiles < t_total:
        # ---- active-tile compaction (see docstring) ----
        t_act = -(-max_active_tiles // _TB) * _TB
        active = bins.valid.any(axis=1)
        act_ids = jnp.nonzero(active, size=t_act, fill_value=t_total)[0].astype(
            jnp.int32
        )
        act_overflow = jax.nn.relu(
            active.sum(dtype=jnp.int32) - jnp.int32(t_act)
        ).astype(jnp.int32)
        sel = act_ids < t_total  # (t_act,) real (non-padding) entries
        indices_act = bins.indices[jnp.minimum(act_ids, t_total - 1)]
        valid_act = bins.valid[jnp.minimum(act_ids, t_total - 1)] & sel[:, None]
        # Translate the analytic inverse into the compacted layout: tile t
        # lives at row rank[t]; unselected tiles get the sentinel t_act so
        # their pairs mask out.  rank is looked up with the same fused
        # one-hot reduction as face_tile_inverse's slot lookup (an (F, K)
        # element gather measures ~20M elem/s on this TPU — too slow).
        rank = (
            jnp.full((t_total,), t_act, jnp.int32)
            .at[act_ids]
            .set(jnp.arange(t_act, dtype=jnp.int32), mode="drop")
        )
        inv_tile = inv_flat // m
        tt = jnp.arange(t_total, dtype=jnp.int32)
        rank_k = jnp.where(
            inv_tile[..., None] == tt, rank[None, None, :], 0
        ).sum(axis=-1)  # (F, K)
        inv_flat_c = rank_k * m + inv_flat % m
        inv_valid_c = inv_valid & (rank_k < t_act)
        mass_c, zmin_c, jbest_c = _fused_tiles_invbwd(
            rows_all, indices_act, valid_act, inv_flat_c, inv_valid_c,
            jnp.minimum(act_ids, t_total - 1), t_act, m, tile, tw, sigma,
            dist_mode, znear,
        )
        p_tile = tile * tile
        compact = None
        if return_compact:
            # Compacted per-pixel face id + barycentrics so shading can run
            # on active tiles only (CompactTiles docstring).  Padding rows
            # (act_ids == t_total) have valid_act all-False -> no hit ->
            # fid -1, bary 0.
            hit_c = zmin_c[:t_act] < (_BIG_Z * 0.5)
            fid_c = jnp.take_along_axis(indices_act, jbest_c[:t_act], axis=1)
            fid_c = jnp.where(hit_c, fid_c, -1).astype(jnp.int32)
            k = jnp.arange(p_tile, dtype=jnp.int32)
            gx_c = (
                (act_ids % tw)[:, None] * tile + (k % tile)[None, :]
            ).astype(jnp.float32) + 0.5
            gy_c = (
                (act_ids // tw)[:, None] * tile + (k // tile)[None, :]
            ).astype(jnp.float32) + 0.5
            bary_c = barycentrics_from_rows(
                rows_all[:, :6], fid_c.reshape(-1), gx_c.reshape(-1),
                gy_c.reshape(-1),
            )
            bary_c = jnp.where(
                (fid_c.reshape(-1) >= 0)[:, None], bary_c, 0.0
            ).reshape(t_act, p_tile, 3)
            compact = CompactTiles(act_ids=act_ids, fid=fid_c, bary=bary_c)
        # Scatter back to the dense tile grid; padding rows (act_ids ==
        # t_total) drop out of bounds.
        mass = (
            jnp.zeros((t_total, p_tile), mass_c.dtype)
            .at[act_ids]
            .set(mass_c[:t_act], mode="drop")
        )
        zmin = (
            jnp.full((t_total, p_tile), _BIG_Z, zmin_c.dtype)
            .at[act_ids]
            .set(zmin_c[:t_act], mode="drop")
        )
        jbest = (
            jnp.zeros((t_total, p_tile), jbest_c.dtype)
            .at[act_ids]
            .set(jbest_c[:t_act], mode="drop")
        )
    else:
        mass, zmin, jbest = _fused_tiles_invbwd(
            rows_all, bins.indices, bins.valid, inv_flat, inv_valid, None,
            t_total, m, tile, tw, sigma, dist_mode, znear,
        )
        mass, zmin, jbest = mass[:t_total], zmin[:t_total], jbest[:t_total]
        compact = None

    sil = 1.0 - jnp.exp(-mass)

    hit = zmin < (_BIG_Z * 0.5)
    fid = jnp.take_along_axis(bins.indices, jbest, axis=1)
    fid = jnp.where(hit, fid, -1).astype(jnp.int32)
    zbuf = jnp.where(hit, zmin, -1.0)

    def detile(x):
        return (
            x.reshape(th, tw, tile, tile).transpose(0, 2, 1, 3)
            .reshape(th * tile, tw * tile)[:h, :w]
        )

    sil_img = detile(sil.reshape(t_total, tile, tile))
    pix_to_face = detile(fid.reshape(t_total, tile, tile))
    zbuf_img = detile(zbuf.reshape(t_total, tile, tile))

    gx = (jnp.arange(w, dtype=jnp.float32) + 0.5)[None, :].repeat(h, 0).reshape(-1)
    gy = (jnp.arange(h, dtype=jnp.float32) + 0.5)[:, None].repeat(w, 1).reshape(-1)
    # One-hop gather from the packed rows this function already built (the
    # chained verts_pix[faces[fidx]] costs as much as the raster kernel).
    bary = barycentrics_from_rows(rows_all[:, :6], pix_to_face.reshape(-1), gx, gy)
    hit_img = pix_to_face >= 0
    frag = Fragments(
        pix_to_face=pix_to_face,
        bary=jnp.where(hit_img.reshape(-1, 1), bary, 0.0).reshape(h, w, 3),
        zbuf=zbuf_img,
    )
    overflow = bins.overflow + k_overflow + act_overflow
    if return_compact:
        return frag, sil_img, overflow, compact
    return frag, sil_img, overflow


@functools.partial(
    jax.jit, static_argnames=("image_size", "tile", "max_faces", "znear")
)
def rasterize_pallas(
    verts_pix: Array,
    faces: Array,
    image_size: tuple[int, int],
    tile: int = 16,
    max_faces: int = 640,
    znear: float = 1e-2,
) -> tuple[Fragments, Array]:
    """Hard-raster-only Pallas path (forward only — prior rendering).

    Margin-0 binning (hard coverage needs no soft-edge band, so the
    candidate load and the counted cap shrink vs the fused kernel) and a
    depth-only kernel without the silhouette math.

    Returns (Fragments, overflow () int32).
    """
    h, w = image_size
    bins = bin_faces(verts_pix, faces, image_size, tile, max_faces, margin=0.0)
    t_total, m = bins.indices.shape
    th, tw = -(-h // tile), -(-w // tile)

    fv_all = verts_pix[faces]  # (F, 3, 3)
    zero_f = jnp.zeros((faces.shape[0],), verts_pix.dtype)
    z_ok_all = (fv_all[..., 2] > znear).any(axis=-1)
    rows_all = jnp.stack(
        [
            fv_all[:, 0, 0], fv_all[:, 0, 1],
            fv_all[:, 1, 0], fv_all[:, 1, 1],
            fv_all[:, 2, 0], fv_all[:, 2, 1],
            z_ok_all.astype(verts_pix.dtype), zero_f,
            fv_all[:, 0, 2], fv_all[:, 1, 2], fv_all[:, 2, 2],
            zero_f, zero_f, zero_f, zero_f, zero_f,
        ],
        axis=-1,
    )  # (F, 16)
    rows = rows_all[bins.indices.reshape(-1)].reshape(t_total, m, 16)
    rows = jnp.swapaxes(rows, 1, 2)
    rows = rows.at[:, 6, :].multiply(bins.valid.astype(verts_pix.dtype))

    pad_m = (-m) % 128
    if pad_m:
        rows = jnp.concatenate(
            [rows, jnp.zeros(rows.shape[:2] + (pad_m,), rows.dtype)], axis=2
        )
    counts = bins.valid.sum(axis=1).astype(jnp.int32)
    pad_t = (-t_total) % _TB
    if pad_t:
        rows = jnp.concatenate(
            [rows, jnp.zeros((pad_t,) + rows.shape[1:], rows.dtype)], axis=0
        )
        counts = jnp.concatenate([counts, jnp.zeros((pad_t,), jnp.int32)])
    t_pad, _, m_pad = rows.shape
    p = tile * tile
    kern = functools.partial(
        _depth_fwd_kernel, tile=tile, tiles_w=tw, znear=znear
    )
    zmin, jbest = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((t_pad, p), jnp.float32),
            jax.ShapeDtypeStruct((t_pad, p), jnp.int32),
        ),
        grid=(t_pad // _TB,),
        in_specs=[
            pl.BlockSpec((t_pad, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((_TB, 16, m_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((_TB, p), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TB, p), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=_interpret(),
    )(counts.reshape(t_pad, 1), rows)
    zmin, jbest = zmin[:t_total], jbest[:t_total]

    hit = zmin < (_BIG_Z * 0.5)
    fid = jnp.take_along_axis(bins.indices, jbest, axis=1)
    fid = jnp.where(hit, fid, -1).astype(jnp.int32)
    zbuf = jnp.where(hit, zmin, -1.0)

    def detile(x):
        return (
            x.reshape(th, tw, tile, tile).transpose(0, 2, 1, 3)
            .reshape(th * tile, tw * tile)[:h, :w]
        )

    pix_to_face = detile(fid.reshape(t_total, tile, tile))
    zbuf_img = detile(zbuf.reshape(t_total, tile, tile))
    gx = (jnp.arange(w, dtype=jnp.float32) + 0.5)[None, :].repeat(h, 0).reshape(-1)
    gy = (jnp.arange(h, dtype=jnp.float32) + 0.5)[:, None].repeat(w, 1).reshape(-1)
    bary = barycentrics_from_rows(rows_all[:, :6], pix_to_face.reshape(-1), gx, gy)
    hit_img = pix_to_face >= 0
    frag = Fragments(
        pix_to_face=pix_to_face,
        bary=jnp.where(hit_img.reshape(-1, 1), bary, 0.0).reshape(h, w, 3),
        zbuf=zbuf_img,
    )
    return frag, bins.overflow
