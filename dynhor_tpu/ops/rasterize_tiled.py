"""Tile-binned rasterization: bin faces to pixel tiles, then rasterize each
tile against only its faces (pure JAX; same API/semantics as the dense
versions in ops/rasterize.py + ops/silhouette.py).

Why: the dense rasterizers do O(pixels x faces) work — at 256^2 x 5,000
faces that is 327M coverage tests per view, and the fwd+bwd soft
silhouette dominated the fine-refine step (~78% measured on v5e, see
BASELINE.md).  A typical face here covers a few pixels, so binning faces
by their screen bbox into TxT pixel tiles (with a static per-tile face
cap — XLA needs static shapes) reduces the work by roughly
(image / object-extent)^2 x (tile utilization), ~5-20x in practice.

The cap is a correctness knob: tiles overflowing ``max_faces_per_tile``
silently drop the HIGHEST-index faces (top_k keeps the lowest face ids);
``bin_faces`` returns the overflow count — the tracking pipeline checks it
host-side at the init poses and warns, and tests assert headroom.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .rasterize import Fragments, _edge, barycentrics_at
from .silhouette import _point_segment_dist2

Array = jax.Array


class FaceBins(NamedTuple):
    indices: Array  # (T, max_faces) int32 face ids (padded with 0)
    valid: Array  # (T, max_faces) bool
    overflow: Array  # () int32 — total faces dropped across tiles


def face_screen_bboxes(verts_pix: Array, faces: Array, znear: float = 1e-2):
    """Per-face screen bbox (F, 4) xyxy + a per-face visibility mask.

    Faces with ALL vertices behind znear are excluded (their projection is
    meaningless); partially-behind faces pass through, matching the dense
    rasterizer's per-pixel z test closely enough for this pipeline (the
    object sits fully in front of the camera).
    """
    fv = verts_pix[faces]  # (F, 3, 3)
    xy = fv[..., :2]
    lo = xy.min(axis=1)
    hi = xy.max(axis=1)
    vis = (fv[..., 2] > znear).any(axis=1)
    # Exact point-faces (all three vertices identical — mesh-padding faces,
    # see parallel/multiseq.pad_mesh and rasterize._pad_faces) can never
    # cover a pixel; excluding them here keeps them out of the bins so they
    # don't consume cap slots or inflate max_tile_load counts.
    vis = vis & (hi > lo).any(axis=-1)
    return jnp.concatenate([lo, hi], axis=-1), vis


@functools.partial(
    jax.jit, static_argnames=("image_size", "tile", "max_faces", "margin")
)
def bin_faces(
    verts_pix: Array,
    faces: Array,
    image_size: tuple[int, int],
    tile: int = 16,
    max_faces: int = 640,
    margin: float = 2.0,
) -> FaceBins:
    """Assign faces to the tiles their (margin-expanded) bbox overlaps."""
    h, w = image_size
    th, tw = -(-h // tile), -(-w // tile)
    bboxes, vis = face_screen_bboxes(verts_pix, faces)
    f = faces.shape[0]
    max_faces = min(max_faces, f)  # tiny meshes: cap can't exceed F

    ty = jnp.arange(th) * tile
    tx = jnp.arange(tw) * tile
    # (T_y, T_x) tile rects vs (F,) face boxes -> (T, F) overlap.
    x1 = bboxes[:, 0] - margin
    y1 = bboxes[:, 1] - margin
    x2 = bboxes[:, 2] + margin
    y2 = bboxes[:, 3] + margin
    ox = (x1[None, :] < (tx[:, None] + tile)) & (x2[None, :] > tx[:, None])  # (Tx, F)
    oy = (y1[None, :] < (ty[:, None] + tile)) & (y2[None, :] > ty[:, None])  # (Ty, F)
    overlap = (oy[:, None, :] & ox[None, :, :]).reshape(th * tw, f)
    overlap = overlap & vis[None, :]

    # Static-size compaction: the max_faces smallest face-ids among the
    # overlapping ones (top_k on -(id) of overlapping faces).
    ids = jnp.arange(f, dtype=jnp.int32)
    keyed = jnp.where(overlap, -ids, -(10**9))  # top_k picks overlapping, low ids
    top_vals, _ = jax.lax.top_k(keyed, max_faces)  # (T, max_faces)
    valid = top_vals > -(10**9)
    indices = jnp.where(valid, -top_vals, 0).astype(jnp.int32)
    overflow = (overlap.sum(axis=1) - valid.sum(axis=1)).sum().astype(jnp.int32)
    return FaceBins(indices, valid, overflow)


@functools.partial(
    jax.jit, static_argnames=("image_size", "tile", "max_faces", "margin", "k_max")
)
def face_tile_inverse(
    verts_pix: Array,
    faces: Array,
    image_size: tuple[int, int],
    tile: int = 16,
    max_faces: int = 640,
    margin: float = 2.0,
    k_max: int = 32,
):
    """Inverse of ``bin_faces``: for each FACE, the (tile, slot) positions
    it was packed into, as flat indices into a (T_pad * max_faces) array.

    A face's candidate tiles are exactly the grid rectangle its
    margin-expanded bbox overlaps, and ``bin_faces`` packs slots in
    ascending face-id order, so slot(t, f) is the overlap-matrix cumsum —
    both analytic.  This turns the backward of the per-tile row gather
    from a (T x max_faces)-row SCATTER-add into an (F x k_max)-row GATHER
    (measured: the scatter was ~60 ms of the 8-frame raster backward; the
    kernels themselves are ~5 ms).

    Returns (inv_flat (F, k_max) int32, inv_valid (F, k_max) bool,
    k_overflow () int32 — face-tile pairs whose gradient contributions are
    DROPPED because a face overlaps more than k_max tiles; callers must
    surface it like bin overflow).
    """
    h, w = image_size
    th, tw = -(-h // tile), -(-w // tile)
    t_total = th * tw
    bboxes, vis = face_screen_bboxes(verts_pix, faces)
    f = faces.shape[0]
    max_faces = min(max_faces, f)

    ty = jnp.arange(th) * tile
    tx = jnp.arange(tw) * tile
    x1 = bboxes[:, 0] - margin
    y1 = bboxes[:, 1] - margin
    x2 = bboxes[:, 2] + margin
    y2 = bboxes[:, 3] + margin
    ox = (x1[None, :] < (tx[:, None] + tile)) & (x2[None, :] > tx[:, None])
    oy = (y1[None, :] < (ty[:, None] + tile)) & (y2[None, :] > ty[:, None])
    overlap = (oy[:, None, :] & ox[None, :, :]).reshape(t_total, f)
    overlap = overlap & vis[None, :]
    # Slot of face f in tile t = its rank among the tile's overlapping ids
    # (bin_faces packs ascending ids via top_k of -ids).
    slots = jnp.cumsum(overlap.astype(jnp.int32), axis=1) - 1  # (T, F)

    # Tile rectangle of each face (clamped to the grid).
    tx0 = jnp.clip(jnp.floor(x1 / tile).astype(jnp.int32), 0, tw - 1)
    tx1 = jnp.clip(jnp.floor((x2 - 1e-6) / tile).astype(jnp.int32), 0, tw - 1)
    ty0 = jnp.clip(jnp.floor(y1 / tile).astype(jnp.int32), 0, th - 1)
    ty1 = jnp.clip(jnp.floor((y2 - 1e-6) / tile).astype(jnp.int32), 0, th - 1)
    wx = tx1 - tx0 + 1
    wy = ty1 - ty0 + 1
    n_rect = wx * wy
    kk = jnp.arange(k_max, dtype=jnp.int32)
    tx_k = tx0[:, None] + jnp.minimum(kk[None, :] % jnp.maximum(wx, 1)[:, None], wx[:, None] - 1)
    ty_k = ty0[:, None] + jnp.minimum(kk[None, :] // jnp.maximum(wx, 1)[:, None], wy[:, None] - 1)
    t_k = ty_k * tw + tx_k  # (F, K)
    in_rect = kk[None, :] < n_rect[:, None]

    # NO element gathers — they measured as slow as the scatter this
    # function exists to remove (~20M elements/s on this TPU):
    #  * slot_k = slots[t_k, f] is evaluated as a fused one-hot reduction
    #    over the (small) tile axis instead of a (F x K) scalar gather;
    #  * in_rect & vis & in_grid  =>  overlap(t_k, f) exactly (the rect is
    #    derived with bin_faces' strict edge rules and clamped to the grid;
    #    in_grid guards faces whose whole bbox lies outside the image,
    #    where clamping would fabricate non-overlapping tiles);
    #  * slot_k < counts[t_k]  <=>  slot_k < max_faces (slot is the face's
    #    rank among the tile's overlapping ids, so slot < n_overlap always;
    #    counts = min(n_overlap, max_faces)).
    slots_ft = slots.T  # (F, T)
    tt = jnp.arange(t_total, dtype=jnp.int32)
    slot_k = jnp.where(
        t_k[..., None] == tt, slots_ft[:, None, :], 0
    ).sum(axis=-1)  # (F, K)
    in_grid = (x1 < w) & (x2 > 0.0) & (y1 < h) & (y2 > 0.0)
    valid = (
        in_rect
        & (vis & in_grid)[:, None]
        & (slot_k < max_faces)
    )
    inv_flat = jnp.where(valid, t_k * max_faces + slot_k, 0)
    k_overflow = jnp.where(vis, jax.nn.relu(n_rect - k_max), 0).sum().astype(jnp.int32)
    return inv_flat.astype(jnp.int32), valid, k_overflow


@functools.partial(jax.jit, static_argnames=("image_size", "tile", "margin"))
def max_tile_load(
    verts_pix: Array,
    faces: Array,
    image_size: tuple[int, int],
    tile: int = 16,
    margin: float = 3.0,
) -> Array:
    """Max per-tile candidate-face count (no compaction — one MXU matmul).

    Callers size ``max_faces`` from this (cap counting beats fixed caps:
    edge-on poses can pack several thousand faces into one tile).
    """
    h, w = image_size
    th, tw = -(-h // tile), -(-w // tile)
    bboxes, vis = face_screen_bboxes(verts_pix, faces)
    ty = jnp.arange(th) * tile
    tx = jnp.arange(tw) * tile
    x1 = bboxes[:, 0] - margin
    y1 = bboxes[:, 1] - margin
    x2 = bboxes[:, 2] + margin
    y2 = bboxes[:, 3] + margin
    ox = (x1[None, :] < (tx[:, None] + tile)) & (x2[None, :] > tx[:, None])
    oy = (y1[None, :] < (ty[:, None] + tile)) & (y2[None, :] > ty[:, None])
    counts = jnp.einsum(
        "af,bf->ab", oy.astype(jnp.float32), (ox & vis[None, :]).astype(jnp.float32)
    )
    return counts.max().astype(jnp.int32)


def max_active_tiles_load(
    verts_pix: Array,
    faces: Array,
    image_size: tuple[int, int],
    tile: int = 16,
    margin: float = 3.0,
) -> Array:
    """Number of tiles with >= 1 candidate face (same counting scheme as
    ``max_tile_load``).  Callers size ``max_active_tiles`` for the fused
    raster's active-tile compaction from this: the load distribution is
    skewed enough (typically ~75% of tiles empty at object scale) that
    skipping empty tiles cuts the raster's gather-bound cost ~4x."""
    h, w = image_size
    th, tw = -(-h // tile), -(-w // tile)
    bboxes, vis = face_screen_bboxes(verts_pix, faces)
    ty = jnp.arange(th) * tile
    tx = jnp.arange(tw) * tile
    x1 = bboxes[:, 0] - margin
    y1 = bboxes[:, 1] - margin
    x2 = bboxes[:, 2] + margin
    y2 = bboxes[:, 3] + margin
    ox = (x1[None, :] < (tx[:, None] + tile)) & (x2[None, :] > tx[:, None])
    oy = (y1[None, :] < (ty[:, None] + tile)) & (y2[None, :] > ty[:, None])
    counts = jnp.einsum(
        "af,bf->ab", oy.astype(jnp.float32), (ox & vis[None, :]).astype(jnp.float32)
    )
    return (counts > 0).sum(dtype=jnp.int32)


def _tile_grid(h: int, w: int, tile: int):
    th, tw = -(-h // tile), -(-w // tile)
    iy = jnp.arange(tile, dtype=jnp.float32) + 0.5
    ix = jnp.arange(tile, dtype=jnp.float32) + 0.5
    py = jnp.broadcast_to(iy[:, None], (tile, tile)).reshape(-1)
    px = jnp.broadcast_to(ix[None, :], (tile, tile)).reshape(-1)
    oy = (jnp.arange(th * tw, dtype=jnp.float32) // tw) * tile
    ox = (jnp.arange(th * tw, dtype=jnp.float32) % tw) * tile
    return px, py, ox, oy, th, tw


@functools.partial(
    jax.jit,
    static_argnames=("image_size", "tile", "max_faces", "tile_chunk", "dist_mode"),
)
def soft_silhouette_tiled(
    verts_pix: Array,
    faces: Array,
    image_size: tuple[int, int],
    sigma: float = 0.25,
    tile: int = 16,
    max_faces: int = 640,
    tile_chunk: int = 64,
    znear: float = 1e-2,
    dist_mode: str = "linear",
) -> Array:
    """Tile-binned soft silhouette; semantics of ops.silhouette.soft_silhouette.

    The soft edge needs faces within ~4*sigma of a pixel; the binning
    margin covers that (margin 2 px >= the sigmoid's support for the
    default sigma 0.25).
    """
    h, w = image_size
    bins = bin_faces(verts_pix, faces, image_size, tile, max_faces, margin=6.0 * sigma + 1.0)
    px, py, ox, oy, th, tw = _tile_grid(h, w, tile)
    inv_sigma = 1.0 / sigma
    fv_all = verts_pix[faces]  # (F, 3, 3)

    def tiles_chunk(args):
        idx, valid, ox_c, oy_c = args  # (C, M), (C, M), (C,), (C,)
        fv = fv_all[idx]  # (C, M, 3, 3)
        x0, y0, z0 = fv[..., 0, 0], fv[..., 0, 1], fv[..., 0, 2]
        x1, y1, z1 = fv[..., 1, 0], fv[..., 1, 1], fv[..., 1, 2]
        x2, y2, z2 = fv[..., 2, 0], fv[..., 2, 1], fv[..., 2, 2]
        gx = ox_c[:, None] + px[None, :]  # (C, P)
        gy = oy_c[:, None] + py[None, :]
        pxx = gx[:, :, None]  # (C, P, 1)
        pyy = gy[:, :, None]
        area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)  # (C, M)
        degen = jnp.abs(area) < 1e-12  # double-where: no 1/0 in backward
        inv_area = jnp.where(degen, 0.0, 1.0 / jnp.where(degen, 1.0, area))[:, None, :]
        w0 = ((x2 - x1)[:, None, :] * (pyy - y1[:, None, :]) - (y2 - y1)[:, None, :] * (pxx - x1[:, None, :])) * inv_area
        w1 = ((x0 - x2)[:, None, :] * (pyy - y2[:, None, :]) - (y0 - y2)[:, None, :] * (pxx - x2[:, None, :])) * inv_area
        w2 = ((x1 - x0)[:, None, :] * (pyy - y0[:, None, :]) - (y1 - y0)[:, None, :] * (pxx - x0[:, None, :])) * inv_area
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & (jnp.abs(area)[:, None, :] > 1e-12)
        sign = jnp.where(inside, 1.0, -1.0)
        d2 = jnp.minimum(
            _point_segment_dist2(pxx, pyy, x0[:, None, :], y0[:, None, :], x1[:, None, :], y1[:, None, :]),
            jnp.minimum(
                _point_segment_dist2(pxx, pyy, x1[:, None, :], y1[:, None, :], x2[:, None, :], y2[:, None, :]),
                _point_segment_dist2(pxx, pyy, x2[:, None, :], y2[:, None, :], x0[:, None, :], y0[:, None, :]),
            ),
        )
        if dist_mode == "linear":
            logit = sign * jnp.sqrt(jnp.maximum(d2, 1e-12)) * inv_sigma
        else:
            logit = sign * d2 * inv_sigma
        visible = (
            valid
            & ((z0 > znear) | (z1 > znear) | (z2 > znear))
            & (jnp.abs(area) > 1e-12)  # degenerate padded faces add no mass
        )
        mass = jnp.where(visible[:, None, :], jax.nn.softplus(logit), 0.0)
        return mass.sum(axis=-1)  # (C, P)

    n_tiles = th * tw
    pad = (-n_tiles) % tile_chunk
    def padit(x):
        return jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)]) if pad else x
    idx_p = padit(bins.indices)
    val_p = padit(bins.valid)
    ox_p = padit(ox)
    oy_p = padit(oy)
    nchunks = idx_p.shape[0] // tile_chunk
    args = (
        idx_p.reshape(nchunks, tile_chunk, -1),
        val_p.reshape(nchunks, tile_chunk, -1),
        ox_p.reshape(nchunks, tile_chunk),
        oy_p.reshape(nchunks, tile_chunk),
    )
    acc = jax.lax.map(jax.checkpoint(tiles_chunk), args)  # (n, C, P)
    acc = acc.reshape(n_tiles + pad, tile, tile)[:n_tiles]
    sil = 1.0 - jnp.exp(-acc)
    # De-tile: (th, tw, tile, tile) -> (H, W)
    out = sil.reshape(th, tw, tile, tile).transpose(0, 2, 1, 3).reshape(th * tile, tw * tile)
    return out[:h, :w]


@functools.partial(
    jax.jit,
    static_argnames=("image_size", "tile", "max_faces", "tile_chunk"),
)
def rasterize_tiled(
    verts_pix: Array,
    faces: Array,
    image_size: tuple[int, int],
    tile: int = 16,
    max_faces: int = 640,
    tile_chunk: int = 64,
    znear: float = 1e-2,
) -> Fragments:
    """Tile-binned hard z-buffer raster; semantics of ops.rasterize.rasterize."""
    h, w = image_size
    bins = bin_faces(verts_pix, faces, image_size, tile, max_faces, margin=0.0)
    px, py, ox, oy, th, tw = _tile_grid(h, w, tile)
    fv_all = verts_pix[faces]

    def tiles_chunk(args):
        idx, valid, ox_c, oy_c = args
        fv = fv_all[idx]  # (C, M, 3, 3)
        x0, y0, z0 = fv[..., 0, 0], fv[..., 0, 1], fv[..., 0, 2]
        x1, y1, z1 = fv[..., 1, 0], fv[..., 1, 1], fv[..., 1, 2]
        x2, y2, z2 = fv[..., 2, 0], fv[..., 2, 1], fv[..., 2, 2]
        gx = (ox_c[:, None] + px[None, :])[:, :, None]
        gy = (oy_c[:, None] + py[None, :])[:, :, None]
        area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
        degen = jnp.abs(area) < 1e-12  # double-where: no 1/0 in backward
        inv_area = jnp.where(degen, 0.0, 1.0 / jnp.where(degen, 1.0, area))[:, None, :]
        e12 = _edge(x1[:, None, :], y1[:, None, :], x2[:, None, :], y2[:, None, :], gx, gy)
        e20 = _edge(x2[:, None, :], y2[:, None, :], x0[:, None, :], y0[:, None, :], gx, gy)
        e01 = _edge(x0[:, None, :], y0[:, None, :], x1[:, None, :], y1[:, None, :], gx, gy)
        w0 = e12 * inv_area
        w1 = e20 * inv_area
        w2 = e01 * inv_area
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & (jnp.abs(area)[:, None, :] > 1e-12)
        z = w0 * z0[:, None, :] + w1 * z1[:, None, :] + w2 * z2[:, None, :]
        ok = inside & (z > znear) & valid[:, None, :]
        z = jnp.where(ok, z, jnp.inf)
        j = jnp.argmin(z, axis=-1)  # (C, P)
        zmin = jnp.take_along_axis(z, j[..., None], axis=-1)[..., 0]
        fid = jnp.take_along_axis(idx, j, axis=-1)
        fid = jnp.where(jnp.isfinite(zmin), fid, -1)
        return zmin, fid

    n_tiles = th * tw
    pad = (-n_tiles) % tile_chunk
    def padit(x):
        return jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)]) if pad else x
    nchunks = (n_tiles + pad) // tile_chunk
    args = (
        padit(bins.indices).reshape(nchunks, tile_chunk, -1),
        padit(bins.valid).reshape(nchunks, tile_chunk, -1),
        padit(ox).reshape(nchunks, tile_chunk),
        padit(oy).reshape(nchunks, tile_chunk),
    )
    zmin, fid = jax.lax.map(tiles_chunk, args)
    zmin = zmin.reshape(-1, tile, tile)[:n_tiles]
    fid = fid.reshape(-1, tile, tile)[:n_tiles]

    def detile(x):
        return (
            x.reshape(th, tw, tile, tile).transpose(0, 2, 1, 3)
            .reshape(th * tile, tw * tile)[:h, :w]
        )

    zbuf = detile(zmin)
    pix_to_face = detile(fid).astype(jnp.int32)
    hit = pix_to_face >= 0
    gx_full = (jnp.arange(w, dtype=jnp.float32) + 0.5)[None, :].repeat(h, 0).reshape(-1)
    gy_full = (jnp.arange(h, dtype=jnp.float32) + 0.5)[:, None].repeat(w, 1).reshape(-1)
    bary = barycentrics_at(verts_pix, faces, pix_to_face.reshape(-1), gx_full, gy_full)
    return Fragments(
        pix_to_face=pix_to_face,
        bary=jnp.where(hit.reshape(-1, 1), bary, 0.0).reshape(h, w, 3),
        zbuf=jnp.where(hit, zbuf, -1.0),
    )
