"""Image resizing matching torch.nn.functional.interpolate semantics.

Replaces the reference's CUDA ``F.interpolate(..., mode='bicubic',
align_corners=True)`` (ObjTracker/pose_initializtion.py:171,287) and
``mode='nearest'`` (pose_initializtion.py:176,227,290).

TPU design: resampling along each axis is a fixed linear map, so a resize
is two dense matmuls ``W_y @ img @ W_x^T`` — they run on the MXU and fuse
with neighboring ops, instead of gather-heavy interpolation on the VPU.
The weight matrices are built at trace time from static shapes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_A = -0.75  # torch bicubic coefficient (cubic convolution, Keys 1981)


def _cubic_kernel(x: np.ndarray) -> np.ndarray:
    ax = np.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    w1 = (_A + 2.0) * ax3 - (_A + 3.0) * ax2 + 1.0
    w2 = _A * ax3 - 5.0 * _A * ax2 + 8.0 * _A * ax - 4.0 * _A
    return np.where(ax <= 1.0, w1, np.where(ax < 2.0, w2, 0.0))


@functools.lru_cache(maxsize=64)
def _bicubic_matrix_ac(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) resampling matrix, align_corners=True, clamped taps."""
    if in_size == out_size:
        return np.eye(in_size, dtype=np.float32)
    if out_size > 1:
        src = np.arange(out_size) * (in_size - 1) / (out_size - 1)
    else:
        src = np.zeros(1)
    base = np.floor(src).astype(np.int64)
    t = src - base
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    for tap in range(-1, 3):
        idx = np.clip(base + tap, 0, in_size - 1)
        wgt = _cubic_kernel(tap - t)
        np.add.at(mat, (np.arange(out_size), idx), wgt)
    return mat.astype(np.float32)


@functools.lru_cache(maxsize=64)
def _bicubic_matrix_halfpix(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) resampling matrix, align_corners=False
    (half-pixel convention: src = (dst + 0.5) * in/out - 0.5), clamped taps.
    Matches torch F.interpolate(mode='bicubic', align_corners=False,
    antialias=False) for upsampling."""
    if in_size == out_size:
        return np.eye(in_size, dtype=np.float32)
    src = (np.arange(out_size) + 0.5) * (in_size / out_size) - 0.5
    base = np.floor(src).astype(np.int64)
    t = src - base
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    for tap in range(-1, 3):
        idx = np.clip(base + tap, 0, in_size - 1)
        wgt = _cubic_kernel(tap - t)
        np.add.at(mat, (np.arange(out_size), idx), wgt)
    return mat.astype(np.float32)


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def resize_bicubic_halfpix(images: Array, out_h: int, out_w: int) -> Array:
    """Bicubic resize, align_corners=False (torch parity, no antialias).

    Args:
      images: (..., H, W).
    """
    h, w = images.shape[-2], images.shape[-1]
    wy = jnp.asarray(_bicubic_matrix_halfpix(h, out_h))
    wx = jnp.asarray(_bicubic_matrix_halfpix(w, out_w))
    x = images.astype(jnp.float32)
    x = jnp.einsum("oh,...hw->...ow", wy, x)
    return jnp.einsum("pw,...hw->...hp", wx, x)


@functools.lru_cache(maxsize=64)
def _nearest_indices(in_size: int, out_size: int) -> np.ndarray:
    """torch 'nearest' source indices: floor(dst * in / out)."""
    idx = np.floor(np.arange(out_size) * (in_size / out_size)).astype(np.int64)
    return np.minimum(idx, in_size - 1)


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def resize_bicubic_align_corners(images: Array, out_h: int, out_w: int) -> Array:
    """Bicubic resize, align_corners=True (torch parity).

    Args:
      images: (..., H, W) — any leading batch/channel dims.

    Returns: (..., out_h, out_w) float32.
    """
    h, w = images.shape[-2], images.shape[-1]
    wy = jnp.asarray(_bicubic_matrix_ac(h, out_h))
    wx = jnp.asarray(_bicubic_matrix_ac(w, out_w))
    x = images.astype(jnp.float32)
    x = jnp.einsum("oh,...hw->...ow", wy, x)
    return jnp.einsum("pw,...hw->...hp", wx, x)


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def resize_nearest(images: Array, out_h: int, out_w: int) -> Array:
    """Nearest-neighbor resize (torch 'nearest' parity).

    Args:
      images: (..., H, W).
    """
    h, w = images.shape[-2], images.shape[-1]
    yi = jnp.asarray(_nearest_indices(h, out_h))
    xi = jnp.asarray(_nearest_indices(w, out_w))
    out = jnp.take(images, yi, axis=-2)
    return jnp.take(out, xi, axis=-1)
