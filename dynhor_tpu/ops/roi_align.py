"""ROIAlign-style crop+resize (XLA-fused gathers; no native code needed).

Replaces detectron2's C++/CUDA ``ROIAlign(aligned=True, sampling_ratio=0)``
used at ObjTracker/utils/bbox.py:8-36 and BitMasks.crop_and_resize
(run.py:47, maskutils.py:21, pose_initializtion.py:212).

TPU design: ROIAlign bilinear sampling is separable per axis, so a crop is
two 1-D gathers (rows then columns) with per-sample weights — static
shapes, fuses cleanly under jit, vmaps over boxes/views.  detectron2's
``sampling_ratio=0`` picks ``ceil(roi_side / out_size)`` samples per bin —
data-dependent, so the jit version takes a STATIC ``sampling_ratio``
(default 2, the typical adaptive value for this pipeline's box sizes).
The math per sample (half-pixel alignment, border handling) matches the
CUDA kernel exactly; golden tests pin it against a literal numpy
transcription of the detectron2 sampling rules.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _axis_samples(start, roi_len, out_size: int, ratio: int, src_size: int):
    """Sample positions and bilinear gather indices/weights along one axis.

    Returns (idx0, idx1, w0, w1), each (out_size * ratio,).
    """
    bin_size = roi_len / out_size
    n = out_size * ratio
    i = jnp.arange(n)
    bin_idx = i // ratio
    sub_idx = i % ratio
    pos = start + bin_idx * bin_size + (sub_idx + 0.5) * (bin_size / ratio)

    valid = (pos >= -1.0) & (pos <= src_size)
    p = jnp.maximum(pos, 0.0)
    i0 = jnp.minimum(jnp.floor(p), src_size - 1).astype(jnp.int32)
    at_edge = i0 >= src_size - 1
    i1 = jnp.minimum(i0 + 1, src_size - 1)
    frac = jnp.where(at_edge, 0.0, p - i0)
    w1 = jnp.where(valid, frac, 0.0)
    w0 = jnp.where(valid, 1.0 - frac, 0.0)
    return i0, i1, w0, w1


@functools.partial(jax.jit, static_argnames=("output_size", "sampling_ratio"))
def roi_align(
    image: Array, box_xyxy: Array, output_size: int, sampling_ratio: int = 2
) -> Array:
    """Crop ``box_xyxy`` from ``image`` and resize to a square, ROIAlign-style.

    aligned=True semantics (half-pixel offset), one box per image.

    Args:
      image: (C, H, W) float.
      box_xyxy: (4,) crop box in source pixels.
      output_size: output side length S (static).
      sampling_ratio: static samples-per-bin per axis.

    Returns: (C, S, S) float32.
    """
    c, h, w = image.shape
    img = image.astype(jnp.float32)
    x1, y1, x2, y2 = box_xyxy[0], box_xyxy[1], box_xyxy[2], box_xyxy[3]
    # aligned=True: shift by half a pixel.
    start_x = x1 - 0.5
    start_y = y1 - 0.5
    roi_w = x2 - x1
    roi_h = y2 - y1

    yi0, yi1, wy0, wy1 = _axis_samples(start_y, roi_h, output_size, sampling_ratio, h)
    xi0, xi1, wx0, wx1 = _axis_samples(start_x, roi_w, output_size, sampling_ratio, w)

    # Rows: (C, S*r, W)
    rows = (
        jnp.take(img, yi0, axis=1) * wy0[None, :, None]
        + jnp.take(img, yi1, axis=1) * wy1[None, :, None]
    )
    # Columns: (C, S*r, S*r)
    vals = (
        jnp.take(rows, xi0, axis=2) * wx0[None, None, :]
        + jnp.take(rows, xi1, axis=2) * wx1[None, None, :]
    )
    # Average-pool each ratio x ratio bin.
    r = sampling_ratio
    vals = vals.reshape(c, output_size, r, output_size, r)
    return vals.mean(axis=(2, 4))


def crop_and_resize(
    images: Array, boxes_xyxy: Array, output_size: int, sampling_ratio: int = 2
) -> Array:
    """Batched roi_align: one box per image.

    Equivalent surface to ObjTracker/utils/bbox.py:8-36 (crop_and_resize).

    Args:
      images: (N, C, H, W).
      boxes_xyxy: (N, 4).

    Returns: (N, C, S, S).
    """
    fn = functools.partial(roi_align, output_size=output_size, sampling_ratio=sampling_ratio)
    return jax.vmap(fn)(images, boxes_xyxy)


def roi_align_exact_np(
    image: np.ndarray, box_xyxy: np.ndarray, output_size: int
) -> np.ndarray:
    """Exact detectron2 ROIAlign(aligned=True, sampling_ratio=0) in numpy.

    Host-side preprocessing path (reference: run.py:47-50 operates per frame
    on the host before optimization).  Uses the adaptive
    ``ceil(bin)``-samples rule that the jit version approximates statically.

    Args:
      image: (C, H, W).
      box_xyxy: (4,).

    Returns: (C, S, S) float32.
    """
    c, h, w = image.shape
    x1, y1, x2, y2 = [float(v) for v in box_xyxy]
    roi_w, roi_h = x2 - x1, y2 - y1
    start_x, start_y = x1 - 0.5, y1 - 0.5
    s = output_size
    bin_w, bin_h = roi_w / s, roi_h / s
    grid_h = max(int(np.ceil(roi_h / s)), 1)
    grid_w = max(int(np.ceil(roi_w / s)), 1)

    def axis(start, bin_size, grid, size):
        i = np.arange(s * grid)
        pos = start + (i // grid) * bin_size + (i % grid + 0.5) * (bin_size / grid)
        valid = (pos >= -1.0) & (pos <= size)
        p = np.maximum(pos, 0.0)
        i0 = np.minimum(np.floor(p), size - 1).astype(np.int64)
        at_edge = i0 >= size - 1
        i1 = np.minimum(i0 + 1, size - 1)
        frac = np.where(at_edge, 0.0, p - i0)
        return i0, i1, np.where(valid, 1 - frac, 0.0), np.where(valid, frac, 0.0)

    yi0, yi1, wy0, wy1 = axis(start_y, bin_h, grid_h, h)
    xi0, xi1, wx0, wx1 = axis(start_x, bin_w, grid_w, w)
    img = image.astype(np.float64)
    rows = img[:, yi0, :] * wy0[None, :, None] + img[:, yi1, :] * wy1[None, :, None]
    vals = rows[:, :, xi0] * wx0[None, None, :] + rows[:, :, xi1] * wx1[None, None, :]
    vals = vals.reshape(c, s, grid_h, s, grid_w).mean(axis=(2, 4))
    return vals.astype(np.float32)


def crop_mask_bool_np(mask: np.ndarray, box_xyxy: np.ndarray, output_size: int) -> np.ndarray:
    """BitMasks.crop_and_resize equivalent: ROIAlign the 0/1 mask, threshold
    at 0.5 -> bool (detectron2 BitMasks.crop_and_resize semantics)."""
    out = roi_align_exact_np(mask[None].astype(np.float32), box_xyxy, output_size)[0]
    return out >= 0.5
