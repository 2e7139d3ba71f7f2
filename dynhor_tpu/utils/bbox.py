"""Bounding-box algebra (numpy/JAX, convention-compatible with the reference).

Behavioral reference: ObjTracker/utils/bbox.py (detectron2 BoxMode
XYXY<->XYWH are plain coordinate conversions; no native code needed) and
the tight-bbox extraction in ObjTracker/run.py:35-43 /
pose_initializtion.py:201-208.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def bbox_xy_to_wh(bbox):
    """(x1, y1, x2, y2) -> (x, y, w, h).  Reference: utils/bbox.py:92-103."""
    xp = jnp if isinstance(bbox, jax.Array) else np
    b = xp.asarray(bbox)
    return xp.concatenate(
        [b[..., :2], b[..., 2:4] - b[..., :2]], axis=-1
    )


def bbox_wh_to_xy(bbox):
    """(x, y, w, h) -> (x1, y1, x2, y2).  Reference: utils/bbox.py:106-117."""
    xp = jnp if isinstance(bbox, jax.Array) else np
    b = xp.asarray(bbox)
    return xp.concatenate(
        [b[..., :2], b[..., :2] + b[..., 2:4]], axis=-1
    )


def make_bbox_square(bbox_xywh, bbox_expansion: float = 0.0):
    """Square box with the same center, side = max(w, h) * (1 + expansion).

    Matches ObjTracker/utils/bbox.py:70-89.
    """
    xp = jnp if isinstance(bbox_xywh, jax.Array) else np
    b = xp.asarray(bbox_xywh, dtype=xp.float32 if xp is np else None)
    cx = b[..., 0] + b[..., 2] / 2.0
    cy = b[..., 1] + b[..., 3] / 2.0
    side = xp.maximum(b[..., 2], b[..., 3]) * (1.0 + bbox_expansion)
    return xp.stack([cx - side / 2.0, cy - side / 2.0, side, side], axis=-1)


def compute_iou(bbox1, bbox2):
    """IoU of two xyxy boxes.  Matches ObjTracker/utils/bbox.py:143-163."""
    xp = jnp if isinstance(bbox1, jax.Array) else np
    b1 = xp.asarray(bbox1)
    b2 = xp.asarray(bbox2)
    a1 = (b1[..., 2] - b1[..., 0]) * (b1[..., 3] - b1[..., 1])
    a2 = (b2[..., 2] - b2[..., 0]) * (b2[..., 3] - b2[..., 1])
    lt = xp.maximum(b1[..., :2], b2[..., :2])
    rb = xp.minimum(b1[..., 2:4], b2[..., 2:4])
    wh = xp.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (a1 + a2 - inter)


def mask_tight_bbox_xyxy(mask: Array, pad: float = 5.0) -> Array:
    """Tight xyxy box around nonzero mask pixels, padded and clamped.

    jit-safe equivalent of the nonzero-indices min/max at
    ObjTracker/run.py:35-41 and pose_initializtion.py:201-206:
    box = (min_col, min_row, max_col, max_row) with +/-5 px padding clamped
    to the image bounds.

    Args:
      mask: (H, W) boolean / {0,1}.

    Returns: (4,) float32 (x1, y1, x2, y2).
    """
    h, w = mask.shape
    m = mask > 0
    rows = jnp.any(m, axis=1)
    cols = jnp.any(m, axis=0)
    row_idx = jnp.arange(h)
    col_idx = jnp.arange(w)
    big = jnp.int32(1 << 30)
    min_row = jnp.min(jnp.where(rows, row_idx, big))
    max_row = jnp.max(jnp.where(rows, row_idx, -big))
    min_col = jnp.min(jnp.where(cols, col_idx, big))
    max_col = jnp.max(jnp.where(cols, col_idx, -big))
    x1 = jnp.maximum(min_col.astype(jnp.float32) - pad, 0.0)
    y1 = jnp.maximum(min_row.astype(jnp.float32) - pad, 0.0)
    x2 = jnp.minimum(max_col.astype(jnp.float32) + pad, float(w))
    y2 = jnp.minimum(max_row.astype(jnp.float32) + pad, float(h))
    return jnp.stack([x1, y1, x2, y2])
