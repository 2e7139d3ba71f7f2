"""Mask losses and occlusion-aware target composition (pure JAX).

Behavioral reference: ObjTracker/utils/losses.py:7-24 (batch_mask_iou) and
ObjTracker/utils/maskutils.py:8-30 (add_occlusions).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def batch_mask_iou(ref: Array, pred: Array, eps: float = 1e-6) -> Array:
    """Soft IoU over the last two (spatial) axes.

    Matches ObjTracker/utils/losses.py:7-24.  The reference's runtime
    [0, 1]-range validation becomes an optional checkify-style debug assert
    upstream; inside jit we keep the math pure.

    Args:
      ref, pred: (..., H, W) in [0, 1].

    Returns: (...,) IoU.
    """
    ref = ref.astype(jnp.float32)
    pred = pred.astype(jnp.float32)
    inter = ref * pred
    union = ref + pred - inter
    return inter.sum((-1, -2)) / (union.sum((-1, -2)) + eps)


def add_occlusions(obj_crop_mask: Array, occluder_crop: Array) -> Array:
    """Compose the tri-valued target mask: 1 object, 0 background, -1 occluder.

    Matches ObjTracker/utils/maskutils.py:8-30: occluder pixels get -1,
    then object pixels are drawn back to 1 (object wins over occluder).
    Both masks are already cropped to the same square ROI (the reference
    crops the occluder via BitMasks.crop_and_resize; we crop upstream with
    ops.roi_align).

    Args:
      obj_crop_mask: (..., S, S) object mask in the crop, {0, 1}.
      occluder_crop: (..., S, S) occluder (hand) mask in the crop, {0, 1}.

    Returns: (..., S, S) float32 in {-1, 0, 1}.
    """
    obj = obj_crop_mask > 0
    occ = occluder_crop > 0
    out = jnp.where(occ, -1.0, 0.0)
    out = jnp.where(obj, 1.0, out)
    return out.astype(jnp.float32)
