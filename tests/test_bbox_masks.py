import jax.numpy as jnp
import numpy as np

from dynhor_tpu.utils import bbox as B
from dynhor_tpu.utils import masks as M


def test_bbox_conversions_roundtrip():
    b = np.array([10.0, 20.0, 30.0, 40.0])  # xyxy
    wh = B.bbox_xy_to_wh(b)
    np.testing.assert_allclose(wh, [10, 20, 20, 20])
    np.testing.assert_allclose(B.bbox_wh_to_xy(wh), b)
    # jax path
    wh_j = B.bbox_xy_to_wh(jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(wh_j), wh)


def test_make_bbox_square():
    b = np.array([0.0, 0.0, 100.0, 50.0])  # xywh
    sq = B.make_bbox_square(b, 0.0)
    np.testing.assert_allclose(sq, [0.0, -25.0, 100.0, 100.0])
    sq2 = B.make_bbox_square(b, 0.3)
    assert np.isclose(sq2[2], 130.0) and np.isclose(sq2[3], 130.0)
    # Center preserved.
    np.testing.assert_allclose(sq2[0] + sq2[2] / 2, 50.0)
    np.testing.assert_allclose(sq2[1] + sq2[3] / 2, 25.0)


def test_compute_iou():
    b1 = np.array([0.0, 0.0, 2.0, 2.0])
    b2 = np.array([1.0, 1.0, 3.0, 3.0])
    np.testing.assert_allclose(B.compute_iou(b1, b2), 1.0 / 7.0)
    np.testing.assert_allclose(np.asarray(B.compute_iou(jnp.asarray(b1), jnp.asarray(b2))), 1.0 / 7.0, rtol=1e-6)


def test_mask_tight_bbox():
    m = np.zeros((100, 120), dtype=bool)
    m[30:40, 50:70] = True
    box = np.asarray(B.mask_tight_bbox_xyxy(jnp.asarray(m), pad=5.0))
    # min_col=50, min_row=30, max_col=69, max_row=39 (+/-5 padding)
    np.testing.assert_allclose(box, [45.0, 25.0, 74.0, 44.0])
    # Clamping at image border.
    m2 = np.zeros((20, 20), dtype=bool)
    m2[0:3, 17:20] = True
    box2 = np.asarray(B.mask_tight_bbox_xyxy(jnp.asarray(m2), pad=5.0))
    np.testing.assert_allclose(box2, [12.0, 0.0, 20.0, 7.0])


def test_batch_mask_iou_vs_numpy():
    rng = np.random.RandomState(0)
    ref = (rng.rand(4, 16, 16) > 0.5).astype(np.float32)
    pred = rng.rand(4, 16, 16).astype(np.float32)
    got = np.asarray(M.batch_mask_iou(jnp.asarray(ref), jnp.asarray(pred)))
    inter = (ref * pred).sum((1, 2))
    union = (ref + pred - ref * pred).sum((1, 2))
    np.testing.assert_allclose(got, inter / (union + 1e-6), rtol=1e-5)


def test_add_occlusions_object_wins():
    obj = np.zeros((8, 8), np.float32)
    occ = np.zeros((8, 8), np.float32)
    obj[2:5, 2:5] = 1
    occ[3:8, 3:8] = 1
    out = np.asarray(M.add_occlusions(jnp.asarray(obj), jnp.asarray(occ)))
    assert out[2, 2] == 1  # object only
    assert out[3, 3] == 1  # overlap: object wins (maskutils.py:25-28)
    assert out[6, 6] == -1  # occluder only
    assert out[0, 0] == 0  # background
