import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import dynhor_tpu.ops.resize as R
import dynhor_tpu.ops.roi_align as RA


@pytest.mark.parametrize("in_hw,out_hw", [((32, 32), (67, 67)), ((256, 256), (518, 518)), ((37, 41), (16, 20))])
def test_bicubic_matches_torch_align_corners(in_hw, out_hw):
    rng = np.random.RandomState(0)
    img = rng.rand(2, 3, *in_hw).astype(np.float32)
    got = np.asarray(R.resize_bicubic_align_corners(jnp.asarray(img), *out_hw))
    want = F.interpolate(
        torch.from_numpy(img), out_hw, mode="bicubic", align_corners=True
    ).numpy()
    np.testing.assert_allclose(got, want, atol=5e-5)


@pytest.mark.parametrize("in_hw,out_hw", [((256, 256), (37, 37)), ((10, 10), (37, 37)), ((64, 48), (16, 12))])
def test_nearest_matches_torch(in_hw, out_hw):
    rng = np.random.RandomState(1)
    img = rng.rand(1, 1, *in_hw).astype(np.float32)
    got = np.asarray(R.resize_nearest(jnp.asarray(img), *out_hw))
    want = F.interpolate(torch.from_numpy(img), out_hw, mode="nearest").numpy()
    np.testing.assert_allclose(got, want)


def _roi_align_direct(img, box, out_size, sampling_ratio):
    """Literal per-sample transcription of the detectron2/torchvision
    ROIAlign(aligned=True) algorithm — deliberately non-separable and
    scalar, as an independent golden reference (torchvision/detectron2 are
    not installed in this image)."""
    c, height, width = img.shape
    x1, y1, x2, y2 = [float(v) for v in box]
    roi_start_w, roi_start_h = x1 - 0.5, y1 - 0.5
    roi_w, roi_h = x2 - x1, y2 - y1
    bin_h = roi_h / out_size
    bin_w = roi_w / out_size
    grid_h = sampling_ratio if sampling_ratio > 0 else max(int(np.ceil(roi_h / out_size)), 1)
    grid_w = sampling_ratio if sampling_ratio > 0 else max(int(np.ceil(roi_w / out_size)), 1)

    def bilinear(ch, y, x):
        if y < -1.0 or y > height or x < -1.0 or x > width:
            return 0.0
        y = max(y, 0.0)
        x = max(x, 0.0)
        y_low, x_low = int(y), int(x)
        if y_low >= height - 1:
            y_high = y_low = height - 1
            y = float(y_low)
        else:
            y_high = y_low + 1
        if x_low >= width - 1:
            x_high = x_low = width - 1
            x = float(x_low)
        else:
            x_high = x_low + 1
        ly, lx = y - y_low, x - x_low
        hy, hx = 1.0 - ly, 1.0 - lx
        return (hy * hx * img[ch, y_low, x_low] + hy * lx * img[ch, y_low, x_high]
                + ly * hx * img[ch, y_high, x_low] + ly * lx * img[ch, y_high, x_high])

    out = np.zeros((c, out_size, out_size), np.float64)
    for ch in range(c):
        for ph in range(out_size):
            for pw in range(out_size):
                acc = 0.0
                for iy in range(grid_h):
                    yy = roi_start_h + ph * bin_h + (iy + 0.5) * bin_h / grid_h
                    for ix in range(grid_w):
                        xx = roi_start_w + pw * bin_w + (ix + 0.5) * bin_w / grid_w
                        acc += bilinear(ch, yy, xx)
                out[ch, ph, pw] = acc / (grid_h * grid_w)
    return out.astype(np.float32)


@pytest.mark.parametrize("box", [[2.0, 4.0, 50.0, 52.0], [-5.0, 3.0, 30.5, 29.5], [10.0, 10.0, 20.0, 25.0]])
def test_roi_align_matches_direct_reference(box):
    rng = np.random.RandomState(2)
    img = rng.rand(2, 60, 70).astype(np.float32)
    got = np.asarray(RA.roi_align(jnp.asarray(img), jnp.asarray(box), 16, sampling_ratio=2))
    want = _roi_align_direct(img, box, 16, 2)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_roi_align_exact_np_matches_direct_adaptive():
    # sampling_ratio=0 (adaptive) is the detectron2 default used at
    # ObjTracker/utils/bbox.py:32.
    rng = np.random.RandomState(3)
    img = rng.rand(1, 50, 60).astype(np.float32)
    box = np.array([5.0, 8.0, 45.0, 47.0])
    got = RA.roi_align_exact_np(img, box, 16)
    want = _roi_align_direct(img, box, 16, 0)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_crop_and_resize_batched():
    rng = np.random.RandomState(4)
    imgs = rng.rand(2, 1, 64, 64).astype(np.float32)
    boxes = np.array([[0.0, 0.0, 64.0, 64.0], [16.0, 16.0, 48.0, 48.0]], np.float32)
    out = np.asarray(RA.crop_and_resize(jnp.asarray(imgs), jnp.asarray(boxes), 32))
    assert out.shape == (2, 1, 32, 32)
    want0 = _roi_align_direct(imgs[0], boxes[0], 32, 2)
    np.testing.assert_allclose(out[0], want0, atol=1e-4)
