import os

import numpy as np
import pytest
from PIL import Image

from dynhor_tpu.neus import data as ND

H, W, F = 40, 48, 3


@pytest.fixture()
def recon_root(tmp_path):
    root = tmp_path / "seq"
    for sub in ["rgb", "sam_seg", "monocular_normal", "correspondence_infos"]:
        os.makedirs(root / sub)
    poses = tmp_path / "obj_infos"
    os.makedirs(poses)
    rng = np.random.RandomState(0)
    K = np.array([[50.0, 0, W / 2], [0, 50.0, H / 2], [0, 0, 1]], np.float32)
    for i in range(F):
        fid = f"{i:04d}"
        Image.fromarray(rng.randint(0, 255, (H, W, 3), np.uint8)).save(
            root / "rgb" / f"{fid}.jpg"
        )
        seg = np.zeros((H, W, 3), np.uint8)
        seg[10:30, 10:40, 1] = 255
        Image.fromarray(seg).save(root / "sam_seg" / f"{fid}.png")
        nrm = np.full((H, W, 3), 128, np.uint8)
        nrm[:, :, 2] = 255  # normals ~ +z
        Image.fromarray(nrm).save(root / "monocular_normal" / f"{fid}.png")
        if i < F - 1:  # last frame has no pose -> must be skipped
            np.savez(
                poses / f"{fid}.npz", R=np.eye(3, dtype=np.float32),
                T=np.array([0, 0, 2.0], np.float32), K=K,
            )
    np.savez(
        root / "correspondence_infos" / "pairs_0000_0001.npz",
        frame_i="0000", frame_j="0001",
        xy_i=np.array([[12.0, 15.0], [20.0, 22.0]], np.float32),
        xy_j=np.array([[13.0, 15.5], [21.0, 22.5]], np.float32),
    )
    return root, poses


def test_load_recon_data(recon_root):
    root, poses = recon_root
    data, ids = ND.load_recon_data(str(root), str(poses), downscale=1)
    assert ids == ["0000", "0001"]  # frame without pose skipped (vis.py:44)
    assert data.images.shape == (2, H, W, 3)
    assert data.masks.shape == (2, H, W)
    assert data.normals.shape == (2, H, W, 3)
    # Normal decode: (128, 128, 255)/255*2-1 ~ (0, 0, 1).
    n = np.asarray(data.normals[0, 5, 5])
    np.testing.assert_allclose(n, [0.0039, 0.0039, 1.0], atol=0.01)
    assert float(data.masks[0, 20, 20]) == 1.0
    assert float(data.masks[0, 0, 0]) == 0.0


def test_load_recon_data_downscale(recon_root):
    root, poses = recon_root
    data, ids = ND.load_recon_data(str(root), str(poses), downscale=2)
    assert data.images.shape == (2, H // 2, W // 2, 3)
    np.testing.assert_allclose(float(data.K[0, 0]), 25.0)


def test_load_correspondences(recon_root):
    root, poses = recon_root
    _, ids = ND.load_recon_data(str(root), str(poses))
    corr = ND.load_correspondences(str(root), ids, downscale=1)
    assert corr is not None
    assert corr.xy_i.shape == (2, 2)
    np.testing.assert_array_equal(np.asarray(corr.frame_i), [0, 0])
    np.testing.assert_array_equal(np.asarray(corr.frame_j), [1, 1])
    # Missing dir -> None
    assert ND.load_correspondences(str(poses), ids) is None
