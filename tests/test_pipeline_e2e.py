"""Miniature end-to-end pipeline test (SURVEY.md §4: synthetic video of a
known mesh under a scripted trajectory, through the full run.py-equivalent,
asserting the npz schema and trajectory recovery plumbing)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml
from PIL import Image

import dynhor_tpu.ops.rasterize as RZ
from dynhor_tpu.io.artifacts import load_pose_npz, save_pose_npzs
from dynhor_tpu.io.config import DEFAULTS, load_config
from dynhor_tpu.models import dino as D
from dynhor_tpu.ops.shading import default_lights, phong_shade
from dynhor_tpu.tracker import pipeline as PL
from dynhor_tpu.utils import camera as cam
from dynhor_tpu.utils import geometry as G

H, W = 120, 160
FRAMES = 4

BOX_V = np.array(
    [
        [-0.3, -0.2, -0.1], [0.3, -0.2, -0.1], [0.3, 0.2, -0.1], [-0.3, 0.2, -0.1],
        [-0.3, -0.2, 0.1], [0.3, -0.2, 0.1], [0.3, 0.2, 0.1], [-0.3, 0.2, 0.1],
    ],
    np.float32,
)
BOX_F = np.array(
    [
        [0, 1, 2], [0, 2, 3], [4, 6, 5], [4, 7, 6], [0, 4, 5], [0, 5, 1],
        [3, 2, 6], [3, 6, 7], [1, 5, 6], [1, 6, 2], [0, 3, 7], [0, 7, 4],
    ],
    np.int32,
)


def _write_box_obj(path):
    with open(path, "w") as f:
        for v in BOX_V:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for face in BOX_F + 1:
            f.write(f"f {face[0]} {face[1]} {face[2]}\n")


@pytest.fixture(scope="module")
def demo_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("seq")
    os.makedirs(root / "rgb")
    os.makedirs(root / "sam_seg")
    _write_box_obj(root / "box.obj")

    K = cam.intrinsics_from_image(H, W)
    verts = jnp.asarray(BOX_V)
    faces = jnp.asarray(BOX_F)
    R0 = G.random_rotations(jax.random.PRNGKey(0), 1)[0]
    gt_R, gt_T = [], []
    for i in range(FRAMES):
        ang = 0.06 * i
        c, s = np.cos(ang), np.sin(ang)
        Rz = jnp.asarray(np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32))
        R_row = R0 @ Rz
        t = jnp.array([0.02 * i, -0.01 * i, 1.6], jnp.float32)
        vc = verts @ R_row + t
        vn = RZ.compute_vertex_normals(vc, faces)
        vp = RZ.project_perspective(vc, K)
        frag = RZ.rasterize(vp, faces, (H, W), face_chunk=12)
        rgba = np.asarray(
            phong_shade(
                frag, faces, vc, vn, jnp.zeros((12, 3, 2)) + 0.5,
                jnp.ones((2, 2, 3)) * jnp.array([0.7, 0.45, 0.3]), default_lights(),
            )
        )
        obj = rgba[:, :, 3] > 0.5
        rgb = np.where(obj[:, :, None], np.clip(rgba[:, :, :3], 0, 1), 0.4)
        # small synthetic "hand" disc at bottom of object
        ys, xs = np.nonzero(obj)
        yy, xx = np.mgrid[0:H, 0:W]
        hand = (yy - ys.max()) ** 2 + (xx - int(xs.mean())) ** 2 < 9**2
        visible = obj & ~hand
        seg = np.zeros((H, W, 3), np.uint8)
        seg[:, :, 1] = visible.astype(np.uint8) * 255
        seg[:, :, 2] = hand.astype(np.uint8) * 255
        Image.fromarray((rgb * 255).astype(np.uint8)).save(root / "rgb" / f"{i:04d}.jpg")
        Image.fromarray(seg).save(root / "sam_seg" / f"{i:04d}.png")
        gt_R.append(np.asarray(R_row))
        gt_T.append(np.asarray(t))
    np.savez(root / "gt_poses.npz", R=np.stack(gt_R), T=np.stack(gt_T))
    return root


def test_load_sequence_and_process(demo_dir):
    seq = PL.load_sequence(str(demo_dir))
    assert len(seq.frame_ids) == FRAMES
    assert seq.images.shape == (FRAMES, H, W, 3)
    assert seq.obj_masks.any() and seq.hand_masks.any()
    ann = PL.process_frames(seq, crop_size=64)
    assert ann.crop_images.shape == (FRAMES, 3, 64, 64)
    assert ann.target_masks.shape == (FRAMES, 64, 64)
    # Tri-valued targets: hand pixels -1 present, object 1, bg 0.
    assert (ann.target_masks == -1).any()
    assert (ann.target_masks == 1).any()
    assert (ann.target_masks == 0).any()
    # Crop images white outside the object mask.
    bg = ann.target_masks[0] <= 0
    assert ann.crop_images[0][:, bg].mean() > 0.5


def _tiny_config(demo_dir):
    cfg = load_config_from_dict(
        {
            "seq_name": "boxseq",
            "exp_name": "pred",
            "data_info": {
                "dataroot": str(demo_dir),
                "obj_path": str(demo_dir / "box.obj"),
                "normalize_mesh": False,
            },
            "system": {
                "init_num_iterations": 12,
                "init_lr": 0.01,
                "joint_num_iterations": 15,
                "joint_lr": 0.001,
                "crop_size": 64,
                "face_chunk": 12,
                "prior": {"num_views": 24, "view_chunk": 6, "render_hw": [96, 96]},
                "dino": {"smaller_edge_size": 32},
            },
        }
    )
    return cfg


def load_config_from_dict(user):
    import copy

    from dynhor_tpu.io.config import DEFAULTS, _merge

    cfg = copy.deepcopy(DEFAULTS)
    _merge(cfg, user)
    return cfg


def _tiny_dino():
    dcfg = D.DinoConfig(
        patch_size=8, embed_dim=32, depth=2, num_heads=2, pos_grid=4,
        smaller_edge_size=32,
    )
    return D.init_params(jax.random.PRNGKey(0), dcfg), dcfg


@pytest.mark.parametrize("parallel", [True, False])
@pytest.mark.mid
def test_track_sequence_end_to_end(demo_dir, tmp_path, parallel):
    cfg = _tiny_config(demo_dir)
    cfg["system"]["parallel_refine"] = parallel
    if not parallel:
        cfg["system"]["init_num_iterations"] = 5
        cfg["system"]["joint_num_iterations"] = 5
    seq = PL.load_sequence(str(demo_dir))
    ann = PL.process_frames(seq, crop_size=64)
    mesh = PL.load_mesh(str(demo_dir / "box.obj"), normalize=False)
    dparams, dcfg = _tiny_dino()
    res = PL.track_sequence(cfg, seq, ann, mesh, dino_params=dparams, dino_cfg=dcfg)

    assert res.rotations_row.shape == (FRAMES, 3, 3)
    assert res.translations.shape == (FRAMES, 1, 3)
    # Rotations stay orthonormal.
    eye = np.einsum("bij,bkj->bik", res.rotations_row, res.rotations_row)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (FRAMES, 1, 1)), atol=1e-4)
    assert np.isfinite(res.history["loss"]).all()
    assert set(res.history) == {
        "loss", "loss_sil_obj", "loss_smooth_obj", "iou_object", "bin_overflow",
    }
    # With silhouette supervision the joint stage should fit reasonably.
    assert res.history["iou_object"][-1] > 0.5

    # npz export + reload contract (run.py:165-179 / vis.py:41-51).
    exp_dir = str(tmp_path / "exp")
    save_pose_npzs(exp_dir, seq.frame_ids, res.rotations_row, res.translations, res.K)
    data = load_pose_npz(exp_dir, seq.frame_ids[0])
    assert set(data.keys()) == {"R", "T", "K"}
    np.testing.assert_allclose(data["R"], res.rotations_row[0].T, atol=1e-6)


def test_visualizer_overlay(demo_dir):
    from dynhor_tpu.visualizer import Visualizer

    seq = PL.load_sequence(str(demo_dir))
    img = seq.images[0].astype(np.float32) / 255.0
    vis = Visualizer((H, W))
    verts_cam = BOX_V @ np.eye(3) + np.array([0, 0, 1.6], np.float32)
    out = vis.draw_mesh(img, verts_cam, BOX_F, (144.0, 144.0, W // 2, H // 2))
    assert out.shape == (H, W, 3)
    assert np.isfinite(out).all()
    assert not np.allclose(out, img)  # something was drawn


@pytest.mark.mid
def test_track_sequence_grid_render_mode(demo_dir):
    # Grid prior mode (reference `random_render: false` -> azimuth x
    # elevation x roll grid, run.py:134-136) through the full pipeline.
    cfg = _tiny_config(demo_dir)
    cfg["random_render"] = False
    cfg["system"]["prior"]["grid"] = [4, 3, 2]  # (4*3+2)*2 = 28 views
    cfg["system"]["init_num_iterations"] = 5
    cfg["system"]["joint_num_iterations"] = 5
    seq = PL.load_sequence(str(demo_dir))
    ann = PL.process_frames(seq, crop_size=64)
    mesh = PL.load_mesh(str(demo_dir / "box.obj"), normalize=False)
    dparams, dcfg = _tiny_dino()
    res = PL.track_sequence(cfg, seq, ann, mesh, dino_params=dparams, dino_cfg=dcfg)
    assert res.rotations_row.shape == (FRAMES, 3, 3)
    # Every selected index addresses the grid's view set.
    n_grid = (4 * 3 + 2) * 2
    assert (res.selected_idx >= 0).all() and (res.selected_idx < n_grid).all()
    assert np.isfinite(res.history["loss"]).all()


@pytest.mark.slow
def test_gate_mode_ab_parallel_vs_sequential(demo_dir):
    """VERDICT r2 weak #5: the parallel gate threads the SELECTED rotation
    where the reference (sequential parity mode) threads the REFINED one
    (selection.py:22-31).  A/B both modes on the same clip: selected prior
    indices must agree and the final joint IoU must match within tolerance
    — converting the 'matches in practice' claim into evidence.
    Reference control flow: pose_initializtion.py:404-457."""
    base = _tiny_config(demo_dir)
    base["system"]["init_num_iterations"] = 10
    base["system"]["joint_num_iterations"] = 10
    seq = PL.load_sequence(str(demo_dir))
    ann = PL.process_frames(seq, crop_size=64)
    mesh = PL.load_mesh(str(demo_dir / "box.obj"), normalize=False)
    dparams, dcfg = _tiny_dino()

    results = {}
    for parallel in (True, False):
        cfg = load_config_from_dict(base)
        cfg["system"]["parallel_refine"] = parallel
        results[parallel] = PL.track_sequence(
            cfg, seq, ann, mesh, dino_params=dparams, dino_cfg=dcfg
        )
    np.testing.assert_array_equal(
        results[True].selected_idx, results[False].selected_idx
    )
    iou_p = results[True].history["iou_object"][-1]
    iou_s = results[False].history["iou_object"][-1]
    assert abs(iou_p - iou_s) < 0.02, (iou_p, iou_s)
    # Refined poses from the two modes agree to optimizer noise.
    np.testing.assert_allclose(
        results[True].rotations_row, results[False].rotations_row, atol=0.05
    )
