"""Golden-value pose recovery tests (SURVEY.md §4): render target masks
from a known pose, perturb, optimize, assert recovery."""
import dataclasses

import pytest
import jax
import jax.numpy as jnp
import numpy as np

import dynhor_tpu.ops.rasterize as RZ
from dynhor_tpu.models import dino as D
from dynhor_tpu.tracker import jointopt as J
from dynhor_tpu.tracker import refine as RF
from dynhor_tpu.utils import geometry as G

SIZE = 64


def _mesh():
    # A small box mesh (asymmetric enough to lock rotation around z).
    v = np.array(
        [
            [-0.3, -0.2, -0.1],
            [0.3, -0.2, -0.1],
            [0.3, 0.2, -0.1],
            [-0.3, 0.2, -0.1],
            [-0.3, -0.2, 0.1],
            [0.3, -0.2, 0.1],
            [0.3, 0.2, 0.1],
            [-0.3, 0.2, 0.1],
        ],
        np.float32,
    )
    f = np.array(
        [
            [0, 1, 2], [0, 2, 3],
            [4, 6, 5], [4, 7, 6],
            [0, 4, 5], [0, 5, 1],
            [3, 2, 6], [3, 6, 7],
            [1, 5, 6], [1, 6, 2],
            [0, 3, 7], [0, 7, 4],
        ],
        np.int32,
    )
    mesh = RF.MeshArrays(
        verts=jnp.asarray(v),
        faces=jnp.asarray(f),
        face_uvs=jnp.zeros((len(f), 3, 2)) + 0.5,
        texture=jnp.ones((2, 2, 3)) * jnp.array([0.8, 0.4, 0.2]),
    )
    return mesh


def _K():
    return jnp.array(
        [[SIZE, 0, SIZE / 2], [0, SIZE, SIZE / 2], [0, 0, 1.0]], jnp.float32
    )


def _render_target(mesh, R_row, t):
    verts_t = mesh.verts @ R_row + t
    vp = RZ.project_perspective(verts_t, _K())
    frag = RZ.rasterize(vp, mesh.faces, (SIZE, SIZE), face_chunk=12)
    return (frag.pix_to_face >= 0).astype(jnp.float32)


def test_refine_coarse_recovers_pose():
    mesh = _mesh()
    R_true = np.asarray(G.random_rotations(jax.random.PRNGKey(0), 1))[0]
    t_true = np.array([0.05, -0.03, 2.0], np.float32)
    target = _render_target(mesh, jnp.asarray(R_true), jnp.asarray(t_true))

    # Perturb: ~10 degrees + small translation offset.
    dR = np.asarray(
        G.rot6d_to_matrix(
            G.matrix_to_rot6d(jnp.eye(3)[None])
            + 0.1 * jax.random.normal(jax.random.PRNGKey(1), (1, 3, 2))
        )
    )[0]
    R0 = R_true @ dR
    t0 = t_true + np.array([0.08, -0.06, 0.15], np.float32)

    cfg = RF.RefineConfig(
        num_iterations=150, lr=0.01, crop_size=SIZE, mode="coarse", face_chunk=12
    )
    targets = RF.FrameTargets(
        target_masks=target[None],
        gt_feats=jnp.zeros((1, 4, 8)),
        K_rois=_K()[None],
    )
    res = RF.refine_poses(
        mesh, targets, jnp.asarray(R0)[None], jnp.asarray(t0)[None], None, None, cfg
    )
    # ~0.92 is the sub-pixel ceiling at this tiny 64^2 scale (0.5 px of
    # boundary error on a ~20 px object costs ~0.06 IoU).
    assert float(res.final_iou[0]) > 0.90
    R_fit = np.asarray(G.rot6d_to_matrix(res.rot6d))[0]
    ang = float(
        G.rotation_angle_difference(jnp.asarray(R_fit)[None], jnp.asarray(R_true)[None])[0]
    )
    # Silhouette-only can't fully disambiguate, but should come close.
    assert ang < 12.0
    t_fit = np.asarray(res.translations)[0, 0]
    np.testing.assert_allclose(t_fit, t_true, atol=0.08)


def test_refine_fine_mode_runs_and_improves():
    mesh = _mesh()
    dcfg = D.DinoConfig(
        patch_size=8, embed_dim=32, depth=2, num_heads=2, pos_grid=4,
        smaller_edge_size=32,
    )
    dparams = D.init_params(jax.random.PRNGKey(0), dcfg)

    R_true = np.asarray(G.random_rotations(jax.random.PRNGKey(2), 1))[0]
    t_true = np.array([0.0, 0.0, 2.0], np.float32)
    target = _render_target(mesh, jnp.asarray(R_true), jnp.asarray(t_true))
    # gt feats from some reference image (here: random but fixed).
    gt_feats = jax.random.normal(jax.random.PRNGKey(3), (1, dcfg.feat_size**2, 32))
    gt_feats = gt_feats / jnp.linalg.norm(gt_feats, axis=-1, keepdims=True)

    cfg = RF.RefineConfig(
        num_iterations=5, lr=0.01, crop_size=SIZE, mode="fine", face_chunk=12
    )
    targets = RF.FrameTargets(
        target_masks=jnp.stack([target, target]),
        gt_feats=jnp.concatenate([gt_feats, gt_feats]),
        K_rois=jnp.stack([_K(), _K()]),
    )
    R0 = jnp.stack([jnp.asarray(R_true), jnp.asarray(R_true)])
    t0 = jnp.stack([jnp.asarray(t_true), jnp.asarray(t_true) + 0.05])
    res = RF.refine_poses(mesh, targets, R0, t0, dparams, dcfg, cfg)
    assert np.isfinite(np.asarray(res.final_loss)).all()
    assert res.rot6d.shape == (2, 3, 2)


@pytest.mark.mid
def test_jointopt_reduces_loss_and_smooths():
    mesh = _mesh()
    F = 6
    key = jax.random.PRNGKey(4)
    R_base = G.random_rotations(key, 1)[0]
    # Smooth ground-truth trajectory: slow roll about z.
    targets = []
    Rs_true = []
    for f in range(F):
        ang = 0.06 * f
        c, s = np.cos(ang), np.sin(ang)
        Rz = jnp.asarray(
            np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        )
        R = R_base @ Rz
        Rs_true.append(R)
        targets.append(_render_target(mesh, R, jnp.array([0.0, 0.0, 2.0])))
    targets = jnp.stack(targets)
    Rs_true = jnp.stack(Rs_true)

    # Jittered inits.
    noise = 0.08 * jax.random.normal(jax.random.PRNGKey(5), (F, 3, 2))
    R0 = G.rot6d_to_matrix(G.matrix_to_rot6d(Rs_true) + noise)
    t0 = jnp.tile(jnp.array([[0.0, 0.0, 2.0]]), (F, 1)) + 0.03 * jax.random.normal(
        jax.random.PRNGKey(6), (F, 3)
    )

    cfg = J.JointConfig(
        num_iterations=100, lr=1e-3, crop_size=SIZE, face_chunk=12,
        lw_smooth_obj=1.0,
    )
    res = J.joint_optimize(
        mesh.verts, mesh.faces, R0, t0, jnp.stack([_K()] * F), targets, cfg
    )
    hist = {k: np.asarray(v) for k, v in res.history.items()}
    assert hist["loss"][-1] < hist["loss"][0]
    assert hist["iou_object"][-1] > hist["iou_object"][0]
    assert hist["iou_object"][-1] > 0.8
    # History keys match the reference's TensorBoard scalars (jointopt.py:151-155).
    assert set(hist.keys()) == {
        "loss", "loss_sil_obj", "loss_smooth_obj", "iou_object", "bin_overflow",
    }


def test_jointopt_scale_frozen_by_default():
    mesh = _mesh()
    F = 2
    target = _render_target(mesh, jnp.eye(3), jnp.array([0.0, 0.0, 2.0]))
    cfg = J.JointConfig(num_iterations=5, crop_size=SIZE, face_chunk=12)
    res = J.joint_optimize(
        mesh.verts,
        mesh.faces,
        jnp.stack([jnp.eye(3)] * F),
        jnp.tile(jnp.array([[0.0, 0.0, 2.0]]), (F, 1)),
        jnp.stack([_K()] * F),
        jnp.stack([target] * F),
        cfg,
    )
    np.testing.assert_allclose(float(res.scale), 1.0)


def test_refine_multihyp_selects_recovering_init():
    """Two hypotheses per frame — one ~90 degrees off (unrecoverable in the
    iteration budget), one ~10 degrees off — the tournament must pick the
    near one per frame and the winner must recover the pose, including
    through the post-tournament continuation launches."""
    mesh = _mesh()
    R_true = np.asarray(G.random_rotations(jax.random.PRNGKey(0), 1))[0]
    t_true = np.array([0.05, -0.03, 2.0], np.float32)
    target = _render_target(mesh, jnp.asarray(R_true), jnp.asarray(t_true))

    dR = np.asarray(
        G.rot6d_to_matrix(
            G.matrix_to_rot6d(jnp.eye(3)[None])
            + 0.1 * jax.random.normal(jax.random.PRNGKey(1), (1, 3, 2))
        )
    )[0]
    R_near = R_true @ dR
    c, s = np.cos(np.radians(95.0)), np.sin(np.radians(95.0))
    R_far = R_true @ np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    # Hypothesis slot 0 = the BAD init (the gate pick being wrong is the
    # scenario multi-init exists for).
    rot_inits = jnp.asarray(np.stack([R_far, R_near])[None])  # (1, 2, 3, 3)
    t0 = t_true + np.array([0.08, -0.06, 0.15], np.float32)
    trans_inits = jnp.asarray(np.stack([t0, t0])[None])  # (1, 2, 3)

    cfg = RF.RefineConfig(
        num_iterations=150, lr=0.01, crop_size=SIZE, mode="coarse", face_chunk=12
    )
    targets = RF.FrameTargets(
        target_masks=target[None],
        gt_feats=jnp.zeros((1, 4, 8)),
        K_rois=_K()[None],
    )
    mres = RF.refine_poses_multihyp(
        mesh, targets, rot_inits, trans_inits, None, None, cfg,
        tournament_iters=50,
    )
    assert int(mres.winner[0]) == 1
    assert mres.tournament_loss.shape == (1, 2)
    assert float(mres.tournament_loss[0, 1]) < float(mres.tournament_loss[0, 0])
    res = mres.result
    assert float(res.final_iou[0]) > 0.90
    R_fit = np.asarray(G.rot6d_to_matrix(res.rot6d))[0]
    ang = float(
        G.rotation_angle_difference(
            jnp.asarray(R_fit)[None], jnp.asarray(R_true)[None]
        )[0]
    )
    assert ang < 12.0


def test_refine_multihyp_k1_matches_refine_poses():
    mesh = _mesh()
    R_true = np.asarray(G.random_rotations(jax.random.PRNGKey(7), 1))[0]
    target = _render_target(mesh, jnp.asarray(R_true), jnp.asarray([0.0, 0.0, 2.0]))
    cfg = RF.RefineConfig(
        num_iterations=10, lr=0.01, crop_size=SIZE, mode="coarse", face_chunk=12
    )
    targets = RF.FrameTargets(
        target_masks=target[None], gt_feats=jnp.zeros((1, 4, 8)), K_rois=_K()[None]
    )
    R0 = jnp.asarray(R_true)[None]
    t0 = jnp.asarray([[0.0, 0.0, 2.0]])
    single = RF.refine_poses(mesh, targets, R0, t0, None, None, cfg)
    multi = RF.refine_poses_multihyp(
        mesh, targets, R0[:, None], t0[:, None], None, None, cfg
    )
    np.testing.assert_allclose(
        np.asarray(multi.result.rot6d), np.asarray(single.rot6d), atol=1e-6
    )
    assert int(multi.winner[0]) == 0


def _rot_z(deg):
    c, s = np.cos(np.radians(deg)), np.sin(np.radians(deg))
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)


def test_viterbi_select_resolves_symmetric_flip_ties():
    """Per-frame argmin cannot disambiguate a silhouette-preserving flip
    (equal losses up to noise); the Viterbi path must pick the slot family
    that is temporally consistent — the measured shoes2 failure mode."""
    rng = np.random.default_rng(0)
    F = 8
    # Slot 0: a smooth true track; slot 1: its 180-deg flip (also smooth,
    # but frames 2 and 5 get a DIFFERENT flip axis, so the flip family is
    # inconsistent with itself across those frames).
    base = [np.asarray(G.rot6d_to_matrix(G.matrix_to_rot6d(
        jnp.asarray(_rot_z(3.0 * f))[None]))[0]) for f in range(F)]
    flip_x = np.diag([1.0, -1.0, -1.0]).astype(np.float32)
    flip_y = np.diag([-1.0, 1.0, -1.0]).astype(np.float32)
    rots = np.zeros((F, 2, 3, 3), np.float32)
    for f in range(F):
        rots[f, 0] = base[f]
        rots[f, 1] = base[f] @ (flip_y if f in (2, 5) else flip_x)
    # Losses: statistically identical; noise makes argmin pick slot 1 on
    # half the frames.
    losses = np.full((F, 2), 1.0, np.float32) + 0.01 * rng.standard_normal((F, 2)).astype(np.float32)
    argmin = np.argmin(losses, axis=1)
    assert argmin.min() != argmin.max(), "fixture must have mixed argmin"
    win = np.asarray(RF._viterbi_select(jnp.asarray(rots), jnp.asarray(losses)))
    assert (win == win[0]).all(), f"viterbi path not consistent: {win}"


def test_viterbi_select_respects_strong_loss_signal():
    """A decisive loss gap must beat mild temporal inconsistency: slot 1
    has far lower loss everywhere even though its track wobbles a little."""
    F = 6
    rots = np.zeros((F, 2, 3, 3), np.float32)
    for f in range(F):
        rots[f, 0] = np.eye(3, dtype=np.float32)  # perfectly smooth
        rots[f, 1] = _rot_z(10.0 * ((-1) ** f))  # wobbles +-10 deg
    losses = np.stack(
        [np.full(F, 5.0, np.float32), np.full(F, 1.0, np.float32)], axis=1
    )
    win = np.asarray(RF._viterbi_select(jnp.asarray(rots), jnp.asarray(losses)))
    assert (win == 1).all(), f"strong loss signal overridden: {win}"


def _mesh_asym():
    """Tapered box: the +z face shrunk 0.5x in x / 0.65x in y.  The plain
    box's silhouette is near-invariant under its D2 symmetries, so a far
    init can converge to a flip with loss EQUAL to the truth — correct
    per the cost model, but useless for a test that needs the loss to
    identify the true pose.  The taper breaks every such symmetry."""
    mesh = _mesh()
    v = np.asarray(mesh.verts).copy()
    v[4:, 0] *= 0.5
    v[4:, 1] *= 0.65
    return mesh._replace(verts=jnp.asarray(v))


def test_multihyp_propagation_rescues_frame_with_no_good_hypothesis():
    """3 frames, K=2: the middle frame's BOTH hypotheses are ~95 deg off
    (unrecoverable), its neighbours' slot-1 hypotheses are near the truth.
    propagate_rounds=1 must re-seed the middle frame from a neighbour's
    winner and recover the pose there too."""
    mesh = _mesh_asym()
    R_true = np.asarray(G.random_rotations(jax.random.PRNGKey(3), 1))[0]
    t_true = np.array([0.02, -0.01, 2.0], np.float32)
    target = _render_target(mesh, jnp.asarray(R_true), jnp.asarray(t_true))
    dR = np.asarray(
        G.rot6d_to_matrix(
            G.matrix_to_rot6d(jnp.eye(3)[None])
            + 0.08 * jax.random.normal(jax.random.PRNGKey(4), (1, 3, 2))
        )
    )[0]
    R_near = (R_true @ dR).astype(np.float32)
    R_far = (R_true @ _rot_z(95.0)).astype(np.float32)
    R_far2 = (R_true @ _rot_z(-100.0)).astype(np.float32)
    rot_inits = jnp.asarray(np.stack([
        np.stack([R_far, R_near]),   # frame 0: slot 1 good
        np.stack([R_far, R_far2]),   # frame 1: NOTHING good
        np.stack([R_far, R_near]),   # frame 2: slot 1 good
    ]))  # (3, 2, 3, 3)
    t0 = t_true + np.array([0.06, -0.04, 0.1], np.float32)
    trans_inits = jnp.asarray(np.tile(t0, (3, 2, 1)))
    cfg = RF.RefineConfig(
        num_iterations=150, lr=0.01, crop_size=SIZE, mode="coarse", face_chunk=12
    )
    targets = RF.FrameTargets(
        target_masks=jnp.stack([target] * 3),
        gt_feats=jnp.zeros((3, 4, 8)),
        K_rois=jnp.stack([_K()] * 3),
    )
    mres = RF.refine_poses_multihyp(
        mesh, targets, rot_inits, trans_inits, None, None, cfg,
        tournament_iters=60, select="viterbi", propagate_rounds=1,
    )
    R_fit = np.asarray(G.rot6d_to_matrix(mres.result.rot6d))
    ang = np.asarray(G.rotation_angle_difference(
        jnp.asarray(R_fit), jnp.asarray(np.stack([R_true] * 3))
    ))
    assert ang[0] < 12.0 and ang[2] < 12.0, f"anchor frames off: {ang}"
    assert ang[1] < 15.0, f"propagation failed to rescue middle frame: {ang}"
    assert float(mres.result.final_iou[1]) > 0.88
