"""Outlier voting: corrupt one frame's pose in a synthetic trajectory with
perfect correspondences and check it is detected and repaired."""
import jax
import jax.numpy as jnp
import numpy as np

import dynhor_tpu.ops.rasterize as RZ
from dynhor_tpu.neus.trainer import CorrData
from dynhor_tpu.tracker import outliers as O
from dynhor_tpu.utils import camera as C
from dynhor_tpu.utils import geometry as G

H, W = 96, 128
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


def test_quaternion_roundtrip_and_slerp():
    R = G.random_rotations(jax.random.PRNGKey(0), 32)
    q = G.matrix_to_quaternion(R)
    R2 = G.quaternion_to_matrix(q)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)
    # slerp endpoints
    q0, q1 = q[0], q[1]
    np.testing.assert_allclose(
        np.asarray(G.quaternion_slerp(q0, q1, jnp.float32(0.0))), np.asarray(q0), atol=1e-5
    )
    s1 = np.asarray(G.quaternion_slerp(q0, q1, jnp.float32(1.0)))
    assert np.allclose(s1, np.asarray(q1), atol=1e-5) or np.allclose(
        s1, -np.asarray(q1), atol=1e-5
    )
    # midpoint is a valid rotation halfway in angle
    qm = G.quaternion_slerp(q0, q1, jnp.float32(0.5))
    Rm = G.quaternion_to_matrix(qm)
    a_total = float(G.rotation_angle_difference(R[0][None], R[1][None])[0])
    a_half = float(G.rotation_angle_difference(R[0][None], Rm[None])[0])
    np.testing.assert_allclose(a_half, a_total / 2, atol=0.1)


def _make_sequence(f_frames=6, corrupt=None):
    K = np.asarray(C.intrinsics_from_image(H, W))
    R0 = np.asarray(G.random_rotations(jax.random.PRNGKey(1), 1))[0]
    Rs, Ts = [], []
    for i in range(f_frames):
        ang = 0.05 * i
        c, s = np.cos(ang), np.sin(ang)
        Rz = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        Rs.append(R0 @ Rz)
        Ts.append(np.array([0.01 * i, 0.0, 1.2], np.float32))
    Rs, Ts = np.stack(Rs), np.stack(Ts)
    gt = (Rs.copy(), Ts.copy())
    if corrupt is not None:
        bad = np.asarray(G.random_rotations(jax.random.PRNGKey(9), 1))[0]
        Rs[corrupt] = bad  # wildly wrong rotation
        Ts[corrupt] = Ts[corrupt] + np.array([0.15, -0.1, 0.3], np.float32)
    return Rs, Ts, K, gt


def _corr_from_gt(gt_Rs, gt_Ts, K, pairs):
    """Perfect correspondences: project surface points (face centroids
    pulled 2% toward the box center so their pixels land ON the depth map,
    not the silhouette edge) with GT poses."""
    pts = 0.98 * BOX_V[BOX_F].mean(axis=1)  # (12, 3)
    fi, fj, xi, xj = [], [], [], []
    for a, b in pairs:
        pa = pts @ gt_Rs[a] + gt_Ts[a]
        pb = pts @ gt_Rs[b] + gt_Ts[b]
        ua = np.asarray(C.batch_proj2d(jnp.asarray(pa)[None], jnp.asarray(K)[None]))[0]
        ub = np.asarray(C.batch_proj2d(jnp.asarray(pb)[None], jnp.asarray(K)[None]))[0]
        # Use only front-ish vertices (visible in the depth map).
        fi.append(np.full(len(ua), a, np.int32))
        fj.append(np.full(len(ua), b, np.int32))
        xi.append(ua.astype(np.float32))
        xj.append(ub.astype(np.float32))
    return CorrData(
        jnp.asarray(np.concatenate(fi)), jnp.asarray(np.concatenate(fj)),
        jnp.asarray(np.concatenate(xi)), jnp.asarray(np.concatenate(xj)),
    )


def test_outlier_detection_and_repair():
    bad = 3
    Rs, Ts, K, (gt_Rs, gt_Ts) = _make_sequence(6, corrupt=bad)
    pairs = [(i, i + 1) for i in range(5)] + [(i, i + 2) for i in range(4)]
    corr = _corr_from_gt(gt_Rs, gt_Ts, K, pairs)
    report = O.vote_outliers(
        jnp.asarray(BOX_V), jnp.asarray(BOX_F), Rs, Ts, K, corr, (H, W),
        threshold_px=6.0,
    )
    assert report.outliers[bad], f"scores: {report.frame_scores}"
    assert report.outliers.sum() == 1, f"scores: {report.frame_scores}"

    R_fix, T_fix = O.interpolate_poses(Rs, Ts, report.outliers)
    ang_before = float(
        G.rotation_angle_difference(jnp.asarray(Rs[bad])[None], jnp.asarray(gt_Rs[bad])[None])[0]
    )
    ang_after = float(
        G.rotation_angle_difference(jnp.asarray(R_fix[bad])[None], jnp.asarray(gt_Rs[bad])[None])[0]
    )
    assert ang_after < min(ang_before, 10.0)
    assert np.linalg.norm(T_fix[bad] - gt_Ts[bad]) < 0.05
    # Inlier frames untouched.
    np.testing.assert_allclose(R_fix[0], Rs[0])


def test_no_outliers_clean_sequence():
    Rs, Ts, K, (gt_Rs, gt_Ts) = _make_sequence(5, corrupt=None)
    pairs = [(i, i + 1) for i in range(4)]
    corr = _corr_from_gt(gt_Rs, gt_Ts, K, pairs)
    report = O.vote_outliers(
        jnp.asarray(BOX_V), jnp.asarray(BOX_F), Rs, Ts, K, corr, (H, W),
        threshold_px=6.0,
    )
    assert not report.outliers.any(), f"scores: {report.frame_scores}"
    R_fix, T_fix = O.interpolate_poses(Rs, Ts, report.outliers)
    np.testing.assert_allclose(R_fix, Rs)


def test_endpoint_outlier_copies_neighbor():
    Rs, Ts, K, (gt_Rs, gt_Ts) = _make_sequence(4, corrupt=0)
    outliers = np.array([True, False, False, False])
    R_fix, T_fix = O.interpolate_poses(Rs, Ts, outliers)
    np.testing.assert_allclose(R_fix[0], Rs[1])
    np.testing.assert_allclose(T_fix[0], Ts[1])
