import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynhor_tpu.utils import geometry as G


def test_rot6d_roundtrip():
    key = jax.random.PRNGKey(0)
    R = G.random_rotations(key, 32)
    r6 = G.matrix_to_rot6d(R)
    R2 = G.rot6d_to_matrix(r6)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)


def test_rot6d_orthonormal_from_arbitrary_input():
    key = jax.random.PRNGKey(1)
    r6 = jax.random.normal(key, (16, 6))
    R = G.rot6d_to_matrix(r6)
    eye = jnp.einsum("bij,bkj->bik", R, R)
    np.testing.assert_allclose(np.asarray(eye), np.tile(np.eye(3), (16, 1, 1)), atol=1e-5)
    det = np.linalg.det(np.asarray(R))
    np.testing.assert_allclose(det, np.ones(16), atol=1e-5)


def test_rot6d_flat_and_shaped_inputs_agree():
    key = jax.random.PRNGKey(2)
    r6 = jax.random.normal(key, (4, 6))
    R_flat = G.rot6d_to_matrix(r6)
    R_shaped = G.rot6d_to_matrix(r6.reshape(4, 3, 2))
    np.testing.assert_allclose(np.asarray(R_flat), np.asarray(R_shaped))


def test_random_rotations_are_rotations():
    R = G.random_rotations(jax.random.PRNGKey(3), 256)
    R = np.asarray(R)
    np.testing.assert_allclose(
        np.einsum("bij,bkj->bik", R, R), np.tile(np.eye(3), (256, 1, 1)), atol=1e-5
    )
    np.testing.assert_allclose(np.linalg.det(R), np.ones(256), atol=1e-5)


def test_random_rotations_roughly_uniform():
    # Column means ~0 and the rotated z-axis covers the sphere (coarse
    # uniformity check on the Avro'92 sampler; SURVEY.md §4).
    R = np.asarray(G.random_rotations(jax.random.PRNGKey(4), 4096))
    z = R[:, :, 2]
    assert np.abs(z.mean(0)).max() < 0.05
    # Each octant of the sphere gets a reasonable share.
    octant = (z > 0).astype(int) @ np.array([1, 2, 4])
    counts = np.bincount(octant, minlength=8) / len(z)
    assert counts.min() > 0.08 and counts.max() < 0.17


def test_rotation_angle_difference():
    # 90 degrees about z vs identity.
    Rz = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    ang = G.rotation_angle_difference(jnp.asarray(Rz)[None], jnp.eye(3)[None])
    np.testing.assert_allclose(np.asarray(ang), [90.0], atol=1e-4)
    ang0 = G.rotation_angle_difference(jnp.eye(3)[None], jnp.eye(3)[None])
    np.testing.assert_allclose(np.asarray(ang0), [0.0], atol=1e-3)


def test_look_at_rotation_is_proper_and_points_forward():
    pos = jnp.array([[0.0, 0.0, -3.0], [2.0, 1.0, 2.0], [0.0, 3.0, 0.001]])
    at = jnp.zeros((1, 3))
    R = np.asarray(G.look_at_rotation(pos, at))
    np.testing.assert_allclose(np.linalg.det(R), np.ones(3), atol=1e-5)
    # Camera-frame z axis (third row) points from camera toward `at`.
    for i in range(3):
        fwd = -np.asarray(pos)[i] / np.linalg.norm(np.asarray(pos)[i])
        np.testing.assert_allclose(R[i, 2], fwd, atol=1e-4)
    # A point at the look-at target lands on the optical axis with +z depth.
    t = -np.einsum("bij,bj->bi", R, np.asarray(pos))
    target_cam = np.einsum("bij,j->bi", R, np.zeros(3)) + t
    assert (target_cam[:, 2] > 0).all()
    np.testing.assert_allclose(target_cam[:, :2], 0.0, atol=1e-4)


def test_spherical_grid_count_and_validity():
    R = np.asarray(G.spherical_camera_rotations(6, 4))
    assert R.shape == (6 * 4 + 2, 3, 3)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-4)


def test_center_and_normalize_verts():
    v = jnp.asarray(np.random.RandomState(0).randn(100, 3) * 7 + 3)
    vn = np.asarray(G.center_and_normalize_verts(v))
    np.testing.assert_allclose(vn.mean(0), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(vn, axis=1).max(), 0.5, rtol=1e-5)


@pytest.mark.parametrize("num_roll", [1, 13])
def test_roll_matrices(num_roll):
    R = np.asarray(G.roll_matrices(num_roll))
    assert R.shape == (num_roll, 3, 3)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)
    # Roll is about +z: z-axis is fixed.
    np.testing.assert_allclose(R[:, 2, :], np.tile([0, 0, 1.0], (num_roll, 1)), atol=1e-6)
