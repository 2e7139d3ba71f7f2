"""Rotation representations and SO(3) sampling (pure JAX).

Behavioral reference: ObjTracker/utils/geometry.py (rot6d, Zhou CVPR'19),
ObjTracker/utils/render.py:56-123 (Avro'92 uniform sampling, look-at grids),
ObjTracker/utils/camera.py:4-9 (geodesic angle).

Conventions
-----------
Vertices are ROW vectors throughout the tracker: ``verts @ R + T``
(reference: pose_initializtion.py:117, camera.py:205-206).  ``R`` in that
expression is the row-convention rotation; the OpenCV / object-to-camera
column-convention matrix is its transpose (reference: run.py:166).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def rot6d_to_matrix(rot_6d: Array) -> Array:
    """Continuous 6D rotation -> 3x3 matrix via Gram-Schmidt.

    Matches ObjTracker/utils/geometry.py:7-25 (Zhou et al. CVPR'19):
    the 6D code is the first two COLUMNS of the matrix.

    Args:
      rot_6d: (..., 6) or (..., 3, 2).

    Returns:
      (..., 3, 3) rotation matrices.
    """
    r = rot_6d.reshape(rot_6d.shape[: -1 if rot_6d.shape[-1] == 6 else -2] + (3, 2))
    a1 = r[..., 0]
    a2 = r[..., 1]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), 1e-12)
    a2_proj = jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2u = a2 - a2_proj
    b2 = b2u / jnp.maximum(jnp.linalg.norm(b2u, axis=-1, keepdims=True), 1e-12)
    b3 = jnp.cross(b1, b2)
    return jnp.stack((b1, b2, b3), axis=-1)


def matrix_to_rot6d(rotmat: Array) -> Array:
    """3x3 rotation -> 6D code (first two columns).

    Matches ObjTracker/utils/geometry.py:28-38.  Output shape (..., 3, 2).
    """
    return rotmat[..., :, :2]


def rotation_angle_difference(R1: Array, R2: Array) -> Array:
    """Geodesic angle between rotation matrices, in degrees.

    Matches ObjTracker/utils/camera.py:4-9: angle of ``R1 @ R2^T``.
    Broadcasts over leading dims.
    """
    R_rel = jnp.einsum("...ij,...kj->...ik", R1, R2)
    trace = jnp.trace(R_rel, axis1=-2, axis2=-1)
    cos_theta = jnp.clip(0.5 * (trace - 1.0), -1.0, 1.0)
    return jnp.degrees(jnp.arccos(cos_theta))


def random_rotations(key: Array, n: int) -> Array:
    """Uniform random rotation matrices, Avro'92 (shoemake subgroup method).

    Behavioral match of ObjTracker/utils/render.py:56-93 (same construction:
    ``-H @ Rz`` with Householder ``H = I - 2 v v^T``); RNG differs (JAX PRNG
    instead of torch.rand) but the distribution is identical (uniform Haar).

    Returns: (n, 3, 3).
    """
    x = jax.random.uniform(key, (3, n))
    x1, x2, x3 = x[0], x[1], x[2]
    tau = 2.0 * jnp.pi
    c1, s1 = jnp.cos(tau * x1), jnp.sin(tau * x1)
    zeros, ones = jnp.zeros_like(x1), jnp.ones_like(x1)
    R = jnp.stack(
        (
            jnp.stack((c1, s1, zeros), axis=1),
            jnp.stack((-s1, c1, zeros), axis=1),
            jnp.stack((zeros, zeros, ones), axis=1),
        ),
        axis=1,
    )  # (n, 3, 3)
    v = jnp.stack(
        (
            jnp.cos(tau * x2) * jnp.sqrt(x3),
            jnp.sin(tau * x2) * jnp.sqrt(x3),
            jnp.sqrt(1.0 - x3),
        ),
        axis=1,
    )  # (n, 3)
    eye = jnp.broadcast_to(jnp.eye(3), (n, 3, 3))
    H = eye - 2.0 * v[:, :, None] * v[:, None, :]
    return -jnp.matmul(H, R)


def look_at_rotation(camera_pos: Array, at: Array, up=(0.0, 1.0, 0.0)) -> Array:
    """World-to-camera rotation (OpenCV column convention, +z forward, y down).

    The camera looks from ``camera_pos`` toward ``at``.  Returns R_cv such
    that ``X_cam = R_cv @ X_world + t_cv`` with ``t_cv = -R_cv @ camera_pos``.

    OpenCV convention: +z_cam points from camera toward the scene, +y_cam
    points down in the image.  (The reference routes through PyTorch3D
    look_at_view_transform + opencv_from_cameras_projection,
    ObjTracker/utils/render.py:120-123,238; we construct the OpenCV pose
    directly.)
    """
    up = jnp.asarray(up, dtype=camera_pos.dtype)
    z_axis = at - camera_pos
    z_axis = z_axis / jnp.maximum(jnp.linalg.norm(z_axis, axis=-1, keepdims=True), 1e-12)
    x_axis = jnp.cross(up, z_axis)  # right-handed: x = up x z points "right"
    x_norm = jnp.linalg.norm(x_axis, axis=-1, keepdims=True)
    # Degenerate (looking straight up/down): fall back to x = (1, 0, 0).
    fallback = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], camera_pos.dtype), z_axis.shape)
    x_axis = jnp.where(x_norm > 1e-6, x_axis / jnp.maximum(x_norm, 1e-12), fallback)
    y_axis = jnp.cross(z_axis, x_axis)
    # Rows of R_cv are the camera axes expressed in world coords.  OpenCV
    # cameras have +y image-down; flipping y alone would give det=-1, so x
    # flips with it (x_cv = y_cv x z_cv = -x), keeping a proper rotation.
    return jnp.stack((-x_axis, -y_axis, z_axis), axis=-2)


def spherical_camera_rotations(
    num_azimuth: int, num_elevation: int, dtype=jnp.float32
) -> Array:
    """Azimuth x elevation grid of OpenCV world-to-camera rotations.

    Behavioral analog of ObjTracker/utils/render.py:95-123
    (get_uniform_SO3_RT): ``num_elevation`` elevations strictly between the
    poles plus the two polar views, times ``num_azimuth`` azimuths.

    Returns: (num_azimuth * num_elevation + 2, 3, 3).
    """
    azim = jnp.linspace(0.0, 360.0, num_azimuth + 1)[:-1]
    elev = jnp.linspace(-90.0, 90.0, num_elevation + 2)[1:-1]
    aa, ee = jnp.meshgrid(azim, elev)
    angles = jnp.stack([aa.reshape(-1), ee.reshape(-1)], axis=1)
    top_down = jnp.array([[0.0, -90.0 + 1e-3], [0.0, 90.0 - 1e-3]])
    angles = jnp.concatenate([angles, top_down], axis=0).astype(dtype)
    a = jnp.radians(angles[:, 0])
    e = jnp.radians(angles[:, 1])
    # Camera unit positions on the sphere (PyTorch3D spherical convention:
    # x = cos(e) sin(a), y = sin(e), z = cos(e) cos(a)).
    pos = jnp.stack([jnp.cos(e) * jnp.sin(a), jnp.sin(e), jnp.cos(e) * jnp.cos(a)], axis=1)
    return look_at_rotation(pos, jnp.zeros((1, 3), dtype))


def roll_matrices(num_roll: int, dtype=jnp.float32) -> Array:
    """In-plane roll rotations, linspace(-180, 180, num_roll) about +z.

    Reference: ObjTracker/utils/render.py:224-234 (rotate_on_spot rolls).
    """
    if num_roll == 1:
        angles = jnp.zeros((1,), dtype)
    else:
        angles = jnp.radians(jnp.linspace(-180.0, 180.0, num_roll)).astype(dtype)
    c, s = jnp.cos(angles), jnp.sin(angles)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([c, -s, z], axis=1),
            jnp.stack([s, c, z], axis=1),
            jnp.stack([z, z, o], axis=1),
        ],
        axis=1,
    )


def matrix_to_quaternion(R: Array) -> Array:
    """Rotation matrix -> unit quaternion (w, x, y, z), Shepperd's method
    (branchless: compute all four candidates, pick the best-conditioned).

    Args: R (..., 3, 3).  Returns (..., 4).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # Four candidate (unnormalized) quaternions.
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4, 4)
    norms = jnp.linalg.norm(cands, axis=-1)
    best = jnp.argmax(norms, axis=-1)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    # Canonical sign: w >= 0.
    return q * jnp.sign(jnp.where(q[..., :1] == 0, 1.0, q[..., :1]))


def quaternion_to_matrix(q: Array) -> Array:
    """Unit quaternion (w, x, y, z) -> rotation matrix (..., 3, 3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def quaternion_slerp(q0: Array, q1: Array, t: Array) -> Array:
    """Spherical interpolation between unit quaternions (shortest arc)."""
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0, -q1, q1)
    dot = jnp.abs(dot).clip(-1.0, 1.0)
    theta = jnp.arccos(dot)
    sin_theta = jnp.sin(theta)
    t = jnp.asarray(t)[..., None] if jnp.ndim(t) == q0.ndim - 1 else jnp.asarray(t)
    small = sin_theta < 1e-5
    w0 = jnp.where(small, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.maximum(sin_theta, 1e-12))
    w1 = jnp.where(small, t, jnp.sin(t * theta) / jnp.maximum(sin_theta, 1e-12))
    out = w0 * q0 + w1 * q1
    return out / jnp.maximum(jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12)


def center_and_normalize_verts(verts: Array) -> Array:
    """Center at centroid; scale so max vertex norm is 0.5.

    Matches ObjTracker/run.py:110-112 and vis.py:28-29 (unit half-diameter).
    """
    verts = verts - verts.mean(axis=0, keepdims=True)
    return verts / jnp.max(jnp.linalg.norm(verts, axis=1)) * 0.5
