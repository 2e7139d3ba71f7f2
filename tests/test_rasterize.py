import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dynhor_tpu.ops.rasterize as RZ
import dynhor_tpu.ops.silhouette as SIL
from dynhor_tpu.ops.shading import default_lights, phong_shade, sample_texture


def _square_mesh(z=2.0, half=0.5):
    """Two triangles forming a square centered on the optical axis."""
    verts = jnp.array(
        [
            [-half, -half, z],
            [half, -half, z],
            [half, half, z],
            [-half, half, z],
        ]
    )
    faces = jnp.array([[0, 1, 2], [0, 2, 3]], jnp.int32)
    return verts, faces


def _K(size, f=None):
    f = f if f is not None else size
    return jnp.array([[f, 0, size / 2], [0, f, size / 2], [0, 0, 1.0]])


def test_project_perspective():
    K = _K(64, f=32.0)
    pts = jnp.array([[0.0, 0.0, 2.0], [1.0, 1.0, 2.0]])
    out = np.asarray(RZ.project_perspective(pts, K))
    np.testing.assert_allclose(out[0], [32.0, 32.0, 2.0], atol=1e-6)
    np.testing.assert_allclose(out[1], [48.0, 48.0, 2.0], atol=1e-5)


def test_rasterize_square_coverage_and_depth():
    size = 64
    verts, faces = _square_mesh(z=2.0, half=0.5)
    K = _K(size, f=size)  # square projects to +-16 px around center
    vp = RZ.project_perspective(verts, K)
    frag = RZ.rasterize(vp, faces, (size, size), face_chunk=2)
    hit = np.asarray(frag.pix_to_face >= 0)
    # Interior pixel / exterior pixel.
    assert hit[32, 32]
    assert hit[20, 20]  # 32-16=16 edge; (20, 20) inside
    assert not hit[10, 10]
    assert not hit[32, 50]
    zb = np.asarray(frag.zbuf)
    np.testing.assert_allclose(zb[32, 32], 2.0, atol=1e-5)
    assert zb[0, 0] == -1.0
    # Coverage area ~ (32 px)^2.
    assert abs(hit.sum() - 1024) < 140


def test_rasterize_occlusion_picks_nearer_face():
    # Two stacked squares; nearer one wins.
    v1, f1 = _square_mesh(z=2.0)
    v2, _ = _square_mesh(z=1.0, half=0.25)
    verts = jnp.concatenate([v1, v2])
    faces = jnp.concatenate([f1, f1 + 4])
    size = 64
    vp = RZ.project_perspective(verts, _K(size, f=size))
    frag = RZ.rasterize(vp, faces, (size, size), face_chunk=2)
    # Center pixel: nearer square (faces 2/3), depth 1.
    assert int(frag.pix_to_face[32, 32]) >= 2
    np.testing.assert_allclose(float(frag.zbuf[32, 32]), 1.0, atol=1e-5)


def test_rasterize_barycentric_interpolation():
    size = 32
    verts, faces = _square_mesh(z=2.0)
    vp = RZ.project_perspective(verts, _K(size, f=size))
    frag = RZ.rasterize(vp, faces, (size, size), face_chunk=2)
    # Interpolate x-coordinate: at the center pixel it should be ~0.
    attr = verts[:, :1]
    out = RZ.interpolate_attributes(frag, faces, attr)
    np.testing.assert_allclose(float(out[16, 16, 0]), 0.0, atol=0.05)
    # And the barycentrics sum to 1 on hits.
    bsum = np.asarray(frag.bary.sum(-1))
    hits = np.asarray(frag.pix_to_face >= 0)
    np.testing.assert_allclose(bsum[hits], 1.0, atol=1e-4)


def test_soft_silhouette_matches_hard_coverage():
    size = 64
    verts, faces = _square_mesh(z=2.0)
    vp = RZ.project_perspective(verts, _K(size, f=size))
    frag = RZ.rasterize(vp, faces, (size, size), face_chunk=2)
    hard = np.asarray(frag.pix_to_face >= 0).astype(np.float32)
    soft = np.asarray(SIL.soft_silhouette(vp, faces, (size, size), sigma=0.05, face_chunk=2))
    assert soft.min() >= 0.0 and soft.max() <= 1.0
    # Away from edges (2 px margin) soft == hard — EXCEPT the sub-pixel band
    # along the interior shared edge (probabilistic union dips there).
    import scipy.ndimage as ndi

    edge = ndi.binary_dilation(hard > 0.5, iterations=2) & ~ndi.binary_erosion(
        hard > 0.5, iterations=2
    )
    interior_seam = np.eye(size, dtype=bool)  # the square's shared diagonal
    interior_seam = ndi.binary_dilation(interior_seam, iterations=2)
    ok = ~(edge | interior_seam)
    np.testing.assert_allclose(soft[ok], hard[ok], atol=0.05)


def test_silhouette_straight_through_exact_forward():
    size = 64
    verts, faces = _square_mesh(z=2.0)
    vp = RZ.project_perspective(verts, _K(size, f=size))
    frag = RZ.rasterize(vp, faces, (size, size), face_chunk=2)
    hard = np.asarray(frag.pix_to_face >= 0).astype(np.float32)
    st = np.asarray(
        SIL.silhouette_straight_through(vp, faces, (size, size), face_chunk=2)
    )
    np.testing.assert_array_equal(st, hard)
    # Gradients still flow (from the soft path).
    def loss(dx):
        v = verts + jnp.array([dx, 0.0, 0.0])
        vpix = RZ.project_perspective(v, _K(size, f=size))
        s = SIL.silhouette_straight_through(vpix, faces, (size, size), face_chunk=2)
        return jnp.sum((s - jnp.asarray(hard)) ** 2)

    assert float(jax.grad(loss)(0.05)) > 0.0


def test_soft_silhouette_gradient_pulls_toward_target():
    # Shift the square right; the gradient of (1 - IoU-like L2) w.r.t. a
    # translation parameter should push it back. Validates the custom
    # differentiable path end to end.
    size = 32
    verts, faces = _square_mesh(z=2.0)
    K = _K(size, f=size)

    def render(dx):
        v = verts + jnp.array([dx, 0.0, 0.0])
        vp = RZ.project_perspective(v, K)
        return SIL.soft_silhouette(vp, faces, (size, size), sigma=0.25, face_chunk=2)

    target = render(0.0)

    def loss(dx):
        return jnp.sum((render(dx) - target) ** 2)

    g = jax.grad(loss)(0.08)
    assert float(g) > 0.0  # moving right increases loss -> positive gradient
    g2 = jax.grad(loss)(-0.08)
    assert float(g2) < 0.0


def test_soft_silhouette_gradcheck_small():
    # Finite-difference check on a tiny triangle (SURVEY.md §4 kernel tests).
    size = 16
    verts = jnp.array([[-0.3, -0.2, 2.0], [0.4, -0.1, 2.0], [0.0, 0.5, 2.0]])
    faces = jnp.array([[0, 1, 2]], jnp.int32)
    K = _K(size, f=size)

    def f(v):
        vp = RZ.project_perspective(v, K)
        # squared mode: smooth everywhere (linear mode has a sqrt kink at
        # d=0, where finite differences straddle the non-differentiability).
        s = SIL.soft_silhouette(
            vp, faces, (size, size), sigma=0.5, face_chunk=1, dist_mode="squared"
        )
        return jnp.sum(s * s)

    g = jax.grad(f)(verts)
    eps = 1e-3
    for i in range(3):
        for j in range(2):
            vp = verts.at[i, j].add(eps)
            vm = verts.at[i, j].add(-eps)
            fd = (f(vp) - f(vm)) / (2 * eps)
            np.testing.assert_allclose(float(g[i, j]), float(fd), rtol=0.05, atol=1e-3)


def test_vertex_normals_flat_square():
    verts, faces = _square_mesh(z=2.0)
    n = np.asarray(RZ.compute_vertex_normals(verts, faces))
    # Planar square in z=2 plane: normals along -z or +z consistently.
    np.testing.assert_allclose(np.abs(n[:, 2]), 1.0, atol=1e-6)
    np.testing.assert_allclose(n[:, :2], 0.0, atol=1e-6)


def test_sample_texture_corners():
    tex = jnp.zeros((4, 4, 3)).at[0, 0].set(jnp.array([1.0, 0, 0])).at[3, 3].set(
        jnp.array([0, 1.0, 0])
    )
    # uv (0,1) is top-left of the image (v flipped), uv (1,0) bottom-right.
    out = np.asarray(sample_texture(tex, jnp.array([[0.0, 1.0], [1.0, 0.0]])))
    np.testing.assert_allclose(out[0], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(out[1], [0, 1, 0], atol=1e-6)


def test_phong_shade_camera_facing():
    size = 32
    verts, faces = _square_mesh(z=2.0)
    # Normals facing the camera (-z).
    vn = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (4, 1))
    vp = RZ.project_perspective(verts, _K(size, f=size))
    frag = RZ.rasterize(vp, faces, (size, size), face_chunk=2)
    fuv = jnp.zeros((2, 3, 2)) + 0.5
    tex = jnp.ones((2, 2, 3))
    img = np.asarray(
        phong_shade(frag, faces, verts, vn, fuv, tex, default_lights())
    )
    assert img.shape == (size, size, 4)
    # Center: lit by ambient+diffuse: 0.6 + 0.4ish (light at camera, n.l=1).
    assert img[16, 16, 3] == 1.0
    np.testing.assert_allclose(img[16, 16, 0], 1.0, atol=0.05)  # 0.6+0.4+eps spec
    # Background is white with alpha 0.
    np.testing.assert_allclose(img[0, 0], [1, 1, 1, 0], atol=1e-6)


def test_degenerate_faces_have_finite_gradients():
    """Real meshes contain exactly-zero-area faces (UV-sphere poles, padded
    faces). Every 1/area site must use the double-where pattern — a single
    where still evaluates 1/0 in the backward (inf * 0 = NaN)."""
    import dynhor_tpu.ops.rasterize_tiled as RT

    size = 32
    verts = jnp.array(
        [
            [-0.3, -0.2, 2.0], [0.4, -0.1, 2.0], [0.0, 0.5, 2.0],
            [0.1, 0.1, 2.0],  # duplicated position for the degenerate face
        ]
    )
    faces = jnp.array([[0, 1, 2], [3, 3, 3], [1, 2, 3]], jnp.int32)
    K = _K(size, f=size)

    def loss_soft(v):
        vp = RZ.project_perspective(v, K)
        return jnp.sum(SIL.soft_silhouette(vp, faces, (size, size), face_chunk=3) ** 2)

    def loss_tiled(v):
        vp = RZ.project_perspective(v, K)
        return jnp.sum(RT.soft_silhouette_tiled(vp, faces, (size, size)) ** 2)

    def loss_frag(v):
        vp = RZ.project_perspective(v, K)
        frag = RT.rasterize_tiled(vp, faces, (size, size))
        return jnp.sum(frag.bary**2) + jnp.sum(RZ.compute_vertex_normals(v, faces) ** 2)

    for fn in [loss_soft, loss_tiled, loss_frag]:
        g = jax.grad(fn)(verts)
        assert np.isfinite(np.asarray(g)).all(), fn.__name__
