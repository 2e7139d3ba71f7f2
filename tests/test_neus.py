import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynhor_tpu.neus import extract as EX
from dynhor_tpu.neus import fields as F
from dynhor_tpu.neus import rendering as R
from dynhor_tpu.neus import trainer as T


def _small_cfg(encoder="pe"):
    return F.SDFConfig(
        encoder=encoder, pe_freqs=4, hidden=64, depth=4, skip_layer=2,
        feat_dim=32, color_hidden=64, color_depth=3,
        hash_levels=4, hash_table_size=2**12, hash_base_res=4, hash_max_res=32,
        hash_hidden=32, hash_depth=2,
    )


def test_geometric_init_approximates_sphere():
    cfg = _small_cfg()
    params = F.init_field_params(jax.random.PRNGKey(0), cfg)
    pts = jnp.array([[0.0, 0.0, 0.0], [0.9, 0.0, 0.0], [0.0, 0.9, 0.0]])
    sdf, feat = F.sdf_forward(params, pts, cfg)
    assert float(sdf[0]) < 0.0  # inside
    assert float(sdf[1]) > 0.0 and float(sdf[2]) > 0.0  # outside
    # Zero crossing near radius 0.5 along x.
    xs = jnp.linspace(0, 1, 101)
    line = jnp.stack([xs, jnp.zeros_like(xs), jnp.zeros_like(xs)], axis=-1)
    s, _ = F.sdf_forward(params, line, cfg)
    crossing = float(xs[jnp.argmin(jnp.abs(s))])
    assert 0.25 < crossing < 0.75


def test_sdf_grad_matches_finite_difference():
    cfg = _small_cfg()
    params = F.init_field_params(jax.random.PRNGKey(0), cfg)
    pts = jnp.array([[0.3, -0.2, 0.1]])
    g = np.asarray(F.sdf_grad(params, pts, cfg))[0]
    eps = 1e-3
    for d in range(3):
        p = pts.at[0, d].add(eps)
        m = pts.at[0, d].add(-eps)
        fd = (F.sdf_forward(params, p, cfg)[0] - F.sdf_forward(params, m, cfg)[0]) / (
            2 * eps
        )
        np.testing.assert_allclose(g[d], float(fd[0]), rtol=1e-2, atol=1e-3)


def test_hash_encode_shapes_grads():
    cfg = _small_cfg("hash")
    params = F.init_field_params(jax.random.PRNGKey(1), cfg)
    pts = jax.random.uniform(jax.random.PRNGKey(2), (17, 3), minval=-0.9, maxval=0.9)
    sdf, feat = F.sdf_forward(params, pts, cfg)
    assert sdf.shape == (17,)
    assert feat.shape == (17, cfg.feat_dim)

    def loss(p):
        s, _ = F.sdf_forward(p, pts, cfg)
        return jnp.sum(s**2)

    g = jax.grad(loss)(params)
    table_g = np.asarray(g["sdf"]["table"])
    assert np.isfinite(table_g).all() and np.abs(table_g).sum() > 0


def test_hash_encode_continuity():
    # Trilinear interpolation: moving a point slightly moves features slightly.
    cfg = _small_cfg("hash")
    params = F.init_hash_params(jax.random.PRNGKey(1), cfg)
    x = jnp.array([[0.31, 0.52, 0.77]])
    e1 = F.hash_encode(params["table"], x, cfg)
    e2 = F.hash_encode(params["table"], x + 1e-4, cfg)
    assert float(jnp.abs(e1 - e2).max()) < 1e-2


def test_sample_pdf_concentrates():
    bins = jnp.linspace(0.0, 1.0, 9)[None].repeat(2, 0)  # (2, 9)
    w = jnp.zeros((2, 8)).at[:, 3].set(1.0)
    samples = R.sample_pdf(bins, w, 16, None)
    s = np.asarray(samples)
    assert ((s > 0.37) & (s < 0.51)).mean() > 0.9  # bin 3 = [0.375, 0.5)


def test_rays_from_pose_geometry():
    K = jnp.array([[100.0, 0, 50], [0, 100.0, 50], [0, 0, 1]])
    R_row = jnp.eye(3)
    t = jnp.array([0.0, 0.0, 2.0])
    rays = R.rays_from_pose(jnp.array([[50.0, 50.0]]), K, R_row, t, bound=0.5)
    o = np.asarray(rays.origins)[0]
    d = np.asarray(rays.dirs)[0]
    np.testing.assert_allclose(o, [0, 0, -2.0], atol=1e-6)  # camera center in obj frame
    np.testing.assert_allclose(d, [0, 0, 1.0], atol=1e-6)  # looking at origin
    np.testing.assert_allclose(float(rays.near[0]), 1.5, atol=1e-4)
    np.testing.assert_allclose(float(rays.far[0]), 2.5, atol=1e-4)


def test_render_rays_on_sphere_init():
    cfg = _small_cfg()
    params = F.init_field_params(jax.random.PRNGKey(0), cfg)
    K = jnp.array([[100.0, 0, 50], [0, 100.0, 50], [0, 0, 1]])
    rays = R.rays_from_pose(
        jnp.array([[50.0, 50.0], [0.0, 0.0]]), K, jnp.eye(3),
        jnp.array([0.0, 0.0, 2.0]), bound=1.0,
    )
    rcfg = R.RenderConfig(n_coarse=48, n_importance=16, up_sample_steps=2, perturb=False)
    out = R.render_rays(params, cfg, rcfg, rays)
    # Central ray: hits the ~0.5-radius sphere -> opaque, depth ~1.5.
    assert float(out.acc[0]) > 0.9
    crossing = abs(float(out.depth[0]) - 1.5)
    assert crossing < 0.3
    # Corner ray: grazes past -> mostly transparent.
    assert float(out.acc[1]) < 0.5
    assert np.isfinite(float(out.eikonal))


def test_render_rays_shade_compaction_matches_dense():
    """n_shade top-k compaction ~= dense shading once weights concentrate.

    The geometric-init sphere gives a sharp weight peak at the surface, so
    the top-24 sections carry essentially all composite mass; rgb/normal
    from the compacted path must match dense shading, and acc/depth (full
    weights by construction) must be identical.
    """
    cfg = _small_cfg()
    params = F.init_field_params(jax.random.PRNGKey(0), cfg)
    # Sharpen inv_s so weights concentrate (as they do during training).
    params = dict(params)
    params["variance"] = jnp.log(200.0) / 10.0
    K = jnp.array([[100.0, 0, 50], [0, 100.0, 50], [0, 0, 1]])
    px = jnp.array([[50.0, 50.0], [30.0, 60.0], [0.0, 0.0]])
    rays = R.rays_from_pose(px, K, jnp.eye(3), jnp.array([0.0, 0.0, 2.0]), bound=1.0)
    dense = R.RenderConfig(
        n_coarse=48, n_importance=16, up_sample_steps=2, perturb=False, n_shade=0
    )
    compact = R.RenderConfig(
        n_coarse=48, n_importance=16, up_sample_steps=2, perturb=False, n_shade=24
    )
    out_d = R.render_rays(params, cfg, dense, rays)
    out_c = R.render_rays(params, cfg, compact, rays)
    np.testing.assert_allclose(np.asarray(out_c.acc), np.asarray(out_d.acc), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out_c.depth), np.asarray(out_d.depth), atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(out_c.rgb), np.asarray(out_d.rgb), atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(out_c.normal), np.asarray(out_d.normal), atol=2e-3
    )
    # Gradients w.r.t. params must flow through the compacted path.
    g = jax.grad(
        lambda p: jnp.sum(R.render_rays(p, cfg, compact, rays).rgb)
    )(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_marching_tetrahedra_sphere():
    n = 48
    xs = np.linspace(-1, 1, n)
    g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1)
    sdf = np.linalg.norm(g, axis=-1) - 0.6
    verts, faces = EX.marching_tetrahedra(sdf, origin=(-1, -1, -1), spacing=2 / (n - 1))
    assert len(verts) > 100 and len(faces) > 100
    r = np.linalg.norm(verts, axis=1)
    np.testing.assert_allclose(r.mean(), 0.6, atol=0.02)
    assert np.abs(r - 0.6).max() < 0.06
    # Chamfer against an icosphere-ish analytic sample.
    rng = np.random.RandomState(0)
    p = rng.randn(2000, 3)
    p = 0.6 * p / np.linalg.norm(p, axis=1, keepdims=True)
    from scipy.spatial import cKDTree

    surf = EX.sample_surface(verts, faces, 2000)
    d = cKDTree(p).query(surf)[0].mean()
    assert d < 0.03


def test_save_obj_roundtrip(tmp_path):
    from dynhor_tpu.utils.objio import load_obj

    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2]], np.int32)
    path = str(tmp_path / "m.obj")
    EX.save_obj(path, verts, faces)
    mesh = load_obj(path)
    np.testing.assert_allclose(mesh.verts, verts)
    np.testing.assert_array_equal(mesh.faces, faces)


def _sphere_data(n_frames=6, hw=48, radius=0.4):
    """Synthetic supervision: white sphere on grey bg, analytic masks."""
    h = w = hw
    K = jnp.array([[hw, 0, hw / 2], [0, hw, hw / 2], [0, 0, 1.0]])
    from dynhor_tpu.utils import geometry as G

    Rs, Ts, imgs, masks = [], [], [], []
    for i in range(n_frames):
        ang = 2 * np.pi * i / n_frames
        c, s = np.cos(ang), np.sin(ang)
        R_row = jnp.asarray(np.array([[c, 0, -s], [0, 1, 0], [s, 0, c]], np.float32))
        t = jnp.array([0.0, 0.0, 1.5])
        ys, xs_ = jnp.meshgrid(jnp.arange(h) + 0.5, jnp.arange(w) + 0.5, indexing="ij")
        pix = jnp.stack([xs_.ravel(), ys.ravel()], -1)
        rays = R.rays_from_pose(pix, K, R_row, t, bound=1.0)
        b = jnp.sum(rays.origins * rays.dirs, -1)
        cc = jnp.sum(rays.origins**2, -1) - radius**2
        hit = (b * b - cc) > 0
        mask = hit.reshape(h, w).astype(jnp.float32)
        img = jnp.where(mask[..., None] > 0, 0.9, 0.2) * jnp.ones(3)
        Rs.append(R_row)
        Ts.append(t)
        imgs.append(img)
        masks.append(mask)
    return T.ReconData(
        images=jnp.stack(imgs), masks=jnp.stack(masks), normals=None,
        R_rows=jnp.stack(Rs), Ts=jnp.stack(Ts), K=K,
    )


@pytest.mark.slow
def test_neus_training_recovers_sphere(tmp_path):
    data = _sphere_data()
    cfg = _small_cfg()
    rcfg = R.RenderConfig(n_coarse=32, n_importance=16, up_sample_steps=2)
    tcfg = T.TrainConfig(
        num_steps=250, batch_rays=256, lr=1e-3, warmup=20, lw_mask=0.5,
        log_every=50, checkpoint_every=10000,
    )
    state, hist = T.train(data, cfg, rcfg, tcfg)
    assert hist["loss"][-1] < hist["loss"][0]

    # Zero level set near radius 0.4.
    def sdf_eval(pts):
        return F.sdf_only(state.params, jnp.asarray(pts), cfg)

    line = np.stack([np.linspace(0, 1, 51), np.zeros(51), np.zeros(51)], -1)
    s = np.asarray(sdf_eval(line))
    crossing = float(np.linspace(0, 1, 51)[np.argmin(np.abs(s))])
    assert 0.25 < crossing < 0.55

    verts, faces = EX.extract_mesh_from_field(sdf_eval, resolution=48, bound=0.8)
    assert len(verts) > 50
    r = np.linalg.norm(verts, axis=1)
    assert abs(float(np.median(r)) - 0.4) < 0.08


def test_checkpoint_roundtrip(tmp_path):
    cfg = _small_cfg()
    tcfg = T.TrainConfig(num_steps=10)
    opt = T.make_optimizer(tcfg)
    state = T.init_train_state(jax.random.PRNGKey(0), cfg, tcfg, opt)
    state = state._replace(step=jnp.asarray(7))
    T.save_checkpoint(str(tmp_path / "ck"), state)
    restored = T.restore_checkpoint(str(tmp_path / "ck"), state)
    assert restored is not None
    assert int(restored.step) == 7
    tree_eq = jax.tree.map(
        lambda a, b: np.allclose(np.asarray(a), np.asarray(b)), state.params,
        restored.params,
    )
    assert all(jax.tree.leaves(tree_eq))

def test_occgrid_sampler_renders():
    # Fast path: occupancy grid from the init sphere, occgrid sampling; the
    # render must produce sane opacity for rays through the sphere vs misses.
    cfg = F.SDFConfig(encoder="pe", hidden=32, depth=2, skip_layer=10, feat_dim=8,
                      color_hidden=16, color_depth=2)
    rcfg = R.RenderConfig(sampler="occgrid", occ_res=32, n_candidates=64,
                          n_occ_samples=32)
    params = F.init_field_params(jax.random.PRNGKey(0), cfg)
    occ = R.occupancy_from_sdf(params, cfg, rcfg)
    # The grid marks a shell around the |x| = 0.5 init sphere.
    occ3 = np.asarray(occ).reshape(32, 32, 32)
    assert occ3.sum() > 0
    center = occ3[14:18, 14:18, 14:18]
    assert center.max() == 0  # deep interior not occupied (tau-banded shell)

    n = 8
    o = jnp.tile(jnp.asarray([[0.0, 0.0, -1.5]]), (n, 1))
    zdirs = jnp.stack([jnp.zeros(n), jnp.linspace(0, 0.8, n), jnp.ones(n)], axis=-1)
    d = zdirs / jnp.linalg.norm(zdirs, axis=-1, keepdims=True)
    rays = R.Rays(origins=o, dirs=d, near=jnp.full((n,), 0.5),
                  far=jnp.full((n,), 2.5))
    out = R.render_rays(params, cfg, rcfg, rays, jax.random.PRNGKey(1), occ)
    assert np.isfinite(np.asarray(out.rgb)).all()
    # Ray straight at the sphere should be much more opaque than the
    # steepest miss ray.
    acc = np.asarray(out.acc)
    assert acc[0] > acc[-1]
