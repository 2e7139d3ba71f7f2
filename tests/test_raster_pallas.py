"""Fused Pallas raster+silhouette kernel vs the XLA tiled references.

The fused kernel (ops/raster_pallas.py) must match ops/rasterize_tiled's
hard raster pixel-exactly and ops/silhouette_pallas' soft mass bit-for-bit
(it reuses _tile_mass), including the silhouette VJP.  Runs in interpret
mode on CPU (same code path the TPU compiles).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynhor_tpu.ops import rasterize as rz
from dynhor_tpu.ops.raster_pallas import rasterize_pallas, rasterize_silhouette_pallas
from dynhor_tpu.ops.rasterize_tiled import rasterize_tiled, soft_silhouette_tiled
from dynhor_tpu.utils import geometry as G
from dynhor_tpu.utils.objio import load_obj

S = 128
MAX_FACES = 5000  # = num faces: binning can never drop at full capacity


@pytest.fixture(scope="module")
def scene():
    m = load_obj("assets/shoes/1229a2e6e97e_A_basketball_shoes_.obj")
    verts = G.center_and_normalize_verts(jnp.asarray(m.verts))
    faces = jnp.asarray(m.faces)
    R = G.random_rotations(jax.random.PRNGKey(0), 1)[0]
    vc = verts @ R + jnp.array([0.0, 0.0, 2.0])
    K = jnp.array([[S * 1.2, 0, S / 2], [0, S * 1.2, S / 2], [0, 0, 1.0]])
    vp = rz.project_perspective(vc, K)
    return vc, vp, faces, K


def test_fused_matches_tiled_hard_raster(scene):
    _, vp, faces, _ = scene
    ref = rasterize_tiled(vp, faces, (S, S), max_faces=MAX_FACES)
    frag, _, ov = rasterize_silhouette_pallas(vp, faces, (S, S), max_faces=MAX_FACES)
    assert int(ov) == 0
    np.testing.assert_array_equal(
        np.asarray(frag.pix_to_face), np.asarray(ref.pix_to_face)
    )
    np.testing.assert_allclose(np.asarray(frag.zbuf), np.asarray(ref.zbuf), atol=1e-5)
    np.testing.assert_allclose(np.asarray(frag.bary), np.asarray(ref.bary), atol=1e-5)


def test_fused_matches_tiled_soft_silhouette(scene):
    _, vp, faces, _ = scene
    ref = soft_silhouette_tiled(vp, faces, (S, S), max_faces=MAX_FACES)
    _, sil, _ = rasterize_silhouette_pallas(vp, faces, (S, S), max_faces=MAX_FACES)
    np.testing.assert_allclose(np.asarray(sil), np.asarray(ref), atol=1e-5)


@pytest.mark.mid
def test_fused_silhouette_gradient_matches(scene):
    vc, _, faces, K = scene

    def loss_fused(v):
        _, sl, _ = rasterize_silhouette_pallas(
            rz.project_perspective(v, K), faces, (S, S), max_faces=MAX_FACES
        )
        return (sl**2).sum()

    def loss_ref(v):
        sl = soft_silhouette_tiled(
            rz.project_perspective(v, K), faces, (S, S), max_faces=MAX_FACES
        )
        return (sl**2).sum()

    g1 = np.asarray(jax.grad(loss_fused)(vc))
    g2 = np.asarray(jax.grad(loss_ref)(vc))
    scale = np.abs(g2).max()
    np.testing.assert_allclose(g1, g2, atol=1e-5 * scale)


def test_raster_only_wrapper(scene):
    _, vp, faces, _ = scene
    ref = rasterize_tiled(vp, faces, (S, S), max_faces=MAX_FACES)
    frag, ov = rasterize_pallas(vp, faces, (S, S), max_faces=MAX_FACES)
    assert int(ov) == 0
    np.testing.assert_array_equal(
        np.asarray(frag.pix_to_face), np.asarray(ref.pix_to_face)
    )
    np.testing.assert_allclose(np.asarray(frag.zbuf), np.asarray(ref.zbuf), atol=1e-5)
    np.testing.assert_allclose(np.asarray(frag.bary), np.asarray(ref.bary), atol=1e-5)


def test_fused_empty_view():
    # Mesh fully behind the camera: no hits, zero silhouette.
    verts = jnp.array(
        [[-0.1, -0.1, -2.0], [0.1, -0.1, -2.0], [0.0, 0.1, -2.0]], jnp.float32
    )
    faces = jnp.array([[0, 1, 2]], jnp.int32)
    K = jnp.array([[64.0, 0, 32], [0, 64.0, 32], [0, 0, 1.0]])
    vp = rz.project_perspective(verts, K)
    frag, sil, _ = rasterize_silhouette_pallas(vp, faces, (64, 64))
    assert int((frag.pix_to_face >= 0).sum()) == 0
    assert float(sil.max()) == 0.0


def test_fused_overflow_reported(scene):
    # Tiny cap forces face-tile drops; the overflow count must be nonzero
    # so the refine/joint loops can warn IN-LOOP (VERDICT r1 weak #5).
    _, vp, faces, _ = scene
    _, _, ov = rasterize_silhouette_pallas(vp, faces, (S, S), max_faces=64)
    assert int(ov) > 0


@pytest.fixture(scope="module")
def crowded_tile_scene():
    # 600 tiny triangles all binned into ONE tile: the tile's candidate
    # count (600) lies in (m - 512, m] with the padded face axis m = 640
    # NOT a multiple of the 512-face forward chunk — regression for the
    # out-of-bounds final-chunk read (ADVICE r2 medium): the clamped
    # overlap window must not double-count mass or mismap face ids.
    key = jax.random.PRNGKey(1)
    n = 600
    c = jax.random.uniform(key, (n, 2), minval=4.0, maxval=12.0)
    offs = jnp.array([[0.0, 0.0], [0.6, 0.0], [0.0, 0.6]])
    pts = c[:, None, :] + offs[None]
    z = 2.0 + 0.001 * jnp.arange(n, dtype=jnp.float32)[:, None, None]
    vp = jnp.concatenate([pts, jnp.broadcast_to(z, (n, 3, 1))], -1).reshape(-1, 3)
    faces = jnp.arange(n * 3, dtype=jnp.int32).reshape(n, 3)
    return vp, faces


def test_fused_final_chunk_not_multiple_of_512(crowded_tile_scene):
    vp, faces = crowded_tile_scene
    ref_sil = soft_silhouette_tiled(vp, faces, (64, 64), max_faces=640)
    ref_frag = rasterize_tiled(vp, faces, (64, 64), max_faces=640)
    frag, sil, ov = rasterize_silhouette_pallas(vp, faces, (64, 64), max_faces=640)
    assert int(ov) == 0
    np.testing.assert_allclose(np.asarray(sil), np.asarray(ref_sil), atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(frag.pix_to_face), np.asarray(ref_frag.pix_to_face)
    )
    np.testing.assert_allclose(
        np.asarray(frag.zbuf), np.asarray(ref_frag.zbuf), atol=1e-5
    )
    frag2, ov2 = rasterize_pallas(vp, faces, (64, 64), max_faces=640)
    assert int(ov2) == 0
    np.testing.assert_array_equal(
        np.asarray(frag2.pix_to_face), np.asarray(ref_frag.pix_to_face)
    )


def test_fused_final_chunk_gradient(crowded_tile_scene):
    vp, faces = crowded_tile_scene

    def loss_fused(v):
        _, sl, _ = rasterize_silhouette_pallas(v, faces, (64, 64), max_faces=640)
        return (sl**2).sum()

    def loss_ref(v):
        return (soft_silhouette_tiled(v, faces, (64, 64), max_faces=640) ** 2).sum()

    g1 = np.asarray(jax.grad(loss_fused)(vp))
    g2 = np.asarray(jax.grad(loss_ref)(vp))
    # f32 near-ties between segment distances can flip the argmin branch on
    # isolated vertices (see test_rasterize_tiled's grad test): bound the
    # bulk tightly, allow rare outliers within 1% of scale.
    scale = max(np.abs(g2).max(), 1e-6)
    err = np.abs(g1 - g2)
    assert float(np.quantile(err, 0.999)) < 1e-5 * scale
    assert float(err.max()) < 1e-2 * scale


def test_analytic_tile_mass_gradient_matches_autodiff():
    # The backward kernels use a hand-derived VJP of _tile_mass
    # (silhouette_pallas._tile_mass_grad_analytic); verify it against
    # jax.vjp in f64 (f32 differences are pure association noise).
    from dynhor_tpu.ops.silhouette_pallas import (
        _tile_mass,
        _tile_mass_grad_analytic,
    )

    with jax.enable_x64(True):
        key = jax.random.PRNGKey(0)
        P, M, tile = 256, 128, 16
        for mode in ["linear", "quadratic"]:
            for _ in range(2):
                k1, k2, k3, key = jax.random.split(key, 4)
                rows = jax.random.uniform(
                    k1, (8, M), minval=-8.0, maxval=24.0, dtype=jnp.float64
                )
                vis = (jax.random.uniform(k2, (M,)) > 0.2).astype(jnp.float64)
                rows = rows.at[6].set(vis).at[7].set(0.0)
                rows = rows.at[2, :5].set(rows[0, :5]).at[3, :5].set(rows[1, :5])
                idx = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
                px = jnp.mod(idx, tile).astype(jnp.float64) + 0.5
                py = (idx // tile).astype(jnp.float64) + 0.5
                g = jax.random.normal(k3, (P,), dtype=jnp.float64)
                _, vjp = jax.vjp(lambda r: _tile_mass(r, px, py, 0.25, mode), rows)
                g_ref = vjp(g)[0]
                g_an = _tile_mass_grad_analytic(rows, px, py, g[:, None], 0.25, mode)
                scale = float(jnp.abs(g_ref).max())
                np.testing.assert_allclose(
                    np.asarray(g_an), np.asarray(g_ref), atol=1e-9 * max(scale, 1.0)
                )


@pytest.mark.mid
def test_active_tile_compaction_matches_dense(scene):
    """max_active_tiles compaction == dense over all tiles: forward
    (pix_to_face exact; sil/zbuf/bary to float rounding — the compacted
    kernel works in tile-shifted coordinates) AND the silhouette VJP."""
    from dynhor_tpu.ops.rasterize_tiled import max_active_tiles_load, max_tile_load

    _, vp, faces, _ = scene
    margin = 6.0 * 0.25 + 1.0
    cap = -(-int(max_tile_load(vp, faces, (S, S), margin=margin)) // 128) * 128
    n_act = int(max_active_tiles_load(vp, faces, (S, S), margin=margin))
    assert n_act < (S // 16) ** 2  # the scene must actually have empty tiles

    fragd, sild, ovd = rasterize_silhouette_pallas(vp, faces, (S, S), max_faces=cap)
    fragc, silc, ovc = rasterize_silhouette_pallas(
        vp, faces, (S, S), max_faces=cap, max_active_tiles=n_act + 4
    )
    assert int(ovd) == 0 and int(ovc) == 0
    np.testing.assert_array_equal(
        np.asarray(fragd.pix_to_face), np.asarray(fragc.pix_to_face)
    )
    np.testing.assert_allclose(np.asarray(sild), np.asarray(silc), atol=1e-5)
    np.testing.assert_allclose(np.asarray(fragd.zbuf), np.asarray(fragc.zbuf), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(fragd.bary), np.asarray(fragc.bary), atol=1e-5)

    weight = jnp.cos(jnp.arange(S * S, dtype=jnp.float32).reshape(S, S) * 0.01)

    def loss(vp_, mat):
        _, sil, _ = rasterize_silhouette_pallas(
            vp_, faces, (S, S), max_faces=cap, max_active_tiles=mat
        )
        return (sil * weight).sum()

    gd = jax.grad(lambda v: loss(v, None))(vp)
    gc = jax.grad(lambda v: loss(v, n_act + 4))(vp)
    assert float(jnp.abs(gd).sum()) > 1.0  # non-trivial gradient
    np.testing.assert_allclose(np.asarray(gd), np.asarray(gc), atol=1e-5, rtol=1e-5)


def test_active_tile_compaction_overflow_surfaced(scene):
    _, vp, faces, _ = scene
    _, _, ov = rasterize_silhouette_pallas(
        vp, faces, (S, S), max_faces=MAX_FACES, max_active_tiles=8
    )
    assert int(ov) > 0  # dropped whole active tiles must be reported


@pytest.mark.mid
def test_compact_tile_shading_matches_dense(scene):
    """phong_shade_tiles over CompactTiles == dense phong_shade: forward
    RGBA and the gradient w.r.t. camera-space vertices (the fine sem-loss
    path).  Uses a textured shoes mesh so UV sampling is exercised."""
    from dynhor_tpu.ops.rasterize_tiled import max_active_tiles_load, max_tile_load
    from dynhor_tpu.ops.shading import fine_lights, phong_shade, phong_shade_tiles

    vc, vp, faces, K = scene
    m = load_obj("assets/shoes/1229a2e6e97e_A_basketball_shoes_.obj")
    face_uvs = jnp.asarray(m.face_uvs)
    texture = jnp.asarray(m.texture)
    margin = 6.0 * 0.25 + 1.0
    cap = -(-int(max_tile_load(vp, faces, (S, S), margin=margin)) // 128) * 128
    n_act = int(max_active_tiles_load(vp, faces, (S, S), margin=margin))

    def render(v, compact_mode):
        vp_ = rz.project_perspective(v, K)
        vn = rz.compute_vertex_normals(v, faces)
        out = rasterize_silhouette_pallas(
            vp_, faces, (S, S), max_faces=cap,
            max_active_tiles=(n_act + 4) if compact_mode else None,
            return_compact=compact_mode,
        )
        if compact_mode:
            frag, _, ov, compact = out
            assert compact is not None
            rgba = phong_shade_tiles(
                compact, (S, S), 16, faces, v, vn, face_uvs, texture,
                fine_lights(),
            )
        else:
            frag, _, ov = out
            rgba = phong_shade(
                frag, faces, v, vn, face_uvs, texture, fine_lights()
            )
        return rgba, ov

    rgba_d, ovd = render(vc, False)
    rgba_c, ovc = render(vc, True)
    assert int(ovd) == 0 and int(ovc) == 0
    assert float(rgba_c[..., 3].sum()) > 100.0  # plenty of hit pixels
    np.testing.assert_allclose(
        np.asarray(rgba_c), np.asarray(rgba_d), atol=1e-5
    )

    weight = jnp.sin(jnp.arange(S * S * 4, dtype=jnp.float32) * 0.01).reshape(
        S, S, 4
    )

    def loss(v, compact_mode):
        rgba, _ = render(v, compact_mode)
        return (rgba * weight).sum()

    gd = jax.grad(lambda v: loss(v, False))(vc)
    gc = jax.grad(lambda v: loss(v, True))(vc)
    assert float(jnp.abs(gd).sum()) > 1.0
    np.testing.assert_allclose(np.asarray(gc), np.asarray(gd), atol=2e-4, rtol=1e-4)
