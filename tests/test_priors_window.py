"""Untested-claim tests for the prior-scoring path (VERDICT r1 weak #4/#6).

1. The window-cropped prior render (tracker/priors.py:_render_one_view with
   a principal-point-shifted K) is claimed pixel-identical to the
   reference's full-frame render followed by cropping — assert it.
2. bf16 vs f32 prior-score ranking: the retrieval scores ride bf16 matmuls
   (PriorConfig.dino_dtype); bound the score error and the top-k
   candidate-set disagreement.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynhor_tpu.models import dino as D
from dynhor_tpu.tracker import priors as P
from dynhor_tpu.utils import geometry as G
from dynhor_tpu.utils.objio import load_obj


@pytest.fixture(scope="module")
def mesh():
    m = load_obj("assets/shoes/1229a2e6e97e_A_basketball_shoes_.obj")
    verts = G.center_and_normalize_verts(jnp.asarray(m.verts))
    return verts, jnp.asarray(m.faces), jnp.asarray(m.face_uvs), jnp.asarray(m.texture)


def test_window_render_equals_fullframe_crop(mesh):
    verts, faces, face_uvs, texture = mesh
    cfg = P.PriorConfig(num_views=4, render_h=384, render_w=384, view_chunk=4)
    radius, center = P.mesh_radius_center(verts)
    distance = cfg.distance_scale * radius
    window = P.compute_window(
        cfg, float(P.mesh_norm_radius(verts)), float(distance)
    )
    assert window < 384  # the claim is only interesting if it reduces work

    K_full = P.prior_camera(cfg)
    off_x = (cfg.render_w - window) / 2.0
    off_y = (cfg.render_h - window) / 2.0
    assert off_x == int(off_x) and off_y == int(off_y)
    K_win = K_full - jnp.array(
        [[0.0, 0.0, off_x], [0.0, 0.0, off_y], [0.0, 0.0, 0.0]], jnp.float32
    )

    Rs = G.random_rotations(jax.random.PRNGKey(3), 3)
    for i in range(3):
        R = Rs[i]
        t = jnp.array([0.0, 0.0, float(distance)]) - R @ center
        rgba_win, zbuf_win, ov_w = P._render_one_view(
            verts, faces, face_uvs, texture, R, t, K_win, window, 512
        )
        rgba_full, zbuf_full, ov_f = P._render_one_view(
            verts, faces, face_uvs, texture, R, t, K_full, 384, 512
        )
        # No overflow: the equivalence claim only holds for exact rasters
        # (and the production default cap must not overflow this regime).
        assert int(ov_w) == 0 and int(ov_f) == 0
        oy, ox = int(off_y), int(off_x)
        crop = rgba_full[oy : oy + window, ox : ox + window]
        zcrop = zbuf_full[oy : oy + window, ox : ox + window]
        # Pixel-identical: same pixel centers, same faces, same shading.
        # Identical pixel centers/faces/shading; tolerance is pure float
        # association noise from the shifted-K arithmetic (~3e-5 observed).
        np.testing.assert_allclose(
            np.asarray(rgba_win), np.asarray(crop), atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(zbuf_win), np.asarray(zcrop), atol=2e-4
        )
        # The silhouette must not touch the window border (window big enough).
        alpha = np.asarray(rgba_win[..., 3])
        assert alpha[0, :].max() == 0 and alpha[-1, :].max() == 0
        assert alpha[:, 0].max() == 0 and alpha[:, -1].max() == 0
        # And the FULL frame outside the window must be empty.
        full_alpha = np.asarray(rgba_full[..., 3]) > 0
        full_alpha[oy : oy + window, ox : ox + window] = False
        assert not full_alpha.any()


@pytest.mark.mid
def test_bf16_vs_f32_prior_score_ranking(mesh):
    verts, faces, face_uvs, texture = mesh
    # Tiny ViT (random weights) — the test bounds the bf16-vs-f32 retrieval
    # disagreement mechanism, not real-DINO semantics.
    dcfg = D.DinoConfig(
        patch_size=14, embed_dim=64, depth=2, num_heads=4, pos_grid=4,
        smaller_edge_size=140,
    )
    dparams = D.init_params(jax.random.PRNGKey(0), dcfg)
    n_views, frames = 32, 2
    # Full-capacity cap: edge-on views can pack >1280 faces into a tile
    # and overflow would confound the bf16-vs-f32 comparison.
    cfg16 = P.PriorConfig(num_views=n_views, view_chunk=8, dino_dtype="bfloat16",
                          max_faces_per_tile=5000)
    cfg32 = P.PriorConfig(num_views=n_views, view_chunk=8, dino_dtype="float32",
                          max_faces_per_tile=5000)
    radius, _ = P.mesh_radius_center(verts)
    window = P.compute_window(
        cfg16, float(P.mesh_norm_radius(verts)), float(cfg16.distance_scale * radius)
    )
    rots = P.prior_view_rotations(jax.random.PRNGKey(1), cfg16)
    p = dcfg.feat_size**2
    gt = jax.random.normal(jax.random.PRNGKey(2), (frames, p, dcfg.embed_dim))
    gt = gt / jnp.linalg.norm(gt, axis=-1, keepdims=True)
    cos_masks = jnp.ones((frames, p))

    def scores(cfg):
        s, ov = P.prior_scores_and_rotations(
            dparams, dcfg, verts, faces, face_uvs, texture, rots, gt,
            cos_masks, cfg, window,
        )
        assert int(ov) == 0
        return np.asarray(s)

    s16 = scores(cfg16)
    s32 = scores(cfg32)
    # Scores are mean cosines in [-1, 1]; bf16 error must stay well under
    # the scale that could reorder genuinely distinct views.
    assert np.abs(s16 - s32).max() < 5e-3
    # Top-5 candidate sets (the gate's topk input) must mostly agree; any
    # swap must be between near-tied views.
    for f in range(frames):
        top16 = set(np.argsort(-s16[f])[:5].tolist())
        top32 = set(np.argsort(-s32[f])[:5].tolist())
        for v in top16 ^ top32:
            gap = abs(s32[f][v] - np.sort(s32[f])[-5])
            assert gap < 5e-3, (v, gap)


def test_prior_batched_counts_safe_cap(mesh, capsys):
    # prior_scores_batched must pre-count the per-tile worst case and run
    # at a sufficient cap, producing scores identical to the full-capacity
    # run even when the configured cap would overflow.
    verts, faces, face_uvs, texture = mesh
    dcfg = D.DinoConfig(
        patch_size=14, embed_dim=32, depth=1, num_heads=2, pos_grid=4,
        smaller_edge_size=56,
    )
    dparams = D.init_params(jax.random.PRNGKey(0), dcfg)
    cfg_small = P.PriorConfig(num_views=8, view_chunk=8, crop_size=64,
                              max_faces_per_tile=256, dino_dtype="float32")
    cfg_full = dataclasses.replace(cfg_small, max_faces_per_tile=5000)
    radius, _ = P.mesh_radius_center(verts)
    window = P.compute_window(
        cfg_small, float(P.mesh_norm_radius(verts)),
        float(cfg_small.distance_scale * radius),
    )
    rots = P.prior_view_rotations(jax.random.PRNGKey(1), cfg_small)
    p = dcfg.feat_size**2
    gt = jax.random.normal(jax.random.PRNGKey(2), (1, p, dcfg.embed_dim))
    gt = gt / jnp.linalg.norm(gt, axis=-1, keepdims=True)
    cos_masks = jnp.ones((1, p))

    args = (dparams, dcfg, verts, faces, face_uvs, texture, rots, gt, cos_masks)
    s_small = np.asarray(P.prior_scores_batched(*args, cfg_small, window))
    out = capsys.readouterr().out
    assert "per-tile face cap" in out and "rerunning" not in out
    s_full = np.asarray(P.prior_scores_batched(*args, cfg_full, window))
    np.testing.assert_allclose(s_small, s_full, atol=1e-5)


@pytest.mark.mid
def test_two_stage_prescreen_scores(mesh):
    # Two-stage retrieval (prior_scores_two_stage): rescored columns must
    # equal single-stage full-res scores exactly; the calibrated fill must
    # stay on the cosine scale; small view counts fall back to single-stage.
    verts, faces, face_uvs, texture = mesh
    dcfg = D.DinoConfig(
        patch_size=14, embed_dim=32, depth=1, num_heads=2, pos_grid=4,
        smaller_edge_size=56,
    )
    dparams = D.init_params(jax.random.PRNGKey(0), dcfg)
    frames, n = 1, 24
    cfg = P.PriorConfig(
        num_views=n, view_chunk=8, crop_size=64, render_h=192, render_w=192,
        max_faces_per_tile=5000, dino_dtype="float32",
    )
    radius, _ = P.mesh_radius_center(verts)
    window = P.compute_window(
        cfg, float(P.mesh_norm_radius(verts)), float(cfg.distance_scale * radius)
    )
    rots = P.prior_view_rotations(jax.random.PRNGKey(1), cfg)
    crop_imgs = jax.random.uniform(jax.random.PRNGKey(5), (frames, 3, 64, 64))
    tmasks = jnp.zeros((frames, 64, 64)).at[:, 16:48, 16:48].set(1.0)
    gt, cm = P.frame_gt_features(dparams, dcfg, crop_imgs, tmasks, "float32")

    args = (dparams, dcfg, verts, faces, face_uvs, texture, rots)
    single = np.asarray(P.prior_scores_batched(*args, gt, cm, cfg, window))

    # Small-n fallback: topk*4 >= n -> identical to single-stage.
    two_fb = np.asarray(P.prior_scores_two_stage(
        *args, crop_imgs, tmasks, gt, cm, cfg, window,
        prescreen_edge=28, prescreen_scale=2, topk=8,
    ))
    np.testing.assert_allclose(two_fb, single, atol=1e-6)

    # Real two-stage: topk=4 -> prescreen + rescore + calibrated fill.
    two = np.asarray(P.prior_scores_two_stage(
        *args, crop_imgs, tmasks, gt, cm, cfg, window,
        prescreen_edge=28, prescreen_scale=2, topk=4,
    ))
    assert two.shape == (frames, n)
    assert np.isfinite(two).all() and np.abs(two).max() < 1.5
    # Columns that match single-stage exactly are the rescored ones; there
    # must be at least topk of them, and the fill clamp guarantees the
    # per-frame argmax (the gate's primary input) is a rescored view.
    rescored = np.where(np.abs(two - single).max(axis=0) < 1e-5)[0]
    assert len(rescored) >= 4
    rescored_set = set(rescored.tolist())
    fill_cols = [j for j in range(n) if j not in rescored_set]
    for f in range(frames):
        assert int(np.argmax(two[f])) in rescored_set
        # Every fill entry sits strictly below the frame's rescored minimum.
        assert two[f][fill_cols].max() < two[f][list(rescored_set)].min()
