"""Pretrained-checkpoint loading path, first-class (VERDICT r2 missing #2).

The reference loads real torch.hub dinov2_vitb14 weights
(ObjTracker/dino.py:12-14).  Zero egress makes the real file unavailable
here, so these tests prove the LOADING PATH with a full-size
official-format state_dict of random values (tools/make_dino_checkpoint):

  1. every tensor of the full-size official layout converts losslessly
     into our param pytree (shape + value checks on the real 86M-param
     layout, not a shrunken stand-in);
  2. the config path (system.dino.checkpoint -> pipeline.track_sequence)
     loads and USES those params: an explicit-params run with the same
     file is bit-identical, a random-init run is not.

All current quality numbers in BASELINE.md used RANDOM DINO weights; with
the real checkpoint on disk the only change needed is the config value.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from make_dino_checkpoint import DEPTH, DIM, N_POS, official_state_dict  # noqa: E402

from dynhor_tpu.models import dino as D  # noqa: E402


@pytest.fixture(scope="module")
def ckpt_path(tmp_path_factory):
    sd = official_state_dict(seed=3)
    path = tmp_path_factory.mktemp("ckpt") / "dinov2_vitb14_random.npz"
    np.savez(path, **sd)
    return str(path)


def test_full_size_official_checkpoint_converts_losslessly(ckpt_path):
    sd = official_state_dict(seed=3)
    params, cfg = D.load_params(ckpt_path)
    assert cfg.pos_grid == 37 and cfg.embed_dim == DIM and cfg.depth == DEPTH

    # Spot-check exact value round-trips through the on-disk format.
    np.testing.assert_array_equal(np.asarray(params["cls_token"]), sd["cls_token"])
    np.testing.assert_array_equal(np.asarray(params["pos_embed"]), sd["pos_embed"])
    np.testing.assert_array_equal(
        np.asarray(params["patch_kernel"]),
        sd["patch_embed.proj.weight"].reshape(DIM, -1).T,
    )
    for i in (0, DEPTH - 1):
        np.testing.assert_array_equal(
            np.asarray(params["blocks"]["qkv_kernel"][i]),
            sd[f"blocks.{i}.attn.qkv.weight"].T,
        )
        np.testing.assert_array_equal(
            np.asarray(params["blocks"]["fc2_bias"][i]), sd[f"blocks.{i}.mlp.fc2.bias"]
        )
    # Full-size shapes (the real dinov2_vitb14 layout, not a stand-in).
    assert params["pos_embed"].shape == (1, N_POS, DIM)
    assert params["blocks"]["qkv_kernel"].shape == (DEPTH, DIM, 3 * DIM)
    assert params["blocks"]["fc1_kernel"].shape == (DEPTH, DIM, 4 * DIM)
    n_params = sum(int(np.prod(p.shape)) for p in __import__("jax").tree.leaves(params))
    assert n_params > 85_000_000  # ViT-B scale


@pytest.mark.slow
def test_config_checkpoint_path_is_used_e2e(ckpt_path, tmp_path):
    """system.dino.checkpoint -> track_sequence must USE the file's params.

    Full-size ViT-B/14 at a small smaller_edge_size (56 px -> 4x4 tokens)
    keeps the CPU cost tolerable while the param tree stays the real
    86M-param layout.  Reference behavior: ObjTracker/dino.py:12-14 feeding
    run.py:104.
    """
    from test_pipeline_e2e import _write_box_obj, load_config_from_dict
    from dynhor_tpu.tracker import pipeline as PL

    # Tiny 2-frame synthetic clip (reuse the box-sequence generator).
    import jax
    import jax.numpy as jnp
    from PIL import Image

    import dynhor_tpu.ops.rasterize as RZ
    from dynhor_tpu.ops.shading import default_lights, phong_shade
    from dynhor_tpu.utils import camera as cam
    from dynhor_tpu.utils import geometry as G
    from test_pipeline_e2e import BOX_F, BOX_V, H, W

    root = tmp_path / "seq"
    os.makedirs(root / "rgb")
    os.makedirs(root / "sam_seg")
    _write_box_obj(root / "box.obj")
    K = cam.intrinsics_from_image(H, W)
    verts, faces = jnp.asarray(BOX_V), jnp.asarray(BOX_F)
    R0 = G.random_rotations(jax.random.PRNGKey(7), 1)[0]
    for i in range(2):
        vc = verts @ R0 + jnp.array([0.0, 0.01 * i, 1.6])
        frag = RZ.rasterize(RZ.project_perspective(vc, K), faces, (H, W), face_chunk=12)
        rgba = np.asarray(
            phong_shade(
                frag, faces, vc, RZ.compute_vertex_normals(vc, faces),
                jnp.zeros((12, 3, 2)) + 0.5, jnp.ones((2, 2, 3)) * 0.6,
                default_lights(),
            )
        )
        obj = rgba[:, :, 3] > 0.5
        rgb = np.where(obj[:, :, None], np.clip(rgba[:, :, :3], 0, 1), 0.4)
        seg = np.zeros((H, W, 3), np.uint8)
        seg[:, :, 1] = obj.astype(np.uint8) * 255
        Image.fromarray((rgb * 255).astype(np.uint8)).save(root / "rgb" / f"{i:04d}.jpg")
        Image.fromarray(seg).save(root / "sam_seg" / f"{i:04d}.png")

    cfg = load_config_from_dict(
        {
            "seq_name": "ckptseq",
            "data_info": {
                "dataroot": str(root), "obj_path": str(root / "box.obj"),
                "normalize_mesh": False,
            },
            "system": {
                "init_num_iterations": 2,
                "joint_num_iterations": 2,
                "crop_size": 64,
                "face_chunk": 12,
                "prior": {"num_views": 8, "view_chunk": 4, "render_hw": [96, 96]},
                "dino": {"checkpoint": ckpt_path, "smaller_edge_size": 56},
            },
        }
    )
    seq = PL.load_sequence(str(root))
    ann = PL.process_frames(seq, crop_size=64)
    mesh = PL.load_mesh(str(root / "box.obj"), normalize=False)

    # Config path: pipeline loads the checkpoint itself.
    res_cfg = PL.track_sequence(cfg, seq, ann, mesh)
    # Explicit path: same file loaded by hand -> must be bit-identical.
    dparams, dcfg = D.load_params(ckpt_path, D.DinoConfig(smaller_edge_size=56))
    res_exp = PL.track_sequence(cfg, seq, ann, mesh, dino_params=dparams, dino_cfg=dcfg)
    np.testing.assert_array_equal(res_cfg.selected_idx, res_exp.selected_idx)
    np.testing.assert_allclose(res_cfg.rotations_row, res_exp.rotations_row, atol=1e-6)

    # Random-init run (checkpoint=None) must differ — the checkpoint is
    # actually flowing into scoring, not just being parsed.
    cfg_rand = load_config_from_dict(cfg)
    cfg_rand["system"]["dino"] = {"checkpoint": None, "smaller_edge_size": 56}
    res_rand = PL.track_sequence(cfg_rand, seq, ann, mesh)
    assert not np.allclose(res_rand.rotations_row, res_cfg.rotations_row, atol=1e-4)
