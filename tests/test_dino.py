import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from dynhor_tpu.models import dino as D


@pytest.fixture(scope="module")
def hf_model():
    from transformers import Dinov2Config, Dinov2Model

    cfg = Dinov2Config(
        hidden_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=256,
        patch_size=14,
        image_size=224,
        layerscale_value=0.7,
    )
    torch.manual_seed(0)
    model = Dinov2Model(cfg)
    model.eval()
    return model


def _small_cfg():
    return D.DinoConfig(
        patch_size=14, embed_dim=64, depth=3, num_heads=4, pos_grid=16,
        smaller_edge_size=224,
    )


def test_matches_transformers_at_native_size(hf_model):
    cfg = _small_cfg()
    params, cfg = D.convert_torch_state_dict(hf_model.state_dict(), cfg)
    rng = np.random.RandomState(0)
    img = rng.rand(2, 3, 224, 224).astype(np.float32)
    with torch.no_grad():
        want = hf_model(torch.from_numpy(img)).last_hidden_state.numpy()[:, 1:]
    got = np.asarray(D.forward_tokens(params, jnp.asarray(img), cfg))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_matches_transformers_interpolated_size(hf_model):
    # Non-native input size exercises the bicubic pos-embed interpolation
    # (dinov2 interpolate_pos_encoding path).
    cfg = _small_cfg()
    params, cfg = D.convert_torch_state_dict(hf_model.state_dict(), cfg)
    rng = np.random.RandomState(1)
    img = rng.rand(1, 3, 280, 280).astype(np.float32)
    with torch.no_grad():
        want = hf_model(torch.from_numpy(img)).last_hidden_state.numpy()[:, 1:]
    got = np.asarray(D.forward_tokens(params, jnp.asarray(img), cfg))
    np.testing.assert_allclose(got, want, atol=5e-3)


def test_official_naming_conversion_roundtrip(hf_model):
    # Build an official-style state_dict from the HF one and check both
    # conversion paths agree.
    hf_sd = hf_model.state_dict()
    cfg = _small_cfg()
    p_hf, cfg_hf = D.convert_torch_state_dict(hf_sd, cfg)

    official = {
        "cls_token": hf_sd["embeddings.cls_token"],
        "pos_embed": hf_sd["embeddings.position_embeddings"],
        "patch_embed.proj.weight": hf_sd["embeddings.patch_embeddings.projection.weight"],
        "patch_embed.proj.bias": hf_sd["embeddings.patch_embeddings.projection.bias"],
        "norm.weight": hf_sd["layernorm.weight"],
        "norm.bias": hf_sd["layernorm.bias"],
    }
    for i in range(cfg.depth):
        pre = f"encoder.layer.{i}."
        qkv_w = torch.cat(
            [
                hf_sd[pre + "attention.attention.query.weight"],
                hf_sd[pre + "attention.attention.key.weight"],
                hf_sd[pre + "attention.attention.value.weight"],
            ],
            dim=0,
        )
        qkv_b = torch.cat(
            [
                hf_sd[pre + "attention.attention.query.bias"],
                hf_sd[pre + "attention.attention.key.bias"],
                hf_sd[pre + "attention.attention.value.bias"],
            ]
        )
        official.update(
            {
                f"blocks.{i}.norm1.weight": hf_sd[pre + "norm1.weight"],
                f"blocks.{i}.norm1.bias": hf_sd[pre + "norm1.bias"],
                f"blocks.{i}.attn.qkv.weight": qkv_w,
                f"blocks.{i}.attn.qkv.bias": qkv_b,
                f"blocks.{i}.attn.proj.weight": hf_sd[pre + "attention.output.dense.weight"],
                f"blocks.{i}.attn.proj.bias": hf_sd[pre + "attention.output.dense.bias"],
                f"blocks.{i}.ls1.gamma": hf_sd[pre + "layer_scale1.lambda1"],
                f"blocks.{i}.norm2.weight": hf_sd[pre + "norm2.weight"],
                f"blocks.{i}.norm2.bias": hf_sd[pre + "norm2.bias"],
                f"blocks.{i}.mlp.fc1.weight": hf_sd[pre + "mlp.fc1.weight"],
                f"blocks.{i}.mlp.fc1.bias": hf_sd[pre + "mlp.fc1.bias"],
                f"blocks.{i}.mlp.fc2.weight": hf_sd[pre + "mlp.fc2.weight"],
                f"blocks.{i}.mlp.fc2.bias": hf_sd[pre + "mlp.fc2.bias"],
                f"blocks.{i}.ls2.gamma": hf_sd[pre + "layer_scale2.lambda1"],
            }
        )
    p_of, _ = D.convert_torch_state_dict(official, cfg)
    for k in ["cls_token", "pos_embed", "patch_kernel", "norm_scale"]:
        np.testing.assert_allclose(np.asarray(p_hf[k]), np.asarray(p_of[k]))
    for k in p_hf["blocks"]:
        np.testing.assert_allclose(
            np.asarray(p_hf["blocks"][k]), np.asarray(p_of["blocks"][k]), err_msg=k
        )


def test_extract_features_shape_and_grad():
    cfg = _small_cfg()
    params = D.init_params(jax.random.PRNGKey(0), cfg)
    img = jnp.ones((1, 3, 56, 56)) * 0.5

    feats = D.extract_features(params, img, cfg)
    assert feats.shape == (1, 16, 64)

    # Differentiable w.r.t. the input image (the fine-loss path).
    def loss(x):
        return jnp.sum(D.extract_features(params, x, cfg) ** 2)

    g = jax.grad(loss)(img)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_feat_size_matches_reference():
    assert D.DinoConfig().feat_size == 37  # 518 // 14, dino.py:16


@pytest.mark.slow
def test_matches_transformers_full_b14_scale():
    """Full ViT-B/14 dims at the production 518^2 input (VERDICT r1 #4).

    A randomly-initialized torch dinov2-B (HF architecture, true dims:
    768x12x12, layerscale, 37^2 pos grid after interpolation) must convert
    and match token-for-token — this exercises the real qkv packing,
    layerscale gammas and pos-embed interpolation at scale, which the toy
    64-dim test cannot.
    """
    from transformers import Dinov2Config, Dinov2Model

    cfg_t = Dinov2Config(
        hidden_size=768,
        num_hidden_layers=12,
        num_attention_heads=12,
        intermediate_size=3072,
        patch_size=14,
        image_size=518,
        layerscale_value=1.0,
    )
    torch.manual_seed(0)
    model = Dinov2Model(cfg_t)
    model.eval()

    cfg = D.DinoConfig()  # production defaults: ViT-B/14 @ 518 -> 37^2 x 768
    params, cfg = D.convert_torch_state_dict(model.state_dict(), cfg)
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    assert n_params > 80_000_000  # the real 86M-param backbone

    rng = np.random.RandomState(0)
    img = rng.rand(1, 3, 518, 518).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(img)).last_hidden_state.numpy()[:, 1:]
    got = np.asarray(D.forward_tokens(params, jnp.asarray(img), cfg))
    assert got.shape == (1, 37 * 37, 768)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_model_presets():
    for name, want in D.MODEL_PRESETS.items():
        cfg = D.config_for_model(name, smaller_edge_size=224)
        assert cfg.embed_dim == want["embed_dim"]
        assert cfg.depth == want["depth"]
        assert cfg.num_heads == want["num_heads"]
        assert cfg.embed_dim // cfg.num_heads == 64  # whole family: head dim 64
        assert cfg.smaller_edge_size == 224
    with pytest.raises(ValueError):
        D.config_for_model("dinov2_vitg14")  # SwiGLU FFN unsupported


def test_converter_infers_family_architecture():
    # An official-format state_dict at a head-dim-64 shape DIFFERENT from
    # the passed cfg (vitb14 default): the converter must adopt the
    # checkpoint's architecture (models are selected by checkpoint, the
    # reference's torch.hub semantics — dino.py:12-14).
    rng = np.random.RandomState(0)
    d, depth, grid, p = 128, 2, 4, 14

    def t(*shape):
        return rng.randn(*shape).astype(np.float32) * 0.02

    sd = {
        "cls_token": t(1, 1, d),
        "pos_embed": t(1, grid * grid + 1, d),
        "patch_embed.proj.weight": t(d, 3, p, p),
        "patch_embed.proj.bias": t(d),
        "norm.weight": np.ones(d, np.float32),
        "norm.bias": t(d),
    }
    for i in range(depth):
        sd.update({
            f"blocks.{i}.norm1.weight": np.ones(d, np.float32),
            f"blocks.{i}.norm1.bias": t(d),
            f"blocks.{i}.attn.qkv.weight": t(3 * d, d),
            f"blocks.{i}.attn.qkv.bias": t(3 * d),
            f"blocks.{i}.attn.proj.weight": t(d, d),
            f"blocks.{i}.attn.proj.bias": t(d),
            f"blocks.{i}.ls1.gamma": t(d),
            f"blocks.{i}.norm2.weight": np.ones(d, np.float32),
            f"blocks.{i}.norm2.bias": t(d),
            f"blocks.{i}.mlp.fc1.weight": t(4 * d, d),
            f"blocks.{i}.mlp.fc1.bias": t(4 * d),
            f"blocks.{i}.mlp.fc2.weight": t(d, 4 * d),
            f"blocks.{i}.mlp.fc2.bias": t(d),
            f"blocks.{i}.ls2.gamma": t(d),
        })
    params, cfg = D.convert_torch_state_dict(
        sd, D.DinoConfig(smaller_edge_size=2 * p)
    )
    assert cfg.embed_dim == d and cfg.depth == depth and cfg.num_heads == 2
    assert cfg.pos_grid == grid
    img = jnp.asarray(np.random.RandomState(1).rand(1, 3, 2 * p, 2 * p), jnp.float32)
    out = D.forward_tokens(params, img, cfg)
    assert out.shape == (1, 4, d)
    assert np.isfinite(np.asarray(out)).all()


def test_flash_wrapper_padding_and_segments(monkeypatch):
    """_flash_attention's pad + segment-id + transpose plumbing is exact.

    The Pallas kernel itself is TPU-only; on CPU we substitute the module's
    own pure-jnp ``mha_reference`` (same signature, same segment-mask
    semantics), which isolates OUR wrapper logic: padding 1370-style odd
    token counts up to the tile multiple must not perturb the valid rows.
    """
    import jax.experimental.pallas.ops.tpu.flash_attention as fa

    def fake_flash(q, k, v, ab=None, segment_ids=None, *, causal=False,
                   sm_scale=1.0, block_sizes=None):
        return fa.mha_reference(
            q, k, v, ab, segment_ids=segment_ids, causal=causal,
            sm_scale=sm_scale,
        )

    monkeypatch.setattr(fa, "flash_attention", fake_flash)
    b, n, h, hd = 2, 45, 3, 16  # n deliberately not a multiple of the block
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, n, h, hd), jnp.float32)
    k = jax.random.normal(ks[1], (b, n, h, hd), jnp.float32)
    v = jax.random.normal(ks[2], (b, n, h, hd), jnp.float32)
    ref = D._attention(q, k, v, hd)
    out = D._flash_attention(q, k, v, hd, block=16)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_attn_impl_flash_falls_back_on_cpu():
    """attn_impl='flash' must still run (as xla) on non-TPU backends."""
    cfg = dataclasses.replace(
        D.DinoConfig(depth=2, pos_grid=4, smaller_edge_size=56),
        attn_impl="flash",
    )
    params = D.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 56, 56), jnp.float32)
    out = D.forward_tokens(params, x, cfg, remat=False)
    assert out.shape == (1, 16, cfg.embed_dim)


def test_attn_impl_splash_falls_back_on_cpu():
    """attn_impl='splash' must still run (as xla) on non-TPU backends."""
    cfg = dataclasses.replace(
        D.DinoConfig(depth=2, pos_grid=4, smaller_edge_size=56),
        attn_impl="splash",
    )
    params = D.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 56, 56), jnp.float32)
    out = D.forward_tokens(params, x, cfg, remat=False)
    assert out.shape == (1, 16, cfg.embed_dim)


def test_splash_wrapper_padding_and_mask(monkeypatch):
    """_splash_attention's pad + key-mask + scale-folding plumbing is exact.

    Runs the real splash kernel in Pallas interpret mode (CPU), isolating
    OUR wrapper logic: folding 1/sqrt(hd) into q, padding odd token counts
    up to the block multiple, masking padded KEYS while letting padded
    query rows attend (their outputs sliced off), and the transposes.
    """
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as splash,
    )

    real = splash.make_splash_mha

    def interp_mha(mask, **kw):
        kw["interpret"] = True
        return real(mask, **kw)

    monkeypatch.setattr(splash, "make_splash_mha", interp_mha)
    # Kernel constraint: block_kv_compute must be a multiple of 128, so the
    # smallest legal block is 128; n=45 still exercises the padding path.
    b, n, h, hd = 1, 45, 2, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, n, h, hd), jnp.float32)
    k = jax.random.normal(ks[1], (b, n, h, hd), jnp.float32)
    v = jax.random.normal(ks[2], (b, n, h, hd), jnp.float32)
    ref = D._attention(q, k, v, hd)
    out = D._splash_attention(q, k, v, hd, block=128)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_patch_tokens_matches_resize_then_embed():
    """fused_patch_tokens == patchify(normalize(bicubic_resize(x))) @ kernel.

    The fused path (models/dino.py) composes three linear maps; f32 params
    make the comparison exact to matmul reassociation (~1e-4)."""
    from dynhor_tpu.ops.resize import resize_bicubic_align_corners

    cfg = dataclasses.replace(_small_cfg(), smaller_edge_size=98)  # g=7
    params = D.init_params(jax.random.PRNGKey(0), cfg)
    rgb = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 48, 48))

    fused = D.fused_patch_tokens(params, rgb, cfg)

    p = cfg.patch_size
    edge = cfg.smaller_edge_size
    g = edge // p
    big = resize_bicubic_align_corners(rgb, edge, edge)
    mean = jnp.asarray(D.IMAGENET_MEAN).reshape(1, 3, 1, 1)
    std = jnp.asarray(D.IMAGENET_STD).reshape(1, 3, 1, 1)
    big = (big - mean) / std
    x = big.reshape(2, 3, g, p, g, p).transpose(0, 2, 4, 1, 3, 5)
    x = x.reshape(2, g * g, 3 * p * p)
    ref = x @ params["patch_kernel"] + params["patch_bias"]

    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=2e-4)


def test_forward_tokens_from_crop_matches_forward_tokens():
    """End-to-end token equivalence of the fused front end (f32 params)."""
    from dynhor_tpu.ops.resize import resize_bicubic_align_corners

    cfg = _small_cfg()
    params = D.init_params(jax.random.PRNGKey(0), cfg)
    rgb = jax.random.uniform(jax.random.PRNGKey(2), (1, 3, 64, 64))

    fused = D.forward_tokens_from_crop(params, rgb, cfg, remat=False)

    edge = cfg.smaller_edge_size
    big = resize_bicubic_align_corners(rgb, edge, edge)
    mean = jnp.asarray(D.IMAGENET_MEAN).reshape(1, 3, 1, 1)
    std = jnp.asarray(D.IMAGENET_STD).reshape(1, 3, 1, 1)
    ref = D.forward_tokens(params, (big - mean) / std, cfg, remat=False)

    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=1e-3)


def test_fused_patch_tokens_grad_flows():
    """Gradient w.r.t. the small crop flows through the fused front end."""
    cfg = dataclasses.replace(_small_cfg(), smaller_edge_size=28)  # g=2
    params = D.init_params(jax.random.PRNGKey(0), cfg)
    rgb = jax.random.uniform(jax.random.PRNGKey(3), (1, 3, 16, 16))
    g = jax.grad(lambda im: D.fused_patch_tokens(params, im, cfg).sum())(rgb)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_dino_config_rejects_bad_attn_impl():
    with pytest.raises(ValueError, match="attn_impl"):
        D.DinoConfig(attn_impl="flsh")
