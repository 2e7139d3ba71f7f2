"""DINOv2 ViT in pure JAX (functional, scan-over-layers).

Replaces the frozen torch.hub ``dinov2_vitb14`` wrapper
(ObjTracker/dino.py:4-22), which the reference uses both as a retrieval
embedder for prior-view selection and as a differentiable perceptual-loss
backbone (gradients flow THROUGH the frozen weights into the rendered
image — pose_initializtion.py:170-184).  The whole head-dim-64 DINOv2
family is supported (vits14 / vitb14 / vitl14 — MODEL_PRESETS); vitb14 is
the reference default.

TPU design notes:
  * Patch embedding is a patch-unfold + one big matmul (MXU) rather than a
    conv — identical math, better layout control.
  * The 12 transformer blocks are stacked into one parameter pytree and
    executed with ``lax.scan`` (fast compiles, uniform code), with optional
    ``jax.checkpoint`` per block so vmapping the fine loss over all video
    frames fits in HBM.
  * Everything is bf16-friendly; params stay f32 by default (the model is
    frozen — no optimizer state).

Weights: load a torch ``state_dict`` checkpoint (official
facebookresearch/dinov2 naming or HuggingFace transformers naming) via
``convert_torch_state_dict``; with no checkpoint available (zero-egress
environments) ``init_params`` gives a deterministic random model so the
pipeline stays runnable end-to-end.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.resize import resize_bicubic_halfpix

Array = jax.Array

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


@dataclasses.dataclass(frozen=True)
class DinoConfig:
    """ViT-B/14 (dinov2_vitb14) — reference model at ObjTracker/dino.py:5."""

    patch_size: int = 14
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: int = 4
    pos_grid: int = 37  # native pos-embed grid (518 / 14)
    smaller_edge_size: int = 518  # reference dino.py:5
    layer_norm_eps: float = 1e-6
    # Attention implementation: "xla" (einsum softmax einsum, fused by
    # XLA), "flash" (legacy Pallas TPU FlashAttention) or "splash" (the
    # newer block-sparse Pallas kernel) — both kernels stream (N x N)
    # probability tiles through VMEM with `flash_block` tiles.  Measured
    # v5e, 8 x 1370 tokens, bf16, remat="frozen", grad-to-input
    # (tools/probe_vit_attention.py, r4 with bf16-only probs):
    #   xla 112.2 ms | splash blk=768 fused-bwd 111.0 | splash blk=512
    #   122.6 | flash blk=256 206.8 | flash blk=128 363.3 ms
    # The BEST kernel config only ties the XLA path (within noise): with
    # the hand-written bf16 softmax + frozen remat the XLA program is
    # already compute-bound at this N, so "xla" stays the default (no
    # Pallas dependency on the hot path, identical speed).  Non-TPU
    # backends always use "xla" (the Pallas kernels are TPU-only).
    attn_impl: str = "xla"
    flash_block: int = 128
    # splash has its own block default: per the probe, blk=128 is splash's
    # WORST config (372 ms vs 111 ms at blk=768), so it must not inherit
    # flash's default.
    splash_block: int = 768
    # splash only: one fused dq+dkv backward kernel instead of two passes.
    splash_fused_bwd: bool = False

    def __post_init__(self):
        if self.attn_impl not in ("xla", "flash", "splash"):
            raise ValueError(
                "attn_impl must be 'xla', 'flash' or 'splash', "
                f"got {self.attn_impl!r}"
            )

    @property
    def feat_size(self) -> int:
        # reference dino.py:16: smaller_edge_size // patch_size
        return self.smaller_edge_size // self.patch_size


# The torch.hub DINOv2 family (the reference hard-codes 'dinov2_vitb14',
# ObjTracker/dino.py:5; s/b/l share the block structure — all at head
# dim 64).  vitg14 uses a SwiGLU FFN and is not supported.
MODEL_PRESETS: dict[str, dict[str, int]] = {
    "dinov2_vits14": {"embed_dim": 384, "depth": 12, "num_heads": 6},
    "dinov2_vitb14": {"embed_dim": 768, "depth": 12, "num_heads": 12},
    "dinov2_vitl14": {"embed_dim": 1024, "depth": 24, "num_heads": 16},
}


def config_for_model(name: str, **overrides) -> DinoConfig:
    """DinoConfig for a torch.hub DINOv2 model name (see MODEL_PRESETS)."""
    if name not in MODEL_PRESETS:
        raise ValueError(
            f"unknown DINOv2 model {name!r}; supported: {sorted(MODEL_PRESETS)} "
            "(vitg14's SwiGLU FFN is not implemented)"
        )
    return dataclasses.replace(DinoConfig(), **MODEL_PRESETS[name], **overrides)


def init_params(key: Array, cfg: DinoConfig = DinoConfig()) -> dict[str, Any]:
    """Deterministic random init (trunc-normal 0.02), official layout."""
    d = cfg.embed_dim
    h = cfg.mlp_ratio * d
    n_pos = cfg.pos_grid * cfg.pos_grid + 1
    keys = jax.random.split(key, 8)

    def tn(k, shape, std=0.02):
        return std * jax.random.truncated_normal(k, -2.0, 2.0, shape, jnp.float32)

    def blk(k, shape_in, shape_out):
        return tn(k, (cfg.depth, shape_in, shape_out))

    kb = jax.random.split(keys[7], 6)
    return {
        "cls_token": tn(keys[0], (1, 1, d)),
        "pos_embed": tn(keys[1], (1, n_pos, d)),
        "patch_kernel": tn(keys[2], (3 * cfg.patch_size**2, d)),
        "patch_bias": jnp.zeros((d,)),
        "blocks": {
            "norm1_scale": jnp.ones((cfg.depth, d)),
            "norm1_bias": jnp.zeros((cfg.depth, d)),
            "qkv_kernel": blk(kb[0], d, 3 * d),
            "qkv_bias": jnp.zeros((cfg.depth, 3 * d)),
            "proj_kernel": blk(kb[1], d, d),
            "proj_bias": jnp.zeros((cfg.depth, d)),
            "ls1": jnp.full((cfg.depth, d), 1e-5),
            "norm2_scale": jnp.ones((cfg.depth, d)),
            "norm2_bias": jnp.zeros((cfg.depth, d)),
            "fc1_kernel": blk(kb[2], d, h),
            "fc1_bias": jnp.zeros((cfg.depth, h)),
            "fc2_kernel": blk(kb[3], h, d),
            "fc2_bias": jnp.zeros((cfg.depth, d)),
            "ls2": jnp.full((cfg.depth, d), 1e-5),
        },
        "norm_scale": jnp.ones((d,)),
        "norm_bias": jnp.zeros((d,)),
    }


def _layer_norm(x: Array, scale: Array, bias: Array, eps: float) -> Array:
    # Statistics in f32 (bf16 mean/variance loses too much), output in the
    # compute dtype.
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = ((x32 - mu) ** 2).mean(-1, keepdims=True)
    out = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return out.astype(x.dtype) * scale + bias


def _attention(q: Array, k: Array, v: Array, hd: int) -> Array:
    """Multi-head attention, (B, N, H, hd) -> (B, N, H, hd), XLA einsums.

    Round-2 measurement (v5e, 8 x 1370 tokens, 12 heads, bf16, per-block
    remat, DEFAULT-config flash padded to 512-multiples): Pallas flash was
    slower (148 ms ViT fwd+bwd vs 132.6 ms).  Round 3 revisits it with
    128-tile blocks + segment-id padding (1370 -> 1408, +2.8%) under the
    "frozen" remat policy — see _flash_attention / DinoConfig.attn_impl.
    This XLA path stays the default and the only non-TPU path.

    Softmax is written out by hand with the exp output cast to the compute
    dtype BEFORE normalization and the 1/sum folded in AFTER the
    probabilities@V matmul: ``jax.nn.softmax(s32).astype(bf16)`` makes XLA
    materialize the (B, H, N, N) probabilities in BOTH f32 and bf16 (seen
    directly in an HBM dump: 8.3 G f32 + 4.2 G bf16 buffers at the
    production shape), while this formulation keeps every N x N-sized
    buffer in the compute dtype — the f32 exp exists only inside a fusion.
    Numerics: identical in f32; in bf16 the rounding moves from
    "round(p/sum)" to "round(p)/sum", the same 2^-8 relative scale.
    """
    from jax.ad_checkpoint import checkpoint_name

    dtype = q.dtype
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * jnp.asarray(1.0 / np.sqrt(hd), dtype)
    s32 = s.astype(jnp.float32)
    m = jax.lax.stop_gradient(s32.max(axis=-1, keepdims=True))
    # Save the two N-sized softmax reductions under the "frozen" remat
    # policy (models/dino._trunk): the backward's recompute then rebuilds
    # the probabilities from the scores matmul + one exp pass, skipping the
    # max/sum reduction passes over the (B, H, N, N) f32 scores entirely.
    # They cost (B, H, N) floats of HBM — noise next to the saved traffic.
    m = checkpoint_name(m, "dino_acts")
    p32 = jnp.exp(s32 - m)
    denom = checkpoint_name(p32.sum(axis=-1), "dino_acts")  # (B, H, N) f32
    p = p32.astype(dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, v)
    inv = (1.0 / denom).astype(dtype).transpose(0, 2, 1)[..., None]  # (B,N,H,1)
    return o * inv


def _flash_attention(q: Array, k: Array, v: Array, hd: int, block: int) -> Array:
    """Pallas TPU FlashAttention, (B, N, H, hd) -> (B, N, H, hd).

    Pads the token axis to a multiple of ``block`` and masks the pad via
    segment ids (valid tokens id 1, pad id 0 — only same-id pairs attend),
    so numerics match _attention exactly on the valid 1370 tokens; the pad
    rows are sliced off.  The kernel streams (N x N) probability tiles
    through VMEM instead of materializing them in HBM, and brings its own
    custom VJP (dq/dk/dv kernels) — composes with jax.checkpoint.
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    b, n, h, _ = q.shape
    n_pad = (-n) % block
    qt = q.transpose(0, 2, 1, 3)  # (B, H, N, hd)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    if n_pad:
        pad = ((0, 0), (0, 0), (0, n_pad), (0, 0))
        qt, kt, vt = (jnp.pad(a, pad) for a in (qt, kt, vt))
    seg = jnp.broadcast_to(
        (jnp.arange(n + n_pad) < n).astype(jnp.int32)[None], (b, n + n_pad)
    )
    m = n + n_pad
    blk = min(block, m)
    sizes = BlockSizes(
        block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
        block_q_major_dkv=blk, block_k_major_dkv=blk, block_k_dkv=blk,
        block_q_dkv=blk, block_k_major_dq=blk, block_k_dq=blk, block_q_dq=blk,
    )
    o = flash_attention(
        qt, kt, vt, segment_ids=SegmentIds(q=seg, kv=seg),
        sm_scale=float(1.0 / np.sqrt(hd)), block_sizes=sizes,
    )
    return o[:, :, :n].transpose(0, 2, 1, 3)


def _splash_attention(
    q: Array, k: Array, v: Array, hd: int, block: int, fused_bwd: bool = False
) -> Array:
    """Pallas TPU SplashAttention, (B, N, H, hd) -> (B, N, H, hd).

    Splash is the newer block-sparse TPU attention kernel (the one serving
    production LLMs); unlike the legacy flash_attention it pipelines the
    kv axis with compute sub-blocks and ships a fused dq/dkv backward.
    The (N x N) probabilities never touch HBM — at the production shape
    (8 x 1370 tokens x 12 heads) the XLA path materializes ~0.8 GB of
    bf16 score/prob buffers per block forward and ~3x that in the
    backward, which is the ViT's dominant HBM term.

    Padding: token axis to a multiple of ``block``; padded KEYS are
    masked off via a static NumpyMask (so numerics match _attention
    exactly on the valid tokens), while padded QUERY rows attend the
    valid keys (their outputs are sliced off; leaving them fully masked
    would make their softmax NaN and poison the backward through the
    pad-slice VJP).  The mask is static numpy — processed once at trace
    time into block-sparse MaskInfo constants.
    """
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as splash,
    )
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_mask as splash_mask,
    )

    b, n, h, _ = q.shape
    n_pad = (-n) % block
    m = n + n_pad
    # Splash takes pre-scaled logits (no sm_scale arg): fold 1/sqrt(hd)
    # into q.  hd = 64 -> 0.125, exact in bf16.
    qt = (q * jnp.asarray(1.0 / np.sqrt(hd), q.dtype)).transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)  # (B, H, N, hd)
    vt = v.transpose(0, 2, 1, 3)
    if n_pad:
        pad = ((0, 0), (0, 0), (0, n_pad), (0, 0))
        qt, kt, vt = (jnp.pad(a, pad) for a in (qt, kt, vt))
    arr = np.zeros((m, m), dtype=np.bool_)
    arr[:, :n] = True
    mask = splash_mask.MultiHeadMask([splash_mask.NumpyMask(arr)] * h)
    blk = min(block, m)
    sizes = splash.BlockSizes(
        block_q=blk, block_kv=blk, block_kv_compute=blk,
        block_q_dkv=blk, block_kv_dkv=blk, block_kv_dkv_compute=blk,
        # The fused backward emits dq inside the dkv kernel (no separate dq
        # pass); its dq block sizes must be unset.
        block_q_dq=None if fused_bwd else blk,
        block_kv_dq=None if fused_bwd else blk,
        use_fused_bwd_kernel=fused_bwd,
    )
    kernel = splash.make_splash_mha(
        mask, head_shards=1, q_seq_shards=1, block_sizes=sizes,
    )
    o = jax.vmap(kernel)(qt, kt, vt)  # (B, H, N, hd)
    return o[:, :, :n].transpose(0, 2, 1, 3)


def _block(
    x: Array, p: dict[str, Array], num_heads: int, eps: float,
    attn_impl: str = "xla", flash_block: int = 128,
    splash_block: int = 768, splash_fused_bwd: bool = False,
) -> Array:
    from jax.ad_checkpoint import checkpoint_name

    b, n, d = x.shape
    hd = d // num_heads
    h = _layer_norm(x, p["norm1_scale"], p["norm1_bias"], eps)
    qkv = h @ p["qkv_kernel"] + p["qkv_bias"]  # (B, N, 3D)
    # Named saves (active only under remat="frozen"): with frozen weights
    # the backward needs no linear-layer inputs (no dW), so saving qkv, the
    # mid residual, and the pre-gelu activation lets the backward recompute
    # only QK^T+softmax instead of the whole block forward.
    qkv = checkpoint_name(qkv, "dino_acts")
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, n, num_heads, hd)
    k = k.reshape(b, n, num_heads, hd)
    v = v.reshape(b, n, num_heads, hd)
    if attn_impl == "flash":
        o = _flash_attention(q, k, v, hd, flash_block).reshape(b, n, d)
    elif attn_impl == "splash":
        o = _splash_attention(
            q, k, v, hd, splash_block, splash_fused_bwd
        ).reshape(b, n, d)
    else:
        o = _attention(q, k, v, hd).reshape(b, n, d)
    o = o @ p["proj_kernel"] + p["proj_bias"]
    x = checkpoint_name(x + p["ls1"] * o, "dino_acts")
    h = _layer_norm(x, p["norm2_scale"], p["norm2_bias"], eps)
    h = checkpoint_name(h @ p["fc1_kernel"] + p["fc1_bias"], "dino_acts")
    h = jax.nn.gelu(h, approximate=False)
    h = h @ p["fc2_kernel"] + p["fc2_bias"]
    return x + p["ls2"] * h


def _interp_pos_embed(pos_embed: Array, grid0: int, gh: int, gw: int) -> Array:
    """Bicubic pos-embed interpolation (dinov2 interpolate_pos_encoding)."""
    cls_pe = pos_embed[:, :1]
    patch_pe = pos_embed[:, 1:]
    if gh == grid0 and gw == grid0:
        return pos_embed
    d = patch_pe.shape[-1]
    grid = patch_pe.reshape(grid0, grid0, d).transpose(2, 0, 1)  # (D, g, g)
    grid = resize_bicubic_halfpix(grid, gh, gw)
    out = grid.transpose(1, 2, 0).reshape(1, gh * gw, d)
    return jnp.concatenate([cls_pe, out], axis=1)


def _trunk(
    params: dict[str, Any],
    x: Array,
    cfg: DinoConfig,
    remat: bool | str,
    gh: int,
    gw: int,
) -> Array:
    """cls + pos-embed + block scan + final LN on patch-embedded tokens.

    Args:
      x: (B, gh*gw, D) patch-embedded tokens (any patch-embed front end).
    """
    b = x.shape[0]
    cls = jnp.broadcast_to(params["cls_token"], (b, 1, cfg.embed_dim)).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1)
    pos = _interp_pos_embed(params["pos_embed"], cfg.pos_grid, gh, gw)
    x = x + pos.astype(x.dtype)  # pos-embed interp is f32; keep bf16 carry

    attn_impl = cfg.attn_impl if jax.default_backend() == "tpu" else "xla"

    def body(x, blk_params):
        return (
            _block(
                x, blk_params, cfg.num_heads, cfg.layer_norm_eps,
                attn_impl, cfg.flash_block, cfg.splash_block,
                cfg.splash_fused_bwd,
            ),
            None,
        )

    if remat == "dots":
        # Per-block remat with matmul outputs saved: the backward recomputes
        # only elementwise/softmax work — ~the memory of full remat during
        # the scan body, most of the speed of no-remat.
        body = jax.checkpoint(
            body, policy=jax.checkpoint_policies.checkpoint_dots
        )
    elif remat == "frozen":
        # Frozen-weight remat: save the three named per-block activations
        # (qkv, mid residual, pre-gelu — 8*D per token, ~1.6 GB bf16 at the
        # 8x1370-token production shape).  Because the weights are frozen
        # (no dW), the backward then recomputes only QK^T+softmax, cutting
        # the per-block re-forward from a full block to ~10% of one.
        body = jax.checkpoint(
            body,
            policy=jax.checkpoint_policies.save_only_these_names("dino_acts"),
        )
    elif remat:
        body = jax.checkpoint(body)
    x, _ = jax.lax.scan(body, x, params["blocks"])
    x = _layer_norm(x, params["norm_scale"], params["norm_bias"], cfg.layer_norm_eps)
    return x[:, 1:]


@functools.partial(jax.jit, static_argnames=("cfg", "remat"))
def forward_tokens(
    params: dict[str, Any],
    images: Array,
    cfg: DinoConfig = DinoConfig(),
    remat: bool | str = True,
) -> Array:
    """ViT forward; returns final-layernormed PATCH tokens (B, N, D).

    Equivalent to dinov2's ``get_intermediate_layers(x)[0]`` with default
    n=1, norm=True (the reference's extract_features, dino.py:19-22): the
    last block's output, final LN applied, cls token stripped.

    Args:
      images: (B, 3, H, W), ImageNet-normalized, H/W divisible by patch.
    """
    p = cfg.patch_size
    b, c, hh, ww = images.shape
    gh, gw = hh // p, ww // p
    x = images.reshape(b, c, gh, p, gw, p).transpose(0, 2, 4, 1, 3, 5)
    x = x.reshape(b, gh * gw, c * p * p)
    x = x @ params["patch_kernel"] + params["patch_bias"]
    return _trunk(params, x, cfg, remat, gh, gw)


@functools.lru_cache(maxsize=16)
def _fused_resize_factor(small: int, edge: int, patch: int) -> np.ndarray:
    """(g, patch, small) bicubic align-corners resampling matrix, grouped
    by patch row: row (a, u) of the (edge, small) matrix is the weights of
    resized pixel a*patch+u over the `small` source pixels."""
    from ..ops.resize import _bicubic_matrix_ac

    return _bicubic_matrix_ac(small, edge).reshape(edge // patch, patch, small)


def fused_patch_tokens(
    params: dict[str, Any], rgb_small: Array, cfg: DinoConfig = DinoConfig()
) -> Array:
    """Patch-embed tokens straight from a small crop — the exact linear
    composition of (bicubic align-corners resize to ``smaller_edge_size``)
    ∘ (ImageNet normalization) ∘ (14x14 patchify + embed matmul).

    The reference materializes the upsampled image per optimizer step
    (F.interpolate to 518^2 at pose_initializtion.py:171,287 feeding the
    14x14 conv patch embed); resize and patch-embed are both linear maps,
    so their composition factors into three small einsums over the 256^2
    grid — the 518^2x3 intermediate (and its backward transpose) never
    exists, and the ImageNet affine folds into the kernel/bias.

    Resampling contractions run in f32 (exact parity with the f32 resize);
    the embedding matmul runs in the params' dtype (bf16 MXU path when
    pre-cast), matching forward_tokens' numerics to bf16 rounding.

    Args:
      rgb_small: (B, 3, s, s) in [0, 1] — NOT ImageNet-normalized.

    Returns: (B, g*g, D) tokens, g = smaller_edge_size // patch_size.
    """
    p = cfg.patch_size
    edge = cfg.smaller_edge_size
    if edge % p:
        raise ValueError(f"smaller_edge_size {edge} not divisible by patch {p}")
    g = edge // p
    b, c, s, _ = rgb_small.shape
    W = jnp.asarray(_fused_resize_factor(s, edge, p))  # (g, p, s) f32
    kernel = params["patch_kernel"]  # (3*p*p, D)
    dtype = kernel.dtype
    d = kernel.shape[-1]
    k32 = kernel.astype(jnp.float32).reshape(c, p, p, d)
    inv_std = jnp.asarray(1.0 / IMAGENET_STD)
    kn = (k32 * inv_std[:, None, None, None]).astype(dtype)  # (c,p,p,D)
    # Constant inputs resize to themselves (clamped-tap rows sum to 1), so
    # the mean-subtraction folds into a single bias correction.
    bias = params["patch_bias"].astype(jnp.float32) - jnp.einsum(
        "cuvd,c->d", k32, jnp.asarray(IMAGENET_MEAN / IMAGENET_STD)
    )
    x = rgb_small.astype(jnp.float32)
    y = jnp.einsum("aup,bcpq->bcuaq", W, x)  # rows resampled
    z = jnp.einsum("bcuaq,nvq->bcuanv", y, W)  # cols resampled
    t = jnp.einsum("bcuanv,cuvd->band", z.astype(dtype), kn)
    return (t + bias.astype(dtype)).reshape(b, g * g, d)


@functools.partial(jax.jit, static_argnames=("cfg", "remat"))
def forward_tokens_from_crop(
    params: dict[str, Any],
    rgb_small: Array,
    cfg: DinoConfig = DinoConfig(),
    remat: bool | str = True,
) -> Array:
    """ViT forward from an un-normalized SMALL crop (B, 3, s, s) in [0,1]:
    fused resize+normalize+patch-embed (fused_patch_tokens), then the
    shared trunk.  Token-level equivalent of
    ``forward_tokens(params, normalize(resize(rgb, edge)), cfg, remat)``.
    """
    g = cfg.feat_size
    x = fused_patch_tokens(params, rgb_small, cfg)
    return _trunk(params, x, cfg, remat, g, g)


def extract_features(
    params: dict[str, Any], images01: Array, cfg: DinoConfig = DinoConfig(), remat: bool = True
) -> Array:
    """ImageNet-normalize then run the ViT (reference dino.py:19-22).

    Args:
      images01: (B, 3, H, W) in [0, 1].  Differentiable.
    """
    mean = jnp.asarray(IMAGENET_MEAN).reshape(1, 3, 1, 1)
    std = jnp.asarray(IMAGENET_STD).reshape(1, 3, 1, 1)
    return forward_tokens(params, (images01 - mean) / std, cfg, remat)


# --------------------------------------------------------------------------
# Torch checkpoint conversion
# --------------------------------------------------------------------------

def convert_torch_state_dict(sd: dict[str, Any], cfg: DinoConfig = DinoConfig()):
    """Convert a torch DINOv2 state_dict to our param pytree.

    Accepts either the official facebookresearch/dinov2 naming
    (``blocks.N.attn.qkv.weight`` ...) or HuggingFace transformers naming
    (``encoder.layer.N.attention.attention.query.weight`` ...).
    Values may be torch tensors or numpy arrays.

    The architecture (embed_dim / depth / num_heads) is INFERRED from the
    state_dict, so any model of the supported DINOv2 family (vits14 /
    vitb14 / vitl14 — all at head dim 64) loads without pre-configuring
    ``cfg``; cfg supplies the non-weight knobs (smaller_edge_size, eps).
    """

    def a(t):
        if hasattr(t, "detach"):
            t = t.detach().cpu().numpy()
        return np.asarray(t, np.float32)

    def has(k):
        return k in sd

    official = has("blocks.0.attn.qkv.weight") or has("patch_embed.proj.weight")
    cls_key = "cls_token" if official else "embeddings.cls_token"
    d = int(np.shape(sd[cls_key])[-1])
    blk_fmt = "blocks.{}.norm1.weight" if official else "encoder.layer.{}.norm1.weight"
    depth = 0
    while has(blk_fmt.format(depth)):
        depth += 1
    if (d, depth) != (cfg.embed_dim, cfg.depth):
        # cfg was configured for a different model than the checkpoint —
        # adopt the checkpoint's architecture.  num_heads is not stored in
        # the weights; the whole supported family runs head dim 64.
        if d % 64 != 0 or depth == 0:
            raise ValueError(
                f"unsupported DINOv2 checkpoint: embed_dim={d}, depth={depth} "
                "(expected head-dim-64 family; vitg14/SwiGLU is not supported)"
            )
        cfg = dataclasses.replace(cfg, embed_dim=d, depth=depth, num_heads=d // 64)

    if official:
        patch_w = a(sd["patch_embed.proj.weight"])  # (D, 3, p, p)
        patch_kernel = patch_w.reshape(d, -1).T  # (3*p*p, D)
        patch_bias = a(sd["patch_embed.proj.bias"])
        cls_token = a(sd["cls_token"])
        pos_embed = a(sd["pos_embed"])

        def stack(fmt, transpose=False):
            arrs = [a(sd[fmt.format(i)]) for i in range(cfg.depth)]
            arrs = [x.T if transpose else x for x in arrs]
            return np.stack(arrs)

        blocks = {
            "norm1_scale": stack("blocks.{}.norm1.weight"),
            "norm1_bias": stack("blocks.{}.norm1.bias"),
            "qkv_kernel": stack("blocks.{}.attn.qkv.weight", transpose=True),
            "qkv_bias": stack("blocks.{}.attn.qkv.bias"),
            "proj_kernel": stack("blocks.{}.attn.proj.weight", transpose=True),
            "proj_bias": stack("blocks.{}.attn.proj.bias"),
            "ls1": stack("blocks.{}.ls1.gamma"),
            "norm2_scale": stack("blocks.{}.norm2.weight"),
            "norm2_bias": stack("blocks.{}.norm2.bias"),
            "fc1_kernel": stack("blocks.{}.mlp.fc1.weight", transpose=True),
            "fc1_bias": stack("blocks.{}.mlp.fc1.bias"),
            "fc2_kernel": stack("blocks.{}.mlp.fc2.weight", transpose=True),
            "fc2_bias": stack("blocks.{}.mlp.fc2.bias"),
            "ls2": stack("blocks.{}.ls2.gamma"),
        }
        norm_scale = a(sd["norm.weight"])
        norm_bias = a(sd["norm.bias"])
    else:  # transformers naming
        patch_w = a(sd["embeddings.patch_embeddings.projection.weight"])
        patch_kernel = patch_w.reshape(d, -1).T
        patch_bias = a(sd["embeddings.patch_embeddings.projection.bias"])
        cls_token = a(sd["embeddings.cls_token"])
        pos_embed = a(sd["embeddings.position_embeddings"])

        def g(i, name):
            return a(sd[f"encoder.layer.{i}.{name}"])

        def stack_fn(fn):
            return np.stack([fn(i) for i in range(cfg.depth)])

        blocks = {
            "norm1_scale": stack_fn(lambda i: g(i, "norm1.weight")),
            "norm1_bias": stack_fn(lambda i: g(i, "norm1.bias")),
            "qkv_kernel": stack_fn(
                lambda i: np.concatenate(
                    [
                        g(i, "attention.attention.query.weight").T,
                        g(i, "attention.attention.key.weight").T,
                        g(i, "attention.attention.value.weight").T,
                    ],
                    axis=1,
                )
            ),
            "qkv_bias": stack_fn(
                lambda i: np.concatenate(
                    [
                        g(i, "attention.attention.query.bias"),
                        g(i, "attention.attention.key.bias"),
                        g(i, "attention.attention.value.bias"),
                    ]
                )
            ),
            "proj_kernel": stack_fn(lambda i: g(i, "attention.output.dense.weight").T),
            "proj_bias": stack_fn(lambda i: g(i, "attention.output.dense.bias")),
            "ls1": stack_fn(lambda i: g(i, "layer_scale1.lambda1")),
            "norm2_scale": stack_fn(lambda i: g(i, "norm2.weight")),
            "norm2_bias": stack_fn(lambda i: g(i, "norm2.bias")),
            "fc1_kernel": stack_fn(lambda i: g(i, "mlp.fc1.weight").T),
            "fc1_bias": stack_fn(lambda i: g(i, "mlp.fc1.bias")),
            "fc2_kernel": stack_fn(lambda i: g(i, "mlp.fc2.weight").T),
            "fc2_bias": stack_fn(lambda i: g(i, "mlp.fc2.bias")),
            "ls2": stack_fn(lambda i: g(i, "layer_scale2.lambda1")),
        }
        norm_scale = a(sd["layernorm.weight"])
        norm_bias = a(sd["layernorm.bias"])

    n_patches = pos_embed.shape[1] - 1
    grid = int(round(float(np.sqrt(n_patches))))
    params = {
        "cls_token": jnp.asarray(cls_token),
        "pos_embed": jnp.asarray(pos_embed),
        "patch_kernel": jnp.asarray(patch_kernel),
        "patch_bias": jnp.asarray(patch_bias),
        "blocks": jax.tree.map(jnp.asarray, blocks),
        "norm_scale": jnp.asarray(norm_scale),
        "norm_bias": jnp.asarray(norm_bias),
    }
    cfg_out = dataclasses.replace(cfg, pos_grid=grid)
    return params, cfg_out


def load_params(checkpoint_path: str | None, cfg: DinoConfig = DinoConfig(), seed: int = 0):
    """Load converted torch weights if available; else deterministic random.

    Returns (params, cfg).  Checkpoint formats: a torch-saved state_dict
    (.pth) or a numpy .npz of the same keys.
    """
    if checkpoint_path:
        import os

        if not os.path.exists(checkpoint_path):
            raise FileNotFoundError(checkpoint_path)
        if checkpoint_path.endswith(".npz"):
            sd = dict(np.load(checkpoint_path))
        else:
            import torch

            sd = torch.load(checkpoint_path, map_location="cpu", weights_only=True)
            if isinstance(sd, dict) and "state_dict" in sd:
                sd = sd["state_dict"]
        return convert_torch_state_dict(sd, cfg)
    return init_params(jax.random.PRNGKey(seed), cfg), cfg
