"""Neural SDF + radiance fields (pure JAX, functional params).

Capability target (SURVEY.md §2.4): the reference's NeuS reconstruction
stage is unreleased; this is designed from the published NeuS recipe
(Wang et al. 2021) and the instant-nsr-pl fast path (instant-NGP hash
encoding, Mueller et al. 2022 — PAPERS.md), NOT ported.

Two encoder families share the same SDF/color heads:
  * "pe":   frequency positional encoding + 8x256 MLP with skip, geometric
            sphere initialization (classic NeuS).  With the occupancy-grid
            sampler this is the production path (fastest AND best quality
            on TPU — BASELINE.md encoder matrix).
  * "hash": multiresolution hash grid + small MLPs (instant-nsr-pl path);
            the encoding is one big batched gather + trilerp (8 fused
            gathers from a flattened table, level-vectorized).  Kept for
            instant-nsr-pl parity experiments; gather-bound on TPU.

Design note — a third encoder (triplane: three axis-aligned feature
planes, TensoRF/EG3D lineage, 12 gathers/point vs the hash grid's 8*L)
was built and evaluated in rounds 2-3 as the TPU-native explicit-feature
fast path.  It ran at 8.5K rays/s but its geometry underfit structurally
(PSNR 32.7-32.9 dB / Chamfer ~0.076 vs pe+occgrid's 40.4 dB / 0.0222,
unchanged by TV regularization + lower grid lr), so it was cut per the
quality bar: on TPU the pe MLP rides the MXU and needs no explicit
features to be fast — the occupancy-grid sampler, not the encoder, is
what makes the fast path fast (BASELINE.md round 2-3).

Everything is functional: ``init_*_params(key) -> pytree``,
``sdf_fn(params, x) -> (sdf, feat)``; gradients for Eikonal/normals come
from jax.grad over the input points.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


# ---------------------------------------------------------------------------
# Positional-encoding NeuS field
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SDFConfig:
    encoder: str = "pe"  # "pe" | "hash"
    # pe encoder / MLP
    pe_freqs: int = 6
    hidden: int = 256
    depth: int = 8
    skip_layer: int = 4
    feat_dim: int = 256
    geometric_init_radius: float = 0.5  # objects normalized to |v| <= 0.5
    # hash encoder
    hash_levels: int = 16
    hash_features: int = 2
    hash_table_size: int = 2**19
    hash_base_res: int = 16
    hash_max_res: int = 2048
    hash_hidden: int = 64
    hash_depth: int = 2
    # SDF spatial-gradient mode: "auto" = analytic (reverse) for the smooth
    # PE field; linearize-based forward mode for the gather encoder (one
    # primal evaluation + three gather-free tangent replays — reverse mode
    # per point scatters into the table and central differences cost 6
    # extra gathered evaluations).
    grad_mode: str = "auto"  # "auto" | "analytic" | "forward" | "numerical"
    grad_eps: float = 2e-3
    # color head
    color_hidden: int = 256
    color_depth: int = 4
    dir_freqs: int = 4
    # domain
    bound: float = 1.0  # field domain [-bound, bound]^3


def positional_encoding(x: Array, n_freqs: int, include_input: bool = True) -> Array:
    """NeRF-style sin/cos encoding. x: (..., D) -> (..., D*(2*n_freqs)+D?)."""
    outs = [x] if include_input else []
    for i in range(n_freqs):
        f = (2.0**i) * jnp.pi
        outs.append(jnp.sin(f * x))
        outs.append(jnp.cos(f * x))
    return jnp.concatenate(outs, axis=-1)


def _pe_dim(d: int, n_freqs: int) -> int:
    return d + d * 2 * n_freqs


def init_sdf_pe_params(key: Array, cfg: SDFConfig) -> dict[str, Any]:
    """Geometric initialization (Atzmon & Lipman SAL / IGR): the network
    starts as an approximate sphere SDF of radius ``geometric_init_radius``."""
    in_dim = _pe_dim(3, cfg.pe_freqs)
    dims = [in_dim] + [cfg.hidden] * cfg.depth
    keys = jax.random.split(key, cfg.depth + 1)
    layers = []
    for i in range(cfg.depth):
        d_in = dims[i] + (in_dim if i == cfg.skip_layer else 0)
        d_out = dims[i + 1]
        std = np.sqrt(2.0) / np.sqrt(d_out)
        w = std * jax.random.normal(keys[i], (d_in, d_out))
        b = jnp.zeros((d_out,))
        if i == 0:
            # Only the raw-xyz part of the input contributes initially.
            w = w.at[3:, :].set(0.0)
        if i == cfg.skip_layer:
            w = w.at[dims[i] + 3 :, :].set(0.0)
        layers.append({"w": w, "b": b})
    # Final sdf+feature layer: first output is the sdf.
    d_last = dims[-1]
    std = np.sqrt(np.pi) / np.sqrt(d_last)
    w_out = std * jnp.abs(jax.random.normal(keys[-1], (d_last, 1 + cfg.feat_dim))) * 0.0
    w_out = w_out.at[:, 0].set(
        std * jnp.abs(jax.random.normal(keys[-1], (d_last,)))
    )
    w_out = w_out.at[:, 1:].set(
        0.01 * jax.random.normal(jax.random.split(keys[-1])[0], (d_last, cfg.feat_dim))
    )
    b_out = jnp.zeros((1 + cfg.feat_dim,)).at[0].set(-cfg.geometric_init_radius)
    return {"layers": layers, "out": {"w": w_out, "b": b_out}}


def sdf_pe_forward(params, x: Array, cfg: SDFConfig) -> tuple[Array, Array]:
    """x: (..., 3) -> (sdf (...,), feat (..., feat_dim)).

    NOTE the geometric-init sign convention: with out-bias -r and positive
    weights on |x|-growing activations, sdf ~ |x| - r (negative inside).
    """
    h0 = positional_encoding(x, cfg.pe_freqs)
    h = h0
    for i, lyr in enumerate(params["layers"]):
        if i == cfg.skip_layer:
            h = jnp.concatenate([h, h0], axis=-1)
        h = h @ lyr["w"] + lyr["b"]
        h = jax.nn.softplus(h * 100.0) / 100.0  # beta=100 softplus (IGR/NeuS)
    out = h @ params["out"]["w"] + params["out"]["b"]
    return out[..., 0], out[..., 1:]


# ---------------------------------------------------------------------------
# Multiresolution hash encoding (instant-NGP)
# ---------------------------------------------------------------------------

_HASH_PRIMES = np.array([1, 2654435761, 805459861], dtype=np.uint32)


def hash_level_resolutions(cfg: SDFConfig) -> np.ndarray:
    growth = np.exp(
        (np.log(cfg.hash_max_res) - np.log(cfg.hash_base_res)) / max(cfg.hash_levels - 1, 1)
    )
    return np.floor(cfg.hash_base_res * growth ** np.arange(cfg.hash_levels)).astype(
        np.int32
    )


def init_hash_params(key: Array, cfg: SDFConfig) -> dict[str, Any]:
    keys = jax.random.split(key, 4)
    table = 1e-4 * jax.random.uniform(
        keys[0], (cfg.hash_levels, cfg.hash_table_size, cfg.hash_features),
        minval=-1.0, maxval=1.0,
    )
    enc_dim = cfg.hash_levels * cfg.hash_features
    dims = [enc_dim] + [cfg.hash_hidden] * cfg.hash_depth + [1 + cfg.feat_dim]
    mlp = []
    for i in range(len(dims) - 1):
        std = np.sqrt(2.0 / dims[i])
        mlp.append(
            {
                "w": std * jax.random.normal(keys[1 + i % 2], (dims[i], dims[i + 1])),
                "b": jnp.zeros((dims[i + 1],)),
            }
        )
    # Zero-centered final layer: the sphere geometry at init comes from the
    # analytic |x| - r offset added in sdf_hash_forward (instant-nsr-pl
    # style), which gives a true zero crossing from step 0.
    mlp[-1]["w"] = 0.01 * mlp[-1]["w"]
    return {"table": table, "mlp": mlp}


def hash_encode(table: Array, x01: Array, cfg: SDFConfig) -> Array:
    """Multiresolution hash encoding.

    Args:
      table: (L, T, F) feature tables.
      x01: (..., 3) points in [0, 1].

    Returns: (..., L*F).
    """
    # Vectorized over ALL levels at once: the naive per-level Python loop
    # builds levels x corners separate gather subgraphs (128 for the default
    # config) and compiles pathologically slowly under grad; this version
    # emits exactly 8 gathers from one flattened (L*T, F) table.
    res = jnp.asarray(hash_level_resolutions(cfg), x01.dtype)  # (L,)
    primes = jnp.asarray(_HASH_PRIMES)  # (3,) uint32
    t_size = cfg.hash_table_size
    levels = cfg.hash_levels
    flat_table = table.reshape(levels * t_size, cfg.hash_features)
    level_off = (jnp.arange(levels, dtype=jnp.uint32) * jnp.uint32(t_size))

    xs = x01[..., None, :] * res[:, None]  # (..., L, 3)
    x0 = jnp.floor(xs)
    frac = xs - x0  # (..., L, 3)
    x0i = x0.astype(jnp.int32)

    feats = 0.0
    for ci in range(8):
        c = jnp.asarray([(ci >> 2) & 1, (ci >> 1) & 1, ci & 1], jnp.int32)
        cc = (x0i + c).astype(jnp.uint32)  # (..., L, 3)
        h = cc * primes  # uint32 wraparound multiply (instant-NGP hash)
        idx = (h[..., 0] ^ h[..., 1] ^ h[..., 2]) % jnp.uint32(t_size)
        idx = (idx + level_off).astype(jnp.int32)  # (..., L)
        w = jnp.prod(
            jnp.where(c.astype(bool), frac, 1.0 - frac), axis=-1, keepdims=True
        )  # (..., L, 1)
        feats = feats + flat_table[idx] * w  # (..., L, F)
    return feats.reshape(feats.shape[:-2] + (levels * cfg.hash_features,))


def sdf_hash_forward(params, x: Array, cfg: SDFConfig) -> tuple[Array, Array]:
    """x in [-bound, bound]^3 -> (sdf, feat).

    The network predicts a residual on the analytic sphere SDF
    ``|x| - geometric_init_radius`` so the field starts as a true sphere.
    """
    x01 = jnp.clip((x / cfg.bound + 1.0) / 2.0, 0.0, 1.0)
    h = hash_encode(params["table"], x01, cfg)
    for lyr in params["mlp"][:-1]:
        h = jax.nn.relu(h @ lyr["w"] + lyr["b"])
    # Head split by WEIGHT slicing, not output-column slicing: the backward
    # of ``out[..., 0]`` (one-hot-column cotangent) fused with the 8-gather
    # hash encode SIGILLs this TPU toolchain's fusion cost model — slicing
    # w instead yields two plain matmuls and compiles fine.
    w, b = params["mlp"][-1]["w"], params["mlp"][-1]["b"]
    sdf = (h @ w[:, :1] + b[:1])[..., 0]
    feat = h @ w[:, 1:] + b[1:]
    sphere = jnp.linalg.norm(x, axis=-1) - cfg.geometric_init_radius
    return sdf + sphere, feat


# ---------------------------------------------------------------------------
# Color head + variance (shared)
# ---------------------------------------------------------------------------

def init_color_params(key: Array, cfg: SDFConfig) -> dict[str, Any]:
    in_dim = 3 + _pe_dim(3, cfg.dir_freqs) + 3 + cfg.feat_dim  # x, dir_pe, normal, feat
    dims = [in_dim] + [cfg.color_hidden] * (cfg.color_depth - 1) + [3]
    keys = jax.random.split(key, len(dims))
    layers = []
    for i in range(len(dims) - 1):
        std = np.sqrt(2.0 / dims[i])
        layers.append(
            {
                "w": std * jax.random.normal(keys[i], (dims[i], dims[i + 1])),
                "b": jnp.zeros((dims[i + 1],)),
            }
        )
    return {"layers": layers}


def color_forward(params, x, dirs, normals, feat, cfg: SDFConfig) -> Array:
    h = jnp.concatenate(
        [x, positional_encoding(dirs, cfg.dir_freqs), normals, feat], axis=-1
    )
    n = len(params["layers"])
    for i, lyr in enumerate(params["layers"]):
        h = h @ lyr["w"] + lyr["b"]
        if i + 1 < n:
            h = jax.nn.relu(h)
    return jax.nn.sigmoid(h)


def init_variance(init_val: float = 0.3) -> Array:
    """NeuS single global variance parameter; s = exp(10 * v)."""
    return jnp.asarray(init_val)


def inv_std(variance_param: Array) -> Array:
    return jnp.exp(10.0 * variance_param)


# ---------------------------------------------------------------------------
# Unified field bundle
# ---------------------------------------------------------------------------

def init_field_params(key: Array, cfg: SDFConfig) -> dict[str, Any]:
    k1, k2 = jax.random.split(key)
    if cfg.encoder == "hash":
        sdf = init_hash_params(k1, cfg)
    else:
        sdf = init_sdf_pe_params(k1, cfg)
    return {
        "sdf": sdf,
        "color": init_color_params(k2, cfg),
        "variance": init_variance(),
    }


def sdf_forward(params, x, cfg: SDFConfig):
    if cfg.encoder == "hash":
        return sdf_hash_forward(params["sdf"], x, cfg)
    return sdf_pe_forward(params["sdf"], x, cfg)


def sdf_only(params, x, cfg: SDFConfig) -> Array:
    return sdf_forward(params, x, cfg)[0]


def sdf_grad(params, x, cfg: SDFConfig) -> Array:
    """Spatial gradient of the SDF at points x (..., 3).

    Mode per cfg.grad_mode (see SDFConfig): "analytic" (vmapped reverse
    mode — best for the smooth PE MLP), "forward" (jacfwd over the 3 input
    dims — best for gather-encoders: the three tangent passes share ONE
    primal evaluation under CSE, so the table is gathered once, vs 6 extra
    gathered evaluations for central differences), or "numerical".
    """
    mode = cfg.grad_mode
    if mode == "auto":
        mode = "forward" if cfg.encoder == "hash" else "analytic"
    if mode == "analytic":
        flat = x.reshape(-1, 3)
        g = jax.vmap(jax.grad(lambda p: sdf_only(params, p, cfg)))(flat)
        return g.reshape(x.shape)
    if mode == "forward":
        flat = x.reshape(-1, 3)
        # linearize evaluates the primal (and its gathers) ONCE; each
        # tangent replay is gather-free (d(enc)/dx rides the saved corner
        # features times the trilerp-weight derivatives).
        _, lin = jax.linearize(lambda p: sdf_only(params, p, cfg), flat)
        basis = jnp.eye(3, dtype=x.dtype)
        g = jnp.stack(
            [lin(jnp.broadcast_to(basis[i], flat.shape)) for i in range(3)],
            axis=-1,
        )
        return g.reshape(x.shape)
    eps = cfg.grad_eps
    offsets = jnp.asarray(
        [[eps, 0, 0], [-eps, 0, 0], [0, eps, 0], [0, -eps, 0], [0, 0, eps], [0, 0, -eps]],
        x.dtype,
    )  # (6, 3)
    pts = x[..., None, :] + offsets  # (..., 6, 3)
    s, _ = sdf_forward(params, pts, cfg)  # (..., 6)
    return jnp.stack(
        [
            (s[..., 0] - s[..., 1]) / (2 * eps),
            (s[..., 2] - s[..., 3]) / (2 * eps),
            (s[..., 4] - s[..., 5]) / (2 * eps),
        ],
        axis=-1,
    )
