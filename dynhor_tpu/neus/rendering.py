"""NeuS volume rendering: ray generation, hierarchical sampling, compositing.

Designed from the published NeuS recipe (Wang et al., NeurIPS 2021 — see
PAPERS.md); the reference's own reconstruction stage is unreleased
(SURVEY.md §2.4).  All sampling is statically shaped: fixed coarse count,
fixed importance rounds, sorts instead of data-dependent control flow —
one jit for the whole render.

Ray/space conventions: fields live in the OBJECT (canonical, normalized)
frame; stage-1 poses give X_cam = X_obj @ R_row + T, so camera centers are
``-T @ R_row^T`` and directions rotate by ``R_row^T``.
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from .fields import SDFConfig, color_forward, inv_std, sdf_forward, sdf_grad

Array = jax.Array


def safe_norm(x: Array, eps: float = 1e-6) -> Array:
    """sqrt(sum(x^2) + eps^2): smooth at x=0.  ``norm`` + ``maximum`` is NOT
    enough — d|x|/dx is NaN at exactly 0 and ``NaN * 0`` poisons the VJP."""
    return jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True) + eps * eps)


def safe_normalize(x: Array, eps: float = 1e-6) -> Array:
    return x / safe_norm(x, eps)


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    n_coarse: int = 64
    n_importance: int = 64
    up_sample_steps: int = 4  # importance split into this many rounds
    near: float = 0.05
    far: float = 4.0
    bound: float = 1.0  # object sphere radius for ray-sphere clipping
    perturb: bool = True
    s_base: float = 64.0  # up-sample fixed inv-std ladder (64 * 2^k)
    # Sampler: "neus" = classic 4-round hierarchical up-sampling (evaluates
    # the field at ~350 extra points/ray); "occgrid" = instant-nsr-pl-class
    # fast path — importance-sample against a periodically refreshed
    # occupancy grid (1 tiny gather per candidate, ~6x fewer field
    # evaluations per ray; see occupancy_from_sdf).
    sampler: str = "neus"
    n_candidates: int = 192  # occgrid: uniform probe points per ray
    n_occ_samples: int = 64  # occgrid: final section count per ray
    occ_res: int = 64  # occupancy grid resolution per axis
    # Transmittance "early exit", TPU-shaped: alpha/acc come from the SDF at
    # every section, but the gradient + color MLPs (the two most expensive
    # per-section evaluations, and the only second-order autodiff in the
    # step) run only at the n_shade sections with the largest composite
    # weight per ray — a static-shape top-k compaction instead of CUDA-style
    # per-ray loop breaks.  Selected weights are renormalized to the full
    # weight sum so the dropped tail does not darken the render.  0 = dense.
    # Measured (BASELINE.md round 5): 16 -> 45.7K rays/s (dense 30.5K) at
    # equal-or-better PSNR/Chamfer on the 12-view shoes recon.
    n_shade: int = 16


class Rays(NamedTuple):
    origins: Array  # (N, 3) object-frame
    dirs: Array  # (N, 3) unit
    near: Array  # (N,)
    far: Array  # (N,)


def rays_from_pose(
    pixels_xy: Array, K: Array, R_row: Array, T: Array, bound: float = 1.0
) -> Rays:
    """Build object-frame rays through pixel centers.

    Args:
      pixels_xy: (N, 2) pixel coords (x, y).
      K: (3, 3) intrinsics.
      R_row, T: object->camera row-convention pose (X_cam = X_obj @ R + T).
      bound: object bounding-sphere radius for near/far from ray-sphere hit.
    """
    x = (pixels_xy[:, 0] - K[0, 2]) / K[0, 0]
    y = (pixels_xy[:, 1] - K[1, 2]) / K[1, 1]
    d_cam = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    d_obj = d_cam @ R_row.T  # rotate camera->object (row conv inverse)
    d_obj = d_obj / jnp.linalg.norm(d_obj, axis=-1, keepdims=True)
    o_obj = jnp.broadcast_to(-T @ R_row.T, d_obj.shape)
    # Ray-sphere intersection for tight near/far (sphere radius = bound).
    b = jnp.sum(o_obj * d_obj, axis=-1)
    c = jnp.sum(o_obj * o_obj, axis=-1) - bound * bound
    disc = jnp.maximum(b * b - c, 0.0)
    sq = jnp.sqrt(disc)
    near = jnp.maximum(-b - sq, 1e-3)
    far = jnp.maximum(-b + sq, near + 1e-3)
    return Rays(o_obj, d_obj, near, far)


def sample_pdf(bins: Array, weights: Array, n_samples: int, key: Array | None) -> Array:
    """Inverse-CDF sampling of ``n_samples`` new points from a piecewise-
    constant pdf over ``bins`` (NeRF sample_pdf, deterministic if key None).

    Args:
      bins: (..., B+1) bin edges.  weights: (..., B).
    """
    w = weights + 1e-5
    pdf = w / jnp.sum(w, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # (..., B+1)
    if key is None:
        u = (jnp.arange(n_samples) + 0.5) / n_samples
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_samples,))
    else:
        u = jax.random.uniform(key, cdf.shape[:-1] + (n_samples,))
    idx = jnp.searchsorted(cdf, u, side="right") if cdf.ndim == 1 else jax.vmap(
        lambda c, uu: jnp.searchsorted(c, uu, side="right")
    )(cdf.reshape(-1, cdf.shape[-1]), u.reshape(-1, n_samples)).reshape(u.shape)
    below = jnp.clip(idx - 1, 0, bins.shape[-1] - 1)
    above = jnp.clip(idx, 0, bins.shape[-1] - 1)
    cdf_b = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_a = jnp.take_along_axis(cdf, above, axis=-1)
    bin_b = jnp.take_along_axis(bins, below, axis=-1)
    bin_a = jnp.take_along_axis(bins, above, axis=-1)
    denom = jnp.where(cdf_a - cdf_b < 1e-5, 1.0, cdf_a - cdf_b)
    t = (u - cdf_b) / denom
    return bin_b + t * (bin_a - bin_b)


def _neus_alpha(sdf: Array, dists: Array, s: Array) -> Array:
    """NeuS alpha from consecutive section SDFs.

    alpha_i = clip((Phi_s(f_i) - Phi_s(f_{i+1})) / Phi_s(f_i), 0, 1)
    where Phi_s is the logistic CDF with inverse std s.

    Args:
      sdf: (..., M) SDF at section points; dists unused but kept for parity.
    """
    prev_cdf = jax.nn.sigmoid(s * sdf[..., :-1])
    next_cdf = jax.nn.sigmoid(s * sdf[..., 1:])
    alpha = (prev_cdf - next_cdf) / (prev_cdf + 1e-5)
    return jnp.clip(alpha, 0.0, 1.0)


def up_sample(
    params, cfg: SDFConfig, rays: Rays, t: Array, sdf: Array, n_new: int,
    s_fixed: float, key: Array | None,
) -> tuple[Array, Array]:
    """One NeuS importance round: weights from a FIXED inv-std ladder, then
    inverse-CDF sampling; returns merged, sorted (t, sdf) values.

    SDF values are threaded THROUGH the rounds: each round evaluates the
    field only at its n_new fresh points and merge-sorts them into the
    carried (t, sdf) set, instead of re-evaluating every point every round
    (4-round default: 64+16x4 = 128 evals instead of 64+80+96+112 = 352).
    """
    alpha = _neus_alpha(sdf, None, s_fixed)
    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-7], axis=-1),
        axis=-1,
    )[..., :-1]
    weights = alpha * trans
    t_new = sample_pdf(t, weights, n_new, key)
    # Importance-sampled locations are treated as CONSTANT sample positions
    # (official NeuS detaches new_z_vals): gradients flow through the field
    # values AT the samples, not through where the sampler placed them.
    # Also removes 4 rounds of SDF evals from the backward graph (and a
    # fusion that SIGILLs this TPU toolchain on the hash path).
    t_new = jax.lax.stop_gradient(t_new)
    pts_new = rays.origins[:, None, :] + t_new[..., None] * rays.dirs[:, None, :]
    sdf_new, _ = sdf_forward(params, pts_new, cfg)
    t_all = jnp.concatenate([t, t_new], axis=-1)
    sdf_all = jnp.concatenate([sdf, jax.lax.stop_gradient(sdf_new)], axis=-1)
    order = jnp.argsort(t_all, axis=-1)
    return (
        jnp.take_along_axis(t_all, order, axis=-1),
        jnp.take_along_axis(sdf_all, order, axis=-1),
    )


def occupancy_from_sdf(
    params, sdf_cfg: SDFConfig, rcfg: RenderConfig, tau_scale: float = 2.0
) -> Array:
    """Binary occupancy grid from the current SDF (periodic, off the hot
    step): cell occupied iff |sdf(center)| < tau (tau = tau_scale x cell
    diagonal), dilated by one cell so surfaces never fall between samples.

    Returns (R^3,) float32 flat grid over [-bound, bound]^3.
    """
    r = rcfg.occ_res
    b = rcfg.bound
    centers = (jnp.arange(r) + 0.5) / r * (2 * b) - b
    gx, gy, gz = jnp.meshgrid(centers, centers, centers, indexing="ij")
    pts = jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3)  # (R^3, 3)
    sdf, _ = sdf_forward(params, pts, sdf_cfg)
    cell = 2.0 * b / r
    occ = (jnp.abs(sdf) < tau_scale * cell * jnp.sqrt(3.0)).astype(jnp.float32)
    occ3 = occ.reshape(r, r, r)
    # 3^3 max-pool dilation via three axis rolls.
    for ax in range(3):
        occ3 = jnp.maximum(
            occ3,
            jnp.maximum(jnp.roll(occ3, 1, axis=ax), jnp.roll(occ3, -1, axis=ax)),
        )
    return occ3.reshape(-1)


def _occ_lookup(occ_flat: Array, pts: Array, rcfg: RenderConfig) -> Array:
    """Occupancy at points (..., 3) — ONE tiny gather per point."""
    r = rcfg.occ_res
    b = rcfg.bound
    ijk = jnp.clip(((pts + b) / (2 * b) * r).astype(jnp.int32), 0, r - 1)
    idx = (ijk[..., 0] * r + ijk[..., 1]) * r + ijk[..., 2]
    return occ_flat[idx]


class RenderOut(NamedTuple):
    rgb: Array  # (N, 3)
    depth: Array  # (N,)
    acc: Array  # (N,) weight sum (opacity)
    normal: Array  # (N, 3) rendered object-frame normal
    eikonal: Array  # () mean (|grad|-1)^2 over sampled points
    inv_s: Array  # () current inv-std
    points: Array  # (N, 3) expected surface point (for correspondence loss)


def render_rays(
    params: dict[str, Any],
    sdf_cfg: SDFConfig,
    rcfg: RenderConfig,
    rays: Rays,
    key: Array | None = None,
    occ: Array | None = None,
) -> RenderOut:
    """Full NeuS render of a ray batch (statically shaped, one jit).

    Args:
      occ: flat occupancy grid (occupancy_from_sdf) — required when
        rcfg.sampler == "occgrid".
    """
    n = rays.origins.shape[0]
    k_strat, k_imp = (None, None) if key is None else tuple(jax.random.split(key))

    if rcfg.sampler == "occgrid":
        if occ is None:
            raise ValueError("occgrid sampler needs an occupancy grid")
        # Uniform candidates -> occupancy-weighted inverse-CDF resampling:
        # sections concentrate where the surface can be, at the cost of one
        # 1-float gather per candidate instead of extra field evaluations.
        u = jnp.linspace(0.0, 1.0, rcfg.n_candidates)
        tc = rays.near[:, None] + (rays.far - rays.near)[:, None] * u[None, :]
        mid_c = 0.5 * (tc[..., 1:] + tc[..., :-1])
        pts_c = rays.origins[:, None, :] + mid_c[..., None] * rays.dirs[:, None, :]
        w_occ = _occ_lookup(occ, pts_c, rcfg) + 1e-3  # keep a floor: empty
        # rays still need samples for the mask/background terms
        t = sample_pdf(tc, w_occ, rcfg.n_occ_samples, k_strat)
        t = jax.lax.stop_gradient(jnp.sort(t, axis=-1))
    else:
        # Stratified coarse samples in [near, far].
        u = jnp.linspace(0.0, 1.0, rcfg.n_coarse)
        t = rays.near[:, None] + (rays.far - rays.near)[:, None] * u[None, :]
        if rcfg.perturb and k_strat is not None:
            mids = 0.5 * (t[..., 1:] + t[..., :-1])
            upper = jnp.concatenate([mids, t[..., -1:]], axis=-1)
            lower = jnp.concatenate([t[..., :1], mids], axis=-1)
            t = lower + (upper - lower) * jax.random.uniform(k_strat, t.shape)

        # Hierarchical importance rounds with doubling fixed inv-std; the
        # coarse SDF is evaluated once and threaded through the rounds
        # (each round adds only its fresh points — see up_sample).
        if rcfg.up_sample_steps > 0 and rcfg.n_importance > 0:
            pts_c = (
                rays.origins[:, None, :] + t[..., None] * rays.dirs[:, None, :]
            )
            sdf_c = jax.lax.stop_gradient(sdf_forward(params, pts_c, sdf_cfg)[0])
            n_per = rcfg.n_importance // max(rcfg.up_sample_steps, 1)
            for i in range(rcfg.up_sample_steps):
                kk = None if k_imp is None else jax.random.fold_in(k_imp, i)
                t, sdf_c = up_sample(
                    params, sdf_cfg, rays, t, sdf_c, n_per,
                    rcfg.s_base * (2**i), kk,
                )
            t = jax.lax.stop_gradient(t)

    # Section compositing at the final t set.
    pts = rays.origins[:, None, :] + t[..., None] * rays.dirs[:, None, :]
    sdf, feat = sdf_forward(params, pts, sdf_cfg)
    s = inv_std(params["variance"])
    alpha = _neus_alpha(sdf, None, s)  # (N, M-1)
    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-7], axis=-1),
        axis=-1,
    )[..., :-1]
    weights = alpha * trans  # (N, M-1)

    mid_t = 0.5 * (t[..., 1:] + t[..., :-1])
    mid_feat = 0.5 * (feat[..., 1:, :] + feat[..., :-1, :])
    depth = jnp.sum(weights * mid_t, axis=-1)
    acc = jnp.sum(weights, axis=-1)

    n_sec = weights.shape[-1]
    w_shade = weights
    if 0 < rcfg.n_shade < n_sec:
        # Transmittance early exit (see RenderConfig.n_shade): gradient +
        # color MLPs only at the top-k weighted sections.  Indices are
        # data-dependent but constant w.r.t. autodiff (selection is not
        # differentiated, like the sampler's stop_gradient'd positions).
        _, sel = jax.lax.top_k(jax.lax.stop_gradient(weights), rcfg.n_shade)
        w_sel = jnp.take_along_axis(weights, sel, axis=-1)  # (N, k)
        # Renormalize so the selected mass composites to the full acc —
        # keeps early training (diffuse weights) unbiased instead of dark.
        scale = jnp.sum(weights, axis=-1, keepdims=True) / jnp.maximum(
            jnp.sum(w_sel, axis=-1, keepdims=True), 1e-6
        )
        w_shade = w_sel * scale
        mid_t = jnp.take_along_axis(mid_t, sel, axis=-1)
        mid_feat = jnp.take_along_axis(mid_feat, sel[..., None], axis=-2)

    mid_pts = rays.origins[:, None, :] + mid_t[..., None] * rays.dirs[:, None, :]
    grads = sdf_grad(params, mid_pts, sdf_cfg)  # (N, K, 3)
    # Smooth normalization (see safe_normalize): generous eps because the
    # 1/|grad| backward on plateau samples otherwise dominates/NaNs the
    # normal-supervised gradient.
    normals = safe_normalize(grads, eps=0.05)
    dirs = jnp.broadcast_to(rays.dirs[:, None, :], mid_pts.shape)
    rgb_samples = color_forward(
        params["color"], mid_pts, dirs, normals, mid_feat, sdf_cfg
    )

    rgb = jnp.sum(w_shade[..., None] * rgb_samples, axis=-2)
    normal = jnp.sum(w_shade[..., None] * normals, axis=-2)
    surf = rays.origins + depth[..., None] * rays.dirs
    eik = jnp.mean((safe_norm(grads)[..., 0] - 1.0) ** 2)
    return RenderOut(rgb, depth, acc, normal, eik, s, surf)
