"""NeuS training loop: ray batching, losses, optax, orbax checkpointing.

Capability target (SURVEY.md §2.4): supervision follows the reference's
data convention (README.md:27-44) — RGB + SAM masks + StableNormal
monocular normals + DKM dense correspondences — with poses consumed from
the stage-1 npz files (run.py:171-179 schema).

TPU design: rays from ALL frames are sampled per step (jit-safe gathers
from stacked image tensors), the whole step (hierarchical render + losses
+ Adam) is one jit, and the ray axis is the shard axis for multi-chip
(parallel/mesh.py 'rays').
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .fields import SDFConfig, init_field_params, sdf_only
from .rendering import RenderConfig, Rays, rays_from_pose, render_rays

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    num_steps: int = 20000
    batch_rays: int = 1024
    lr: float = 5e-4
    warmup: int = 500
    lw_rgb: float = 1.0
    lw_mask: float = 0.1
    lw_eikonal: float = 0.1
    lw_normal: float = 0.1
    lw_corr: float = 0.0  # enabled when correspondences are provided
    # Anti-collapse regularizers.  Without them the mask BCE can remove the
    # init sphere by flipping the field negative along empty rays (no
    # decrease -> no alpha) instead of carving it — observed at ~5k steps.
    # Official NeuS samples Eikonal points uniformly in space (not just on
    # rays); the shell hinge pins the outside-positive sign convention at
    # the domain boundary (objects are normalized to |x| <= 0.5).
    n_eikonal_uniform: int = 256
    lw_shell: float = 0.1
    shell_radius: float = 0.85  # of rcfg.bound
    shell_margin: float = 0.05
    # inv_s is kept inside a scheduled band: exploding early enables
    # zero-crossing-free "thin dip" rendering (empty extraction), while
    # collapsing LOW lets a mushy field cheat the normal loss.  Both were
    # observed; the exponential band start -> end forces sharpening on
    # schedule.
    s_max_start: float = 30.0
    s_max_end: float = 512.0
    s_min_start: float = 15.0
    s_min_end: float = 150.0
    # Sign anchor: after normalization the object contains the origin, so
    # sdf(near-origin) must be negative; with the shell positive and the
    # Eikonal tying them together, a radial zero crossing must exist.
    lw_origin: float = 0.01
    origin_margin: float = 0.02
    # Occupancy-grid refresh period (rcfg.sampler == "occgrid"): the grid
    # is rebuilt from the current SDF off the hot step.
    occ_update_every: int = 250
    log_every: int = 500
    checkpoint_every: int = 5000
    seed: int = 0
    # lr multiplier for the explicit hash feature table; 1.0 leaves
    # pe-only configs untouched.
    grid_lr_mult: float = 20.0
    # StableNormal maps are OpenGL-convention camera normals (x right,
    # y up, z toward viewer); OpenCV cameras flip y/z.
    normal_flip_yz: bool = True


class ReconData(NamedTuple):
    """Stacked per-frame supervision (host-prepared, device-resident)."""

    images: Array  # (F, H, W, 3) float32 [0,1]
    masks: Array  # (F, H, W) float32 {0,1} object masks
    normals: Array | None  # (F, H, W, 3) camera-space unit normals or None
    R_rows: Array  # (F, 3, 3) object->camera row-convention rotations
    Ts: Array  # (F, 3)
    K: Array  # (3, 3)


class CorrData(NamedTuple):
    """Dense correspondences (DKM convention: pixel matches between frames)."""

    frame_i: Array  # (M,) int32
    frame_j: Array  # (M,) int32
    xy_i: Array  # (M, 2) pixel coords in frame_i
    xy_j: Array  # (M, 2) pixel coords in frame_j


def sample_ray_batch(key: Array, data: ReconData, n_rays: int):
    """Uniformly sample (frame, pixel) pairs over the full image.

    (Mask-bbox-biased sampling is a possible future optimization for small
    objects in large frames; uniform keeps the background/mask BCE balanced.)
    """
    f, h, w = data.masks.shape
    k1, k2, k3 = jax.random.split(key, 3)
    fr = jax.random.randint(k1, (n_rays,), 0, f)
    xi = jax.random.randint(k2, (n_rays,), 0, w)
    yi = jax.random.randint(k3, (n_rays,), 0, h)
    # Rays go through pixel centers (+0.5), matching the rasterizer and
    # ROIAlign conventions used elsewhere.
    xy = jnp.stack([xi + 0.5, yi + 0.5], axis=-1).astype(jnp.float32)
    rgb = data.images[fr, yi, xi]
    mask = data.masks[fr, yi, xi]
    nrm = None if data.normals is None else data.normals[fr, yi, xi]
    return fr, xy, rgb, mask, nrm


def _rays_for(data: ReconData, fr: Array, xy: Array, bound: float) -> Rays:
    def one(f_idx, p):
        return rays_from_pose(
            p[None], data.K, data.R_rows[f_idx], data.Ts[f_idx], bound
        )

    r = jax.vmap(one)(fr, xy)
    return Rays(
        r.origins[:, 0], r.dirs[:, 0], r.near[:, 0], r.far[:, 0]
    )


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    bg_color: Array  # learnable background color
    step: Array


def make_train_step(
    sdf_cfg: SDFConfig, rcfg: RenderConfig, tcfg: TrainConfig, opt,
    ray_sharding=None,
):
    """Build the jitted train step closure.

    ray_sharding: optional ``jax.sharding.Sharding`` pinned onto the
    sampled ray batch — data parallelism over rays (SURVEY.md §2.3): field
    params stay replicated, per-ray rendering shards across the mesh, and
    the loss means / param grads become XLA-inserted psums over ICI.
    Numerics are identical to the unsharded step (same key, same batch).
    """

    def loss_fn(params, bg, key, data: ReconData, corr: CorrData | None, occ):
        k_pix, k_render, k_corr, k_eik, k_shell = jax.random.split(key, 5)
        fr, xy, rgb_gt, mask_gt, nrm_gt = sample_ray_batch(k_pix, data, tcfg.batch_rays)
        if ray_sharding is not None:
            con = lambda a: jax.lax.with_sharding_constraint(a, ray_sharding)
            fr, xy, rgb_gt, mask_gt = con(fr), con(xy), con(rgb_gt), con(mask_gt)
            if nrm_gt is not None:
                nrm_gt = con(nrm_gt)
        rays = _rays_for(data, fr, xy, rcfg.bound)
        out = render_rays(params, sdf_cfg, rcfg, rays, k_render, occ)

        rgb_pred = out.rgb + (1.0 - out.acc[:, None]) * jax.nn.sigmoid(bg)
        l_rgb = jnp.abs(rgb_pred - rgb_gt).mean()
        acc = jnp.clip(out.acc, 1e-4, 1.0 - 1e-4)
        l_mask = -(
            mask_gt * jnp.log(acc) + (1.0 - mask_gt) * jnp.log(1.0 - acc)
        ).mean()
        # Uniform-space Eikonal (see TrainConfig note on field collapse).
        from .fields import sdf_forward, sdf_grad

        eik = out.eikonal
        if tcfg.n_eikonal_uniform > 0:
            pts_u = rcfg.bound * jax.random.uniform(
                k_eik, (tcfg.n_eikonal_uniform, 3), minval=-1.0, maxval=1.0
            )
            from .rendering import safe_norm

            g_u = sdf_grad(params, pts_u, sdf_cfg)
            eik = 0.5 * (
                eik + jnp.mean((safe_norm(g_u)[..., 0] - 1.0) ** 2)
            )
        loss = tcfg.lw_rgb * l_rgb + tcfg.lw_mask * l_mask + tcfg.lw_eikonal * eik
        logs = {"rgb": l_rgb, "mask": l_mask, "eikonal": eik, "inv_s": out.inv_s}

        if tcfg.lw_shell > 0:
            k_dir, k_rad = jax.random.split(k_shell)
            d = jax.random.normal(k_dir, (128, 3))
            d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-9)
            r = rcfg.bound * jax.random.uniform(
                k_rad, (128, 1), minval=tcfg.shell_radius, maxval=1.0
            )
            s_shell, _ = sdf_forward(params, d * r, sdf_cfg)
            l_shell = jax.nn.relu(tcfg.shell_margin - s_shell).mean()
            loss = loss + tcfg.lw_shell * l_shell
            logs["shell"] = l_shell
        if tcfg.lw_origin > 0:
            pts_o = 0.05 * jax.random.normal(jax.random.fold_in(k_shell, 1), (16, 3))
            s_o, _ = sdf_forward(params, pts_o, sdf_cfg)
            loss = loss + tcfg.lw_origin * jax.nn.relu(s_o + tcfg.origin_margin).mean()

        if nrm_gt is not None and tcfg.lw_normal > 0:
            n_cam = jnp.einsum("nj,njk->nk", out.normal, data.R_rows[fr])
            if tcfg.normal_flip_yz:
                nrm_ref = nrm_gt * jnp.array([1.0, -1.0, -1.0])
            else:
                nrm_ref = nrm_gt
            # Smooth normalization with a LARGE eps: |n_pred| -> 0 early
            # in training (acc ~ 0); see rendering.safe_normalize.
            from .rendering import safe_normalize

            n_hat = safe_normalize(n_cam, eps=0.1)
            r_hat = safe_normalize(nrm_ref, eps=0.1)
            cos = jnp.sum(n_hat * r_hat, axis=-1)
            l_normal = ((1.0 - cos) * mask_gt).sum() / (mask_gt.sum() + 1e-6)
            loss = loss + tcfg.lw_normal * l_normal
            logs["normal"] = l_normal

        if corr is not None and tcfg.lw_corr > 0:
            m = corr.frame_i.shape[0]
            take = min(256, m)
            idx = jax.random.randint(k_corr, (take,), 0, m)
            fi, fj = corr.frame_i[idx], corr.frame_j[idx]
            rays_i = _rays_for(data, fi, corr.xy_i[idx], rcfg.bound)
            out_i = render_rays(params, sdf_cfg, rcfg, rays_i, None, occ)
            # Project frame-i surface points into frame j.  Points must be
            # well in front of camera j — a generous z floor keeps the 1/z
            # gradient bounded (a tiny eps here NaN'd training).
            pts_cam_j = (
                jnp.einsum("nj,njk->nk", out_i.points, data.R_rows[fj]) + data.Ts[fj]
            )
            z_j = pts_cam_j[:, 2:]
            uv = jnp.einsum("ij,nj->ni", data.K, pts_cam_j)
            uv = uv[:, :2] / jnp.maximum(z_j, 0.1)
            scale = jnp.float32(max(data.masks.shape[1], data.masks.shape[2]))
            conf = jax.lax.stop_gradient(
                ((out_i.acc > 0.5) & (z_j[:, 0] > 0.1)).astype(jnp.float32)
            )
            resid = (uv - corr.xy_j[idx]) / scale * conf[:, None]
            per_ray = optax.huber_loss(resid, delta=0.01).mean(axis=-1)
            l_corr = per_ray.sum() / (conf.sum() + 1e-6)
            loss = loss + tcfg.lw_corr * l_corr
            logs["corr"] = l_corr

        psnr = -10.0 * jnp.log10(jnp.mean((rgb_pred - rgb_gt) ** 2) + 1e-8)
        logs["psnr"] = psnr
        logs["loss"] = loss
        return loss, logs

    @jax.jit
    def train_step(state: TrainState, key, data: ReconData, corr, occ=None):
        (loss, logs), grads = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
            state.params, state.bg_color, key, data, corr, occ
        )
        g_params, g_bg = grads
        updates, opt_state = opt.update(g_params, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        # inv_s scheduled band (see TrainConfig).
        frac = jnp.clip(state.step.astype(jnp.float32) / max(tcfg.num_steps, 1), 0, 1)
        s_max = tcfg.s_max_start * (tcfg.s_max_end / tcfg.s_max_start) ** frac
        s_min = tcfg.s_min_start * (tcfg.s_min_end / tcfg.s_min_start) ** frac
        params = dict(params)
        params["variance"] = jnp.clip(
            params["variance"], jnp.log(s_min) / 10.0, jnp.log(s_max) / 10.0
        )
        bg = state.bg_color - 1e-2 * g_bg
        return TrainState(params, opt_state, bg, state.step + 1), logs

    return train_step


def init_train_state(key: Array, sdf_cfg: SDFConfig, tcfg: TrainConfig, opt):
    params = init_field_params(key, sdf_cfg)
    return TrainState(
        params=params,
        opt_state=opt.init(params),
        bg_color=jnp.zeros((3,)),
        step=jnp.asarray(0),
    )


def make_optimizer(tcfg: TrainConfig):
    sched = optax.warmup_cosine_decay_schedule(
        0.0, tcfg.lr, tcfg.warmup, max(tcfg.num_steps, tcfg.warmup + 1)
    )
    sched_grid = optax.warmup_cosine_decay_schedule(
        0.0, tcfg.lr * tcfg.grid_lr_mult, tcfg.warmup,
        max(tcfg.num_steps, tcfg.warmup + 1),
    )
    # Global-norm clipping: rare gradient spikes (raster edge cases, the
    # normal loss near grazing surfaces) can kick the field into the
    # no-zero-crossing basin mid-training (observed: psnr 32 -> collapse
    # between steps 1k-2k on a seed change).
    # The explicit hash feature table gets a higher lr than the MLPs
    # (instant-NGP practice — each grid cell sees few gradient updates, so
    # per-cell steps must be larger).

    def label(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: "grid"
            if any(getattr(k, "key", None) == "table" for k in path)
            else "net",
            params,
        )

    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.multi_transform(
            {"net": optax.adam(sched), "grid": optax.adam(sched_grid)}, label
        ),
    )


def train(
    data: ReconData,
    sdf_cfg: SDFConfig = SDFConfig(),
    rcfg: RenderConfig = RenderConfig(),
    tcfg: TrainConfig = TrainConfig(),
    corr: CorrData | None = None,
    board=None,
    checkpoint_dir: str | None = None,
    resume: bool = True,
):
    """Full training loop; returns (state, history)."""
    opt = make_optimizer(tcfg)
    key = jax.random.PRNGKey(tcfg.seed)
    state = init_train_state(key, sdf_cfg, tcfg, opt)
    start = 0
    if checkpoint_dir and resume:
        restored = restore_checkpoint(checkpoint_dir, state)
        if restored is not None:
            state = restored
            start = int(state.step)
    step_fn = make_train_step(sdf_cfg, rcfg, tcfg, opt)
    history: dict[str, list] = {}
    occ = None
    occ_fn = None
    if rcfg.sampler == "occgrid":
        from .rendering import occupancy_from_sdf

        occ_fn = jax.jit(lambda p: occupancy_from_sdf(p, sdf_cfg, rcfg))
        occ = occ_fn(state.params)
    for i in range(start, tcfg.num_steps):
        if occ_fn is not None and i % max(tcfg.occ_update_every, 1) == 0 and i > start:
            occ = occ_fn(state.params)
        state, logs = step_fn(state, jax.random.fold_in(key, i), data, corr, occ)
        if (i + 1) % tcfg.log_every == 0 or i == start:
            logs = {k: float(v) for k, v in logs.items()}
            for k, v in logs.items():
                history.setdefault(k, []).append(v)
                if board is not None:
                    board.add_scalar(f"neus/{k}", v, i)
            print(
                f"[neus] step {i + 1}/{tcfg.num_steps} "
                + " ".join(f"{k}={v:.4f}" for k, v in sorted(logs.items())),
                flush=True,
            )
        if checkpoint_dir and (i + 1) % tcfg.checkpoint_every == 0:
            save_checkpoint(checkpoint_dir, state)
    if checkpoint_dir:
        save_checkpoint(checkpoint_dir, state)
    return state, history


# ---------------------------------------------------------------------------
# Orbax checkpointing (SURVEY.md §5: add checkpoints for the long NeuS stage)
# ---------------------------------------------------------------------------

def save_checkpoint(ckpt_dir: str, state: TrainState) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{int(state.step)}"))
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, jax.tree.map(np.asarray, state), force=True)


def restore_checkpoint(ckpt_dir: str, template: TrainState) -> TrainState | None:
    import orbax.checkpoint as ocp

    if not os.path.isdir(ckpt_dir):
        return None
    steps = [
        int(d.split("_")[1])
        for d in os.listdir(ckpt_dir)
        if d.startswith("step_") and d.split("_")[1].isdigit()
    ]
    if not steps:
        return None
    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{max(steps)}"))
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path, item=jax.tree.map(np.asarray, template))
    return jax.tree.map(jnp.asarray, TrainState(*restored))
