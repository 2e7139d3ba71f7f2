"""Stage-level timing of the fused raster forward: binning vs row packing/
gather vs the Pallas kernel itself (guides kernel optimization — the 8-frame
fwd measured 46.7 ms after the one-hop bary change; what's left?)."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

FRAMES = 8
S = 256
CAP = 1792


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000.0


def main():
    from dynhor_tpu.ops import rasterize as rz
    from dynhor_tpu.ops.rasterize_tiled import bin_faces
    from dynhor_tpu.ops import raster_pallas as RP
    from dynhor_tpu.utils import geometry as G
    from dynhor_tpu.utils.objio import load_obj

    m = load_obj("assets/shoes/1229a2e6e97e_A_basketball_shoes_.obj")
    verts = G.center_and_normalize_verts(jnp.asarray(m.verts))
    faces = jnp.asarray(m.faces)
    K = jnp.array([[S * 1.2, 0, S / 2], [0, S * 1.2, S / 2], [0, 0, 1.0]])
    rot = G.random_rotations(jax.random.PRNGKey(0), FRAMES)
    trans = jnp.tile(jnp.array([[0.0, 0.0, 2.0]]), (FRAMES, 1))
    vp = jax.jit(
        jax.vmap(lambda R, t: rz.project_perspective(verts @ R + t, K))
    )(rot, trans)

    sigma = 0.25
    margin = 6.0 * sigma + 1.0

    def bins_only(vp_):
        b = jax.vmap(
            lambda v: bin_faces(v, faces, (S, S), 16, CAP, margin)
        )(vp_)
        return b.indices.sum() + b.valid.sum()

    print(f"bin_faces x{FRAMES}:            {timeit(jax.jit(bins_only), vp):8.2f} ms")

    def pack_and_gather(vp_):
        def one(v):
            bins = bin_faces(v, faces, (S, S), 16, CAP, margin)
            t_total, mm = bins.indices.shape
            fv_all = v[faces]
            zero_f = jnp.zeros((faces.shape[0],), v.dtype)
            z_ok = (fv_all[..., 2] > 1e-2).any(axis=-1)
            rows_all = jnp.stack(
                [fv_all[:, 0, 0], fv_all[:, 0, 1], fv_all[:, 1, 0], fv_all[:, 1, 1],
                 fv_all[:, 2, 0], fv_all[:, 2, 1], z_ok.astype(v.dtype), zero_f,
                 fv_all[:, 0, 2], fv_all[:, 1, 2], fv_all[:, 2, 2],
                 zero_f, zero_f, zero_f, zero_f, zero_f], axis=-1)
            rows = rows_all[bins.indices.reshape(-1)].reshape(t_total, mm, 16)
            return jnp.swapaxes(rows, 1, 2).sum()
        return jax.vmap(one)(vp_).sum()

    print(f"bins+pack+gather x{FRAMES}:     {timeit(jax.jit(pack_and_gather), vp):8.2f} ms")

    def fused_fwd(vp_):
        frag, sil, _ = jax.vmap(
            lambda v: RP.rasterize_silhouette_pallas(
                v, faces, (S, S), max_faces=CAP
            )
        )(vp_)
        return sil.sum() + frag.zbuf.sum()

    print(f"fused fwd (no bary) x{FRAMES}:  {timeit(jax.jit(fused_fwd), vp):8.2f} ms")

    def fused_fwd_bary(vp_):
        frag, sil, _ = jax.vmap(
            lambda v: RP.rasterize_silhouette_pallas(
                v, faces, (S, S), max_faces=CAP
            )
        )(vp_)
        return sil.sum() + frag.bary.sum()

    print(f"fused fwd (+bary) x{FRAMES}:    {timeit(jax.jit(fused_fwd_bary), vp):8.2f} ms")

    g = jax.jit(jax.grad(fused_fwd_bary))
    print(f"fused f+b x{FRAMES}:            {timeit(g, vp):8.2f} ms")




def probe_bwd():
    """Isolate the backward pieces: analytic bwd kernel vs gather transpose."""
    from dynhor_tpu.ops import rasterize as rz
    from dynhor_tpu.ops.rasterize_tiled import bin_faces
    from dynhor_tpu.ops import raster_pallas as RP
    from dynhor_tpu.utils import geometry as G
    from dynhor_tpu.utils.objio import load_obj

    m_ = load_obj("assets/shoes/1229a2e6e97e_A_basketball_shoes_.obj")
    verts = G.center_and_normalize_verts(jnp.asarray(m_.verts))
    faces = jnp.asarray(m_.faces)
    K = jnp.array([[S * 1.2, 0, S / 2], [0, S * 1.2, S / 2], [0, 0, 1.0]])
    rot = G.random_rotations(jax.random.PRNGKey(0), FRAMES)
    trans = jnp.tile(jnp.array([[0.0, 0.0, 2.0]]), (FRAMES, 1))
    vp = jax.jit(
        jax.vmap(lambda R, t: rz.project_perspective(verts @ R + t, K))
    )(rot, trans)
    sigma = 0.25
    margin = 6.0 * sigma + 1.0

    def build(v):
        bins = bin_faces(v, faces, (S, S), 16, CAP, margin)
        t_total, mm = bins.indices.shape
        fv_all = v[faces]
        zero_f = jnp.zeros((faces.shape[0],), v.dtype)
        z_ok = (fv_all[..., 2] > 1e-2).any(axis=-1)
        rows_all = jnp.stack(
            [fv_all[:, 0, 0], fv_all[:, 0, 1], fv_all[:, 1, 0], fv_all[:, 1, 1],
             fv_all[:, 2, 0], fv_all[:, 2, 1], z_ok.astype(v.dtype), zero_f,
             fv_all[:, 0, 2], fv_all[:, 1, 2], fv_all[:, 2, 2],
             zero_f, zero_f, zero_f, zero_f, zero_f], axis=-1)
        rows = rows_all[bins.indices.reshape(-1)].reshape(t_total, mm, 16)
        rows = jnp.swapaxes(rows, 1, 2)
        counts = bins.valid.sum(axis=1).astype(jnp.int32)
        pad_t = (-t_total) % 8
        if pad_t:
            rows = jnp.concatenate([rows, jnp.zeros((pad_t,) + rows.shape[1:])], 0)
            counts = jnp.concatenate([counts, jnp.zeros((pad_t,), jnp.int32)])
        return rows, counts

    rows8, counts8 = jax.jit(jax.vmap(build))(vp)
    tw = -(-S // 16)

    # (a) kernel f+b with PRE-GATHERED rows (no gather/scatter in the grad).
    def kern_loss(rows_):
        mass, _, _ = jax.vmap(
            lambda r, c: RP._fused_tiles(r, c, 16, tw, sigma, "linear", 1e-2)
        )(rows_, counts8)
        return mass.sum()

    print(f"kernel-only fwd x{FRAMES}:      {timeit(jax.jit(kern_loss), rows8):8.2f} ms")
    print(f"kernel-only f+b x{FRAMES}:      {timeit(jax.jit(jax.grad(kern_loss)), rows8):8.2f} ms")

    # (b) gather + its scatter transpose alone.
    def gather_loss(v):
        def one(vv):
            bins = bin_faces(vv, faces, (S, S), 16, CAP, margin)
            t_total, mm = bins.indices.shape
            fv_all = vv[faces]
            zero_f = jnp.zeros((faces.shape[0],), vv.dtype)
            rows_all = jnp.stack(
                [fv_all[:, 0, 0], fv_all[:, 0, 1], fv_all[:, 1, 0], fv_all[:, 1, 1],
                 fv_all[:, 2, 0], fv_all[:, 2, 1], zero_f, zero_f,
                 zero_f, zero_f, zero_f,
                 zero_f, zero_f, zero_f, zero_f, zero_f], axis=-1)
            rows = rows_all[bins.indices.reshape(-1)].reshape(t_total, mm, 16)
            return (rows * rows).sum()
        return jax.vmap(one)(v).sum()

    print(f"gather-only fwd x{FRAMES}:      {timeit(jax.jit(gather_loss), vp):8.2f} ms")
    print(f"gather+scatter f+b x{FRAMES}:   {timeit(jax.jit(jax.grad(gather_loss)), vp):8.2f} ms")


if __name__ == "__main__":
    if "--bwd" in sys.argv:
        probe_bwd()
    else:
        main()
