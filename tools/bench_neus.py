#!/usr/bin/env python
"""NeuS training throughput: rays/sec/chip for the PE and hash encoders.

This is the BASELINE.json metric ("NeuS rays/sec/chip") — a full training
step (render fwd + all losses + bwd + Adam), synthetic supervision, steady
state.  Run on the TPU:

    python tools/bench_neus.py [--encoders pe hash] [--batches 1024 4096]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def synthetic_data(frames=4, h=128, w=128):
    from dynhor_tpu.neus.trainer import ReconData
    from dynhor_tpu.utils import geometry as G

    key = jax.random.PRNGKey(0)
    R = G.random_rotations(key, frames)
    Ts = jnp.tile(jnp.array([[0.0, 0.0, 1.6]]), (frames, 1))
    f = 1.2 * min(h, w)
    K = jnp.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1.0]], jnp.float32)
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (frames, h, w, 3))
    masks = jnp.ones((frames, h, w))
    return ReconData(
        images=imgs, masks=masks, normals=None, R_rows=R, Ts=Ts, K=K,
    )


def bench_encoder(encoder: str, batches, steps=20, table_size=None, sampler="neus", n_shade=16):
    from dynhor_tpu.neus.fields import SDFConfig
    from dynhor_tpu.neus.rendering import RenderConfig, occupancy_from_sdf
    from dynhor_tpu.neus import trainer as T

    kw = {"encoder": encoder}
    if table_size is not None:
        kw["hash_table_size"] = table_size
    sdf_cfg = SDFConfig(**kw)
    rcfg = RenderConfig(sampler=sampler, n_shade=n_shade)
    data = synthetic_data()
    results = {}
    for batch in batches:
        tcfg = T.TrainConfig(batch_rays=batch, num_steps=steps)
        opt = T.make_optimizer(tcfg)
        state = T.init_train_state(jax.random.PRNGKey(0), sdf_cfg, tcfg, opt)
        step_fn = T.make_train_step(sdf_cfg, rcfg, tcfg, opt)
        key = jax.random.PRNGKey(1)
        occ = None
        if sampler == "occgrid":
            occ = jax.jit(lambda p: occupancy_from_sdf(p, sdf_cfg, rcfg))(state.params)

        def run_step(state, i):
            k = jax.random.fold_in(key, i)
            state, metrics = step_fn(state, k, data, None, occ)
            return state, metrics

        # Warmup (compile + first steps).
        losses = []
        for i in range(3):
            state, metrics = run_step(state, i)
            losses.append(float(metrics["loss"]))
        t0 = time.perf_counter()
        for i in range(steps):
            state, metrics = run_step(state, 100 + i)
        # Value fetch forces  completion; a wedged runtime that silently
        # drops work (seen after TPU-side compiler crashes) would otherwise
        # report physically impossible step times.
        losses.append(float(metrics["loss"]))
        dt = (time.perf_counter() - t0) / steps
        assert losses[-1] != losses[0], "loss never moved — runtime wedged?"
        rps = batch / dt
        results[batch] = rps
        print(
            f"[{encoder:4s}] batch {batch:6d}: {dt * 1000:8.2f} ms/step "
            f"-> {rps / 1000.0:9.1f}K rays/s",
            flush=True,
        )
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--encoders", nargs="+", default=["pe", "hash"])
    ap.add_argument("--batches", nargs="+", type=int, default=[1024, 4096, 8192])
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--hash_table_size", type=int, default=None)
    ap.add_argument("--sampler", type=str, default="neus")
    ap.add_argument("--n_shade", type=int, default=16,
                    help="top-k shaded sections (0 = dense, the pre-round-5 path)")
    args = ap.parse_args()
    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    best = {}
    for enc in args.encoders:
        r = bench_encoder(enc, args.batches, args.steps, args.hash_table_size,
                          args.sampler, args.n_shade)
        best[enc] = max(r.values())
    for enc, v in best.items():
        print(f"BEST {enc}: {v / 1000.0:.1f}K rays/s/chip")


if __name__ == "__main__":
    main()
