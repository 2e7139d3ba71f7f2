#!/usr/bin/env python
"""Stage-level timing of the hash-encoder NeuS train step (follow-on to
probe_hash_breakdown.py, which proved field fwd/bwd/2nd-order all cost
<1 ms in isolation).  Times render_rays fwd, loss fwd, loss grad, and the
full step, for pe vs hash, to localize the 2.4 s/step pathology.

    python tools/probe_hash_step.py [--batch 4096] [--sampler occgrid]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def timeit(name, fn, *args, iters=5):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"[{dt * 1e3:9.2f} ms | compile {compile_s:6.1f}s] {name}", flush=True)


def main():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from bench_neus import synthetic_data

    from dynhor_tpu.neus import trainer as T
    from dynhor_tpu.neus.fields import SDFConfig
    from dynhor_tpu.neus.rendering import (
        RenderConfig, occupancy_from_sdf, render_rays,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--sampler", default="occgrid")
    ap.add_argument("--encoders", nargs="+", default=["pe", "hash"])
    args = ap.parse_args()

    data = synthetic_data()
    for enc in args.encoders:
        sdf_cfg = SDFConfig(encoder=enc)
        rcfg = RenderConfig(sampler=args.sampler, n_shade=16)
        tcfg = T.TrainConfig(batch_rays=args.batch, num_steps=20)
        opt = T.make_optimizer(tcfg)
        state = T.init_train_state(jax.random.PRNGKey(0), sdf_cfg, tcfg, opt)
        occ = None
        if args.sampler == "occgrid":
            occ = jax.jit(lambda p: occupancy_from_sdf(p, sdf_cfg, rcfg))(
                state.params
            )
            jax.block_until_ready(occ)
        key = jax.random.PRNGKey(1)
        fr, xy, rgb_gt, mask_gt, _ = T.sample_ray_batch(key, data, args.batch)
        rays = T._rays_for(data, fr, xy, rcfg.bound)

        print(f"--- encoder={enc} sampler={args.sampler} batch={args.batch}",
              flush=True)

        rr = jax.jit(
            lambda p, r, k: render_rays(p, sdf_cfg, rcfg, r, k, occ).rgb
        )
        timeit("render_rays fwd", rr, state.params, rays, key)

        def loss_only(params, k):
            def lf(p):
                out = render_rays(p, sdf_cfg, rcfg, rays, k, occ)
                rgb_pred = out.rgb
                return jnp.abs(rgb_pred - rgb_gt).mean() + out.eikonal

            return lf(params)

        timeit("rgb+eik loss fwd", jax.jit(loss_only), state.params, key)
        timeit(
            "rgb+eik loss grad",
            jax.jit(jax.grad(lambda p, k: loss_only(p, k))),
            state.params,
            key,
        )

        step_fn = T.make_train_step(sdf_cfg, rcfg, tcfg, opt)
        timeit(
            "full train_step",
            lambda s, k: step_fn(s, k, data, None, occ)[1]["loss"],
            state,
            key,
        )


if __name__ == "__main__":
    main()
