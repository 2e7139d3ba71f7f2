#!/usr/bin/env python
"""Time the fused-front-end ViT fwd+bwd (grad to the input crop) at the
production refine shape (8 x 3 x 256 x 256 -> 518-edge tokens), across
remat policies.  Targets VERDICT r3 #2: after fusing resize+patch-embed,
re-probe the remat/attention layout at the higher arithmetic intensity.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dynhor_tpu.utils.compcache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from dynhor_tpu.models import dino as D

FRAMES = 8
CROP = 256


def main() -> None:
    cfg = D.DinoConfig()
    params = D.init_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    rgb = jax.random.uniform(jax.random.PRNGKey(1), (FRAMES, 3, CROP, CROP))

    def run(remat):
        def loss(im):
            f = D.forward_tokens_from_crop(params, im, cfg, remat=remat)
            return (f.astype(jnp.float32) ** 2).mean()

        g = jax.jit(jax.grad(loss))
        t0 = time.perf_counter()
        jax.block_until_ready(g(rgb))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        n = 10
        for _ in range(n):
            out = g(rgb)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n
        print(
            f"remat={remat!r:10s} f+b {dt * 1e3:7.1f} ms"
            f"  (compile {compile_s:5.1f} s)",
            flush=True,
        )

    for remat in ("frozen", "dots", False):
        try:
            run(remat)
        except Exception as e:  # noqa: BLE001 — probe: report and continue
            print(f"remat={remat!r:10s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
