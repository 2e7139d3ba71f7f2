#!/usr/bin/env python
"""Dissect the hash-encoder NeuS step's 2.4 s/step pathology (VERDICT r4
weak #4 / next #5).

tools/probe_pallas_gather.py proved raw XLA gathers/scatters at the
encode's shapes cost ~0.03 ms — so the 40-70x hash-vs-pe gap is NOT the
table lookups.  This probe times each suspect layer in isolation on the
TPU to find where the 2.4 s actually goes:

  1. hash_encode forward                       (8 gathers)
  2. hash_encode forward+backward to table     (8 scatter-adds)
  3. sdf_hash_forward fwd / fwd+bwd            (+ tiny MLP)
  4. SDF spatial gradient (jvp-over-sdf)       (the normals path)
  5. second-order: grad of (eikonal of grad)   (grad-of-jvp — the NeuS
     training position, suspected blowup)
  6. table-size sweep on #5                    (scatter cost vs T)

    python tools/probe_hash_breakdown.py [--points 262144]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def _leaf_sum(out):
    return sum(
        float(jnp.asarray(l, jnp.float32).sum())
        for l in jax.tree.leaves(out)
    )


def timeit(name, fn, *args, iters=10):
    """Value-fetch-guarded timing (SKILL.md gotcha: after a TPU-side
    compiler crash, later processes can report bogus-fast times with the
    work silently dropped — ending with a host float() fetch and checking
    it is finite forces real completion)."""
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    chk = _leaf_sum(out)
    dt = (time.perf_counter() - t0) / iters
    import math

    tag = "" if math.isfinite(chk) else "  [NONFINITE CHECKSUM]"
    print(f"[{dt * 1e3:9.2f} ms] {name}{tag}", flush=True)
    return dt


def main():
    from dynhor_tpu.neus import fields as F

    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=262144)  # 4096 rays x 64
    ap.add_argument("--table-log2", type=int, default=19)
    args = ap.parse_args()
    n = args.points

    cfg = F.SDFConfig(encoder="hash", hash_table_size=2 ** args.table_log2)
    params = F.init_hash_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (n, 3), minval=-0.9, maxval=0.9)
    x01 = (x + 1.0) / 2.0
    print(f"points={n}, table=2^{args.table_log2} x {cfg.hash_levels} levels "
          f"x {cfg.hash_features} feats", flush=True)

    enc = jax.jit(lambda t, p: F.hash_encode(t, p, cfg))
    timeit("1 hash_encode fwd", enc, params["table"], x01)

    enc_g = jax.jit(
        jax.grad(lambda t, p: F.hash_encode(t, p, cfg).sum(), argnums=0)
    )
    timeit("2 hash_encode fwd+bwd(table)", enc_g, params["table"], x01)

    sdf = jax.jit(lambda pr, p: F.sdf_hash_forward(pr, p, cfg)[0].sum())
    timeit("3a sdf_hash fwd", sdf, params, x)

    sdf_g = jax.jit(jax.grad(lambda pr, p: F.sdf_hash_forward(pr, p, cfg)[0].sum()))
    timeit("3b sdf_hash fwd+bwd(params)", sdf_g, params, x)

    def spatial_grad(pr, p):
        g = jax.vmap(
            jax.grad(lambda q: F.sdf_hash_forward(pr, q[None], cfg)[0][0])
        )(p)
        return g

    timeit("4 spatial grad (vmap grad-x)", jax.jit(spatial_grad), params, x)

    def eik_loss(pr, p):
        g = spatial_grad(pr, p)
        return ((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2).mean()

    timeit("5 grad(eikonal(grad-x)) [2nd order]",
           jax.jit(jax.grad(eik_loss)), params, x)

    # Raw gather / scatter-add at the encode's TRUE aggregate shape:
    # n points x 16 levels x 8 corners lookups of (.., 2) rows.
    n_lk = n * cfg.hash_levels * 8
    t_rows = cfg.hash_levels * cfg.hash_table_size
    flat_idx = jax.random.randint(
        jax.random.PRNGKey(7), (n_lk,), 0, t_rows, jnp.int32
    )
    tab = jax.random.normal(jax.random.PRNGKey(8), (t_rows, 2))
    g_rows = jax.random.normal(jax.random.PRNGKey(9), (n_lk, 2))
    timeit(
        f"R1 raw gather {n_lk / 1e6:.1f}M rows of ({t_rows},2)",
        jax.jit(lambda t, i: jnp.take(t, i, axis=0)), tab, flat_idx,
    )
    timeit(
        f"R2 raw scatter-add {n_lk / 1e6:.1f}M rows into ({t_rows},2)",
        jax.jit(lambda i, g: jnp.zeros((t_rows, 2)).at[i].add(g)),
        flat_idx, g_rows,
    )
    small = 2 ** 15
    idx_s = jax.random.randint(jax.random.PRNGKey(10), (n_lk,), 0, small, jnp.int32)
    timeit(
        f"R3 raw scatter-add {n_lk / 1e6:.1f}M rows into ({small},2)",
        jax.jit(lambda i, g: jnp.zeros((small, 2)).at[i].add(g)),
        idx_s, g_rows,
    )

    for lg in (15, 13):
        cfg2 = F.SDFConfig(encoder="hash", hash_table_size=2 ** lg)
        params2 = F.init_hash_params(jax.random.PRNGKey(0), cfg2)

        def eik2(pr, p, cfg2=cfg2):
            g = jax.vmap(
                jax.grad(lambda q: F.sdf_hash_forward(pr, q[None], cfg2)[0][0])
            )(p)
            return ((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2).mean()

        timeit(f"6 2nd-order @ table 2^{lg}", jax.jit(jax.grad(eik2)), params2, x)


if __name__ == "__main__":
    main()
