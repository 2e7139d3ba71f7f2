#!/usr/bin/env python
"""Probe which gather forms Mosaic/Pallas TPU supports, for the hash-grid
kernel design (ops/hashgrid_pallas.py).  Each form is tried independently;
failures print the Mosaic error head."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import functools
import traceback

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def try_form(name, fn):
    try:
        out = fn()
        jax.block_until_ready(out)
        print(f"[OK]   {name}: out {out.shape} {out.dtype}")
    except Exception as e:  # noqa: BLE001
        msg = str(e).splitlines()
        head = msg[0][:200] if msg else repr(e)
        print(f"[FAIL] {name}: {head}")


def main():
    T, F, N = 8192, 8, 1024

    table = jax.random.normal(jax.random.PRNGKey(0), (T, F), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, T, jnp.int32)

    # Form A: row gather table[idx] via jnp.take along axis 0.
    def kern_a(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take(t_ref[:], i_ref[0], axis=0)

    def form_a():
        return pl.pallas_call(
            kern_a,
            out_shape=jax.ShapeDtypeStruct((N, F), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table, idx.reshape(1, N))

    try_form("A row-gather (N,F) = take((T,F}), idx, axis=0)", form_a)

    # Form B: 1-D lane gather from a (1, T) vector, idx (1, N).
    tab1d = jax.random.normal(jax.random.PRNGKey(2), (1, T), jnp.float32)

    def kern_b(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take(t_ref[:].reshape(-1), i_ref[:].reshape(-1), axis=0).reshape(1, -1)

    def form_b():
        return pl.pallas_call(
            kern_b,
            out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab1d, idx.reshape(1, N))

    try_form("B 1-D lane gather (1,N) from (1,T)", form_b)

    # Form C: take_along_axis within matching shapes (8, 128) from (8, T).
    tab8 = jax.random.normal(jax.random.PRNGKey(3), (8, T), jnp.float32)
    idx8 = jax.random.randint(jax.random.PRNGKey(4), (8, 128), 0, T, jnp.int32)

    def kern_c(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)

    def form_c():
        return pl.pallas_call(
            kern_c,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab8, idx8)

    try_form("C take_along_axis (8,128) from (8,T) lanes", form_c)

    # Form D: sublane gather via dynamic slice in a fori_loop (serial probe).
    def kern_d(t_ref, i_ref, o_ref):
        def body(j, _):
            o_ref[j, :] = t_ref[i_ref[0, j], :]
            return 0
        jax.lax.fori_loop(0, 8, body, 0)

    def form_d():
        return pl.pallas_call(
            kern_d,
            out_shape=jax.ShapeDtypeStruct((8, F), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table, idx[:8].reshape(1, 8))

    try_form("D serial dynamic-row slice x8", form_d)

    # Form E: per-lane row gather out[i, l] = src[idx[i, l], l] —
    # take_along_axis(axis=0) with idx shaped like the output.  This is
    # Mosaic's DynamicGather form (form B's failure said "Only 2D gather is
    # supported"); if it lowers, a hash level laid out as (T, 128 lanes)
    # serves 128 independent point-lookups per row gather.
    for t_rows in (512, 8192):
        tab_e = jax.random.normal(jax.random.PRNGKey(5), (t_rows, 128), jnp.float32)
        idx_e = jax.random.randint(jax.random.PRNGKey(6), (256, 128), 0, t_rows, jnp.int32)

        def kern_e(t_ref, i_ref, o_ref):
            o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=0)

        def form_e(tab=tab_e, idx_=idx_e):
            return pl.pallas_call(
                kern_e,
                out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(tab, idx_)

        try_form(f"E per-lane row gather (256,128) from ({t_rows},128) axis=0", form_e)

    # Form F: same but 8-sublane idx tile (exactly one register tile).
    tab_f = jax.random.normal(jax.random.PRNGKey(7), (512, 128), jnp.float32)
    idx_f = jax.random.randint(jax.random.PRNGKey(8), (8, 128), 0, 512, jnp.int32)

    def kern_f(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=0)

    def form_f():
        return pl.pallas_call(
            kern_f,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab_f, idx_f)

    try_form("F per-lane row gather (8,128) from (512,128) axis=0", form_f)

    # Form G: lane shuffle within one row — take_along_axis(axis=1) where
    # both sides are (8, 128): out[i, l] = src[i, idx[i, l]].
    tab_g = jax.random.normal(jax.random.PRNGKey(9), (8, 128), jnp.float32)
    idx_g = jax.random.randint(jax.random.PRNGKey(10), (8, 128), 0, 128, jnp.int32)

    def kern_g(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)

    def form_g():
        return pl.pallas_call(
            kern_g,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab_g, idx_g)

    try_form("G lane shuffle (8,128) take_along_axis axis=1", form_g)

    # Timed reference: if form E lowers, measure its throughput at a
    # hash-level shape (table 8192x128 f32 = 4 MB VMEM; 2048 lookup rows =
    # 256k lookups/call) vs the XLA row-gather baseline outside Pallas.
    import time as _time

    def timed(name, fn, iters=20):
        try:
            out = fn()
            jax.block_until_ready(out)
            t0 = _time.perf_counter()
            for _ in range(iters):
                out = fn()
            jax.block_until_ready(out)
            dt = (_time.perf_counter() - t0) / iters
            n = out.shape[0] * out.shape[1]
            print(f"[TIME] {name}: {dt * 1e3:.3f} ms/call -> {n / dt / 1e6:.0f}M lookups/s")
        except Exception as e:  # noqa: BLE001
            lines = str(e).splitlines()
            head = lines[0][:160] if lines else repr(e)[:160]
            print(f"[TIME-FAIL] {name}: {head}")

    t_rows, n_rows = 8192, 2048
    tab_t = jax.random.normal(jax.random.PRNGKey(11), (t_rows, 128), jnp.float32)
    idx_t = jax.random.randint(jax.random.PRNGKey(12), (n_rows, 128), 0, t_rows, jnp.int32)

    def kern_t(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=0)

    @jax.jit
    def pallas_gather(tab, idx_):
        return pl.pallas_call(
            kern_t,
            out_shape=jax.ShapeDtypeStruct((n_rows, 128), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx_)

    timed("E pallas per-lane gather 2048x128 of 8192x128", lambda: pallas_gather(tab_t, idx_t))

    @jax.jit
    def xla_gather(tab, idx_):
        return jnp.take_along_axis(tab, idx_, axis=0)

    timed("E xla take_along_axis same shape", lambda: xla_gather(tab_t, idx_t))

    flat_idx = jax.random.randint(jax.random.PRNGKey(13), (n_rows * 128,), 0, t_rows, jnp.int32)

    @jax.jit
    def xla_row_gather(tab, idx_):
        return jnp.take(tab[:, :2], idx_, axis=0)

    timed("XLA row-gather baseline (262k rows of (T,2))", lambda: xla_row_gather(tab_t, flat_idx))

    # Form H: per-lane scatter-add dst[idx[i,l], l] += g[i,l] — the VJP of
    # form E w.r.t. the table.  If this lowers, a Pallas hash kernel can
    # own its backward; if not, table grads stay XLA segment-sums and any
    # Pallas win is forward-only.
    g_h = jax.random.normal(jax.random.PRNGKey(14), (256, 128), jnp.float32)
    idx_h = jax.random.randint(jax.random.PRNGKey(15), (256, 128), 0, 512, jnp.int32)

    def kern_h(g_ref, i_ref, o_ref):
        o_ref[:] = jnp.zeros_like(o_ref)
        z = jnp.zeros((512, 128), jnp.float32)
        o_ref[:] = z.at[i_ref[:], jax.lax.broadcasted_iota(jnp.int32, (256, 128), 1)].add(g_ref[:])

    def form_h():
        return pl.pallas_call(
            kern_h,
            out_shape=jax.ShapeDtypeStruct((512, 128), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(g_h, idx_h)

    try_form("H per-lane scatter-add (512,128) += (256,128)", form_h)

    # XLA scatter-add baseline at hash-backward shape: 262k row grads of
    # width 2 segment-summed into a (T, 2) table.
    g_s = jax.random.normal(jax.random.PRNGKey(16), (n_rows * 128, 2), jnp.float32)

    @jax.jit
    def xla_scatter(idx_, g):
        return jnp.zeros((t_rows, 2), jnp.float32).at[idx_].add(g)

    timed("XLA scatter-add baseline (262k rows into (T,2))",
          lambda: xla_scatter(flat_idx, g_s))


if __name__ == "__main__":
    main()
