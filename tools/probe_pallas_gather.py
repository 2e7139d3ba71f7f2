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


if __name__ == "__main__":
    main()
