"""Multi-host (multi-process) input pipeline over DCN.

SURVEY.md §2.3: intra-step communication rides ICI via XLA collectives;
the only DCN role in this design is the MULTI-HOST INPUT PIPELINE — each
host process loads its own slice of the video (or its own sequences) from
local disk, and the per-process shards are assembled into one global,
device-sharded batch with ``jax.make_array_from_process_local_data``.
After assembly, every jitted step (refine / joint opt / prior scoring /
NeuS) works unchanged: the arrays carry global shapes with multi-process
shardings, and XLA emits cross-host collectives only where the program
needs them.

The reference has no distributed execution at all (single CUDA device,
SURVEY.md §2.3); this module is TPU-pod-native design, validated without a
pod by a 2-process CPU cluster (Gloo backend) in
tests/test_multihost.py — JAX's standard multi-process path is identical
on CPU and TPU apart from the transport.

Usage (one process per host, same program):

    from dynhor_tpu.parallel import multihost as MH
    MH.init_distributed("host0:12345", num_processes=2, process_id=rank)
    mesh = make_mesh(axis_name="frames")          # all global devices
    lo, hi = MH.process_local_range(num_frames)
    local = load_frames(paths[lo:hi])             # THIS host's disk I/O
    batch = MH.global_batch(local, num_frames, mesh, "frames")
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
) -> None:
    """Join the JAX process cluster (idempotent per process).

    On a TPU pod each host calls this with its rank; the transport is DCN.
    On CPU (tests) the backend is Gloo over localhost.
    """
    # NOTE: must not touch the XLA backend before initialize() (so no
    # jax.devices()/process_count() here) — probe the distributed client
    # state directly for idempotence.
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return
    jax.distributed.initialize(
        coordinator_address, num_processes=num_processes, process_id=process_id
    )


def process_local_range(n_items: int) -> tuple[int, int]:
    """[lo, hi) slice of the global item axis THIS process must load.

    Contiguous equal split (last process takes the remainder) — matches the
    contiguous device order of ``make_mesh`` so every item lands on a device
    owned by the process that loaded it (no cross-host data movement during
    assembly).
    """
    rank, world = jax.process_index(), jax.process_count()
    per = n_items // world
    lo = rank * per
    hi = n_items if rank == world - 1 else lo + per
    return lo, hi


def global_batch(
    local_tree: Any, n_global: int, mesh: Mesh, axis_name: str = "frames"
) -> Any:
    """Assemble process-local arrays into global device-sharded arrays.

    Every leaf's leading axis is this process's ``process_local_range``
    slice of a global axis of size ``n_global``; the result is a pytree of
    global-shape jax.Arrays sharded over ``axis_name``.  Axes not matching
    the local slice length are fully replicated (each process must then
    pass identical values).
    """
    lo, hi = process_local_range(n_global)

    def put(x):
        x = np.asarray(x)
        if x.ndim >= 1 and x.shape[0] == hi - lo:
            sharding = NamedSharding(mesh, P(axis_name, *([None] * (x.ndim - 1))))
            return jax.make_array_from_process_local_data(
                sharding, x, global_shape=(n_global,) + x.shape[1:]
            )
        # Replicated leaf: every process provides the same full array.
        sharding = NamedSharding(mesh, P(*([None] * x.ndim)))
        return jax.make_array_from_process_local_data(
            sharding, x, global_shape=x.shape
        )

    return jax.tree.map(put, local_tree)
