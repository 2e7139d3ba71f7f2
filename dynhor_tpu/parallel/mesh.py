"""Device-mesh / sharding helpers (jax.sharding + ICI collectives).

The reference has NO distributed execution (single CUDA device, SURVEY.md
§2.3).  The TPU build's parallel axes:

  * ``frames``  — stage-1 refine + stage-2 joint opt shard the video's
    frame axis (per-frame losses are independent; the joint smoothness
    term couples adjacent frames — XLA inserts the 1-frame halo exchange
    collective automatically from the sharding annotations).
  * ``views``   — prior rendering/scoring shards the 6,000-view axis.
  * ``rays``    — NeuS reconstruction shards ray batches (neus/).
  * ``seq``     — multi-sequence batch: one video per chip group
    (BASELINE.json config #5).

All of it is ``jax.jit`` + ``NamedSharding``: XLA emits the psum /
all-gather over ICI; there is no hand-written transport.
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array


def make_mesh(num_devices: int | None = None, axis_name: str = "frames") -> Mesh:
    """1-D mesh over the first ``num_devices`` local devices."""
    devs = jax.devices()
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def make_seq_frame_mesh(num_sequences: int, axis_names=("seq", "frames")) -> Mesh:
    """2-D mesh: sequences x frames-within-sequence (multi-video batch)."""
    devs = np.asarray(jax.devices())
    assert devs.size % num_sequences == 0, "devices must divide evenly"
    return Mesh(devs.reshape(num_sequences, -1), axis_names)


def shard_leading(
    tree: Any, mesh: Mesh, axis_name: str | tuple[str, ...] = "frames"
) -> Any:
    """device_put every array with its LEADING axis sharded over the mesh.

    ``axis_name`` may be a tuple of mesh axes (e.g. ``("seq", "frames")``)
    to shard one flat pooled axis over a 2-D mesh — the multi-sequence
    batch's frame pool over the seq x frames mesh (make_seq_frame_mesh).

    Scalars / axes not divisible by the mesh are replicated — with a
    host-side warning for non-trivial axes, so a "sharded" run that
    silently fell back to replication is visible (same honesty standard
    as the rasterizer overflow signal).  Callers that want true sharding
    at odd sizes should ``pad_to_multiple`` first.
    """
    import warnings

    names = axis_name if isinstance(axis_name, tuple) else (axis_name,)
    n = int(np.prod([mesh.shape[a] for a in names]))
    lead = names if len(names) > 1 else names[0]

    def put(x):
        x = jax.numpy.asarray(x)
        if x.ndim >= 1 and x.shape[0] % n == 0 and x.shape[0] > 0:
            spec = P(lead, *([None] * (x.ndim - 1)))
        else:
            if x.ndim >= 1 and x.shape[0] > 1 and n > 1:
                warnings.warn(
                    f"shard_leading: leading axis {x.shape[0]} not divisible"
                    f" by mesh axis '{axis_name}'={n}; REPLICATING this array"
                    " (pad_to_multiple the axis to shard it)",
                    stacklevel=3,
                )
            spec = P(*([None] * x.ndim))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """device_put every array fully replicated on the mesh."""

    def put(x):
        x = jax.numpy.asarray(x)
        return jax.device_put(x, NamedSharding(mesh, P(*([None] * x.ndim))))

    return jax.tree.map(put, tree)


def pad_to_multiple(x: Array, multiple: int, axis: int = 0):
    """Pad the given axis up to a multiple (edge-replicate); returns
    (padded, original_size).  Sharded axes must divide the mesh size."""
    import jax.numpy as jnp

    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x, size
    idx = jnp.concatenate([jnp.arange(size), jnp.full((pad,), size - 1)])
    return jnp.take(x, idx, axis=axis), size
