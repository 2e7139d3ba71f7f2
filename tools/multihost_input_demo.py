"""Multi-host input-pipeline demo worker (one process per 'host').

Each process loads ITS OWN slice of the frame files from disk
(parallel/multihost.process_local_range), assembles the global sharded
batch (multihost.global_batch), and runs one jitted computation over the
global frame axis whose reduction crosses the process boundary.  Launched
N times (ranks 0..N-1) by tests/test_multihost.py on a CPU Gloo cluster;
on a TPU pod the same program runs once per host over DCN.

    python tools/multihost_input_demo.py --coordinator localhost:12378 \
        --rank 0 --world 2 --data /tmp/frames --out /tmp/out0.npz
"""
from __future__ import annotations

import argparse
import glob
import os


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--rank", type=int, required=True)
    ap.add_argument("--world", type=int, required=True)
    ap.add_argument("--data", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--devices-per-process", type=int, default=2)
    args = ap.parse_args()

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.devices_per_process}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from dynhor_tpu.parallel import multihost as MH
    from dynhor_tpu.parallel.mesh import make_mesh

    MH.init_distributed(args.coordinator, args.world, args.rank)
    files = sorted(glob.glob(os.path.join(args.data, "frame_*.npy")))
    n = len(files)
    lo, hi = MH.process_local_range(n)
    # THIS process's disk I/O only.
    local_frames = np.stack([np.load(f) for f in files[lo:hi]])
    local_w = np.arange(lo, hi, dtype=np.float32) + 1.0

    mesh = make_mesh(axis_name="frames")
    batch = MH.global_batch(
        {"frames": local_frames, "w": local_w}, n, mesh, "frames"
    )

    from jax.sharding import NamedSharding, PartitionSpec as P

    @jax.jit
    def step(b):
        per_frame = (b["frames"] ** 2).mean(axis=(1, 2)) * b["w"]
        total = per_frame.sum()  # cross-process psum over the frame shard
        return jax.lax.with_sharding_constraint(
            per_frame, NamedSharding(mesh, P())
        ), total

    per_frame, total = step(batch)
    np.savez(
        args.out,
        per_frame=np.asarray(per_frame),
        total=float(total),
        rank=args.rank,
        lo=lo,
        hi=hi,
        process_count=jax.process_count(),
        global_devices=jax.device_count(),
    )
    print(f"rank {args.rank}: total={float(total):.6f} ok", flush=True)


if __name__ == "__main__":
    main()
