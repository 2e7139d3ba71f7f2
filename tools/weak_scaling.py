"""Weak-scaling measurement of the sharded fine-refine step on a virtual
CPU device mesh (VERDICT r2 next #1).

Weak scaling: frames = n_devices (constant per-device work), prod-shape
scene (shoes 5k-face mesh, 256^2 crops, full ViT-B/14 architecture; DINO
edge reduced for single-core wall clock).  Also measures SAME-WORK
sharding overhead: 8 frames on 1 device vs 8 frames sharded over 8.

HONESTY NOTE (record with the table): this host exposes ONE physical
core, so all virtual devices share it — wall-clock here measures the
sharded program's structural overhead (partitioning, collectives,
per-device dispatch), NOT ICI scaling.  Perfect weak scaling on real
chips would hold step time constant as n grows; on one shared core the
expected reference line is step(n) ~ n * step(1) + overhead, so the
reported `overhead_vs_linear` is the honest figure of merit.

    python tools/weak_scaling.py            # full sweep (spawns workers)
    python tools/weak_scaling.py --worker N # one measurement (internal)
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

EDGE = 126  # full ViT-B/14 architecture; 9x9 tokens for 1-core wall clock
ITERS = 2  # timed Adam steps per measurement (after a compile warmup)


def worker(n_devices: int, frames: int) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_devices}"
    ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import dataclasses

    import __graft_entry__ as ge
    from dynhor_tpu.parallel.mesh import make_mesh, replicate, shard_leading
    from dynhor_tpu.tracker import refine as RF

    mesh_arrays, targets, rot, trans, dparams, dcfg, cfg = ge._prod_setup(
        crop_size=256, frames=frames, dino_edge=EDGE
    )
    cfg = dataclasses.replace(cfg, num_iterations=ITERS)
    mesh = make_mesh(n_devices, "frames")
    args = (
        RF.MeshArrays(*replicate(tuple(mesh_arrays), mesh)),
        RF.FrameTargets(*shard_leading(tuple(targets), mesh)),
        shard_leading(rot, mesh),
        shard_leading(trans, mesh),
        replicate(dparams, mesh),
        dcfg,
    )
    # Warmup launch compiles everything (1 iter).
    warm = dataclasses.replace(cfg, num_iterations=1)
    jax.block_until_ready(RF.refine_poses(*args, warm).rot6d)
    t0 = time.perf_counter()
    res = RF.refine_poses(*args, cfg)
    jax.block_until_ready(res.rot6d)
    dt = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "n_devices": n_devices,
                "frames": frames,
                "step_ms": 1000.0 * dt / ITERS,
                "overflow": int(res.max_overflow),
            }
        ),
        flush=True,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--frames", type=int, default=None)
    args = ap.parse_args()
    if args.worker is not None:
        worker(args.worker, args.frames or args.worker)
        return

    rows = []
    runs = [(1, 1), (2, 2), (4, 4), (8, 8), (1, 8), (8, 8)]
    seen = set()
    for n, f in runs:
        if (n, f) in seen:
            continue
        seen.add((n, f))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", str(n),
             "--frames", str(f)],
            capture_output=True, text=True, timeout=3600,
            env={**os.environ, "XLA_FLAGS": ""},
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(f"worker n={n} f={f} FAILED:\n{out.stdout}\n{out.stderr[-2000:]}")
            continue
        row = json.loads(line[-1])
        rows.append(row)
        print(line[-1], flush=True)

    by = {(r["n_devices"], r["frames"]): r["step_ms"] for r in rows}
    if (1, 1) in by and (8, 8) in by:
        lin = 8 * by[(1, 1)]
        print(
            f"weak-scaling 8-dev overhead_vs_linear (1 shared core): "
            f"{by[(8, 8)] / lin:.3f}x of 8 x single-device step"
        )
    if (1, 8) in by and (8, 8) in by:
        print(
            f"same-work sharding overhead (8 frames, 8 dev vs 1 dev): "
            f"{by[(8, 8)] / by[(1, 8)]:.3f}x"
        )


if __name__ == "__main__":
    main()
