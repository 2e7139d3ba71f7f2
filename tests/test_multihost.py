"""Multi-host input pipeline on a 2-process CPU (Gloo) cluster
(VERDICT r2 missing #3; SURVEY.md §2.3 "DCN only for multi-host input
pipelines", §7 step 7).

Spawns two real OS processes, each loading only ITS slice of the frame
files, assembling the global sharded batch with
jax.make_array_from_process_local_data, and running one jitted reduction
whose psum crosses the process boundary.  The same program runs per-host
on a TPU pod; only the transport differs (DCN vs Gloo/localhost).
"""
import os
import subprocess
import sys

import numpy as np
import pytest

TOOL = os.path.join(os.path.dirname(__file__), "..", "tools", "multihost_input_demo.py")


@pytest.mark.slow
def test_two_process_input_pipeline(tmp_path):
    rng = np.random.default_rng(0)
    n, h, w = 8, 16, 16  # 8 frames / 4 global devices / 2 processes
    frames = rng.uniform(size=(n, h, w)).astype(np.float32)
    data = tmp_path / "frames"
    data.mkdir()
    for i in range(n):
        np.save(data / f"frame_{i:04d}.npy", frames[i])

    repo = os.path.join(os.path.dirname(__file__), "..")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = ""  # worker sets its own host-device count
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = []
    outs = []
    for rank in range(2):
        out = tmp_path / f"out{rank}.npz"
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, TOOL, "--coordinator", "localhost:12378",
                    "--rank", str(rank), "--world", "2",
                    "--data", str(data), "--out", str(out),
                ],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
        )
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=420)
        logs.append(stdout.decode())
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log

    expected_pf = (frames**2).mean(axis=(1, 2)) * (np.arange(n) + 1.0)
    expected_total = expected_pf.sum()
    for rank, out in enumerate(outs):
        d = np.load(out)
        assert int(d["process_count"]) == 2
        assert int(d["global_devices"]) == 4  # 2 processes x 2 local devices
        # Each process loaded a DISJOINT contiguous slice...
        assert (int(d["lo"]), int(d["hi"])) == ((0, 4) if rank == 0 else (4, 8))
        # ...yet computed the correct GLOBAL reduction.
        np.testing.assert_allclose(float(d["total"]), expected_total, rtol=1e-5)
        np.testing.assert_allclose(d["per_frame"], expected_pf, rtol=1e-5)
