"""Native C++ marching-tetrahedra engine: equivalence with the numpy
reference + speed sanity."""
import time

import numpy as np
import pytest

from dynhor_tpu.native import load_marching, marching_tetrahedra_native
from dynhor_tpu.neus import extract as EX


def _sphere_grid(n, r=0.55):
    xs = np.linspace(-1, 1, n)
    g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1)
    return (np.linalg.norm(g, axis=-1) - r).astype(np.float32)


@pytest.mark.skipif(load_marching() is None, reason="no C++ toolchain")
def test_native_matches_numpy_geometry():
    sdf = _sphere_grid(40)
    spacing = 2 / 39
    v_np, f_np = EX.marching_tetrahedra(sdf, (-1, -1, -1), spacing)
    v_cc, f_cc = marching_tetrahedra_native(sdf, (-1, -1, -1), spacing)
    assert len(v_cc) == len(v_np)
    assert len(f_cc) == len(f_np)
    # Same vertex SET (order differs; numpy interpolates in float64, C++ in
    # float32, so sort-and-compare misaligns ties — match by nearest point).
    from scipy.spatial import cKDTree

    d1, _ = cKDTree(v_np).query(v_cc)
    d2, _ = cKDTree(v_cc).query(v_np)
    assert d1.max() < 1e-4 and d2.max() < 1e-4
    # Same surface: Chamfer at the metric's own sampling-noise floor
    # (~sqrt(area / n_samples) for identical surfaces).
    cd = EX.chamfer_distance(v_cc, f_cc, v_np, f_np, n_samples=3000)
    assert cd < 0.03


@pytest.mark.skipif(load_marching() is None, reason="no C++ toolchain")
def test_native_empty_and_full_grids():
    sdf = np.ones((8, 8, 8), np.float32)  # all outside
    v, f = marching_tetrahedra_native(sdf, (0, 0, 0), 1.0)
    assert len(v) == 0 and len(f) == 0
    v, f = marching_tetrahedra_native(-sdf, (0, 0, 0), 1.0)
    assert len(v) == 0 and len(f) == 0


@pytest.mark.skipif(load_marching() is None, reason="no C++ toolchain")
def test_native_faster_than_numpy_at_scale():
    sdf = _sphere_grid(96)
    spacing = 2 / 95
    t0 = time.time()
    v_np, _ = EX.marching_tetrahedra(sdf, (-1, -1, -1), spacing)
    t_np = time.time() - t0
    t0 = time.time()
    v_cc, _ = marching_tetrahedra_native(sdf, (-1, -1, -1), spacing)
    t_cc = time.time() - t0
    assert len(v_cc) == len(v_np)
    # The native engine must not be slower (it is typically >5x faster).
    assert t_cc < t_np, f"native {t_cc:.3f}s vs numpy {t_np:.3f}s"
