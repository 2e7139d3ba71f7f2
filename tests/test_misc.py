"""Profiler, config loader, package surface."""
import os
import time

import yaml

from dynhor_tpu.io.config import DEFAULTS, experiment_dir, load_config
from dynhor_tpu.utils.profiling import Profiler


def test_profiler_phases():
    prof = Profiler(enabled=True)
    with prof.phase("a"):
        time.sleep(0.01)
    with prof.phase("b"):
        time.sleep(0.005)
    with prof.phase("a"):
        time.sleep(0.01)
    times = prof.summary(printer=lambda *_: None)
    assert set(times) == {"a", "b"}
    assert times["a"] > times["b"] > 0


def test_profiler_disabled_noop():
    prof = Profiler(enabled=False)
    with prof.phase("x"):
        pass
    assert prof.summary(printer=lambda *_: None) == {}


def test_load_config_merges_defaults(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text(
        "seq_name: s\nexp_name: e\n"
        "system:\n  init_lr: 0.5\n  prior: {num_views: 7}\n"
    )
    cfg = load_config(str(p))
    assert cfg["seq_name"] == "s"
    assert cfg["system"]["init_lr"] == 0.5
    assert cfg["system"]["prior"]["num_views"] == 7
    # untouched defaults survive the deep merge
    assert cfg["system"]["prior"]["distance_scale"] == 3.5
    assert cfg["system"]["joint_num_iterations"] == 200
    assert experiment_dir(cfg) == os.path.join("exps", "s", "e")


def test_reference_config_loads():
    cfg = load_config("configs/custom_shoes.yaml")
    assert cfg["system"]["init_num_iterations"] == 100
    assert cfg["system"]["loss"]["lw_smooth_obj"] == 10.0


def test_package_surface():
    import dynhor_tpu
    from dynhor_tpu import io, models, neus, ops, parallel, tracker, utils

    assert hasattr(ops, "rasterize_tiled")
    assert hasattr(ops, "silhouette_pallas")
    assert hasattr(neus, "data")
    assert hasattr(utils, "constants")
    assert utils.constants.REND_SIZE == 256
