"""Pre-warm the persistent XLA compile cache for the production programs.

Cold-process end-to-end on the 12-frame demo pays ~200 s of one-time
compiles (BASELINE.md round 4: 290.8 s fresh vs 83.4 s warm-cache).  This
tool populates ``~/.cache/dynhor_tpu/jax_cache`` (utils/compcache.py) so a
fresh process starts warm (VERDICT r4 next #6):

* TPU mode (default): drives the full tracking pipeline on a config at
  REDUCED iteration counts.  Iteration counts do not change compiled
  programs — refine/joint run as 25/50-iter chunked launches with carried
  state, and prior scoring is shape-stable in host_batch slices — so one
  25/50-iter pass compiles exactly the programs the 100/200-iter
  production run reuses.  Compiled shapes ARE keyed by frame count, crop
  size, and the counted raster caps, so warm per sequence family:

      python tools/warm_cache.py --config configs/custom_shoes.yaml

* Dryrun mode: pre-compiles the multichip dryrun tiers on the virtual
  CPU mesh (each mid-tier phase costs ~2 min of XLA:CPU compile):

      python tools/warm_cache.py --dryrun [--tiers 0 1] [--n-devices 8]

  CAVEAT (measured round 5, BASELINE.md): XLA:CPU AOT cache entries
  embed compile-time machine features (incl. +prefer-no-scatter/-gather
  pseudo-features) that the loader's host probe lacks, so the BIG
  sharded programs (mid joint/refine) recompile across processes anyway
  — CPU-dryrun warming currently only helps the small phases.  The TPU
  mode below is unaffected (the TPU cache round-trips correctly;
  fresh-process e2e 347 s -> 104.5 s).
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def warm_dryrun(tiers: list[int], n_devices: int) -> None:
    here = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    for i in tiers:
        t0 = time.time()
        env = dict(os.environ, DYNHOR_DRYRUN_CHILD_BUDGET_S="0")  # no gate
        rc = subprocess.call(
            [sys.executable, os.path.join(here, "__graft_entry__.py"),
             "--run-tier", str(i), "--n-devices", str(n_devices)],
            cwd=here, env=env,
        )
        print(f"[warm] dryrun tier {i}: rc={rc} in {time.time() - t0:.1f}s",
              flush=True)


def warm_pipeline(config_path: str) -> None:
    from dynhor_tpu.utils.compcache import enable_persistent_cache

    path = enable_persistent_cache()
    print(f"[warm] persistent cache at {path}", flush=True)

    from dynhor_tpu.io.config import load_config
    from dynhor_tpu.models import dino as dino_mod
    from dynhor_tpu.tracker import pipeline as PL

    cfg = load_config(config_path)
    sysc = cfg["system"]
    # One chunked launch each: same compiled programs as the full counts.
    sysc["init_num_iterations"] = 25
    sysc["joint_num_iterations"] = 50
    dataroot = cfg["data_info"]["dataroot"]
    if not os.path.isdir(dataroot):
        sys.exit(
            f"no {dataroot}: generate the demo data first "
            "(python tools/make_demo_data.py --out data/custom_shoes --frames 12)"
        )
    t0 = time.time()
    seq = PL.load_sequence(dataroot)
    ann = PL.process_frames(
        seq, int(sysc["crop_size"]), float(sysc["bbox_expansion"])
    )
    mesh = PL.load_mesh(
        cfg["data_info"]["obj_path"], bool(cfg["data_info"]["normalize_mesh"])
    )
    dparams, dcfg = dino_mod.load_params(
        sysc["dino"].get("checkpoint"),
        dino_mod.config_for_model(
            sysc["dino"].get("model", "dinov2_vitb14"),
            smaller_edge_size=int(sysc["dino"]["smaller_edge_size"]),
        ),
    )
    PL.track_sequence(cfg, seq, ann, mesh, dino_params=dparams, dino_cfg=dcfg)
    print(f"[warm] pipeline programs compiled+cached in {time.time() - t0:.1f}s",
          flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/custom_shoes.yaml")
    ap.add_argument("--dryrun", action="store_true",
                    help="warm the virtual-CPU-mesh dryrun tiers instead")
    ap.add_argument("--tiers", nargs="+", type=int, default=[0, 1])
    ap.add_argument("--n-devices", type=int, default=8)
    args = ap.parse_args()
    if args.dryrun:
        warm_dryrun(args.tiers, args.n_devices)
    else:
        warm_pipeline(args.config)


if __name__ == "__main__":
    main()
