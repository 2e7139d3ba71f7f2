"""Persistent XLA compilation cache.

The reference-parity e2e run spends ~2 min in one-time compiles
(BASELINE.md); enabling JAX's persistent cache makes every re-run (and
every CLI: run.py / vis.py / recon.py / run_multi.py) start warm.  Safe to
call multiple times; honours an explicit JAX_COMPILATION_CACHE_DIR.
"""
from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/dynhor_tpu/jax_cache")


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    import jax

    path = (
        cache_dir
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or _DEFAULT_DIR
    )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        # Cache everything that took meaningful compile time; the default
        # (1 s) skips many of this pipeline's mid-size kernels.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # pragma: no cover - older jax flag names
        print(f"persistent compilation cache unavailable: {e}", flush=True)
    return path
