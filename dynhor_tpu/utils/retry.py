"""Transient-device-fault retry (SURVEY.md §5 failure detection/recovery).

The TPU runtime in this environment occasionally kills a healthy launch
with ``UNAVAILABLE: TPU device error`` (observed to be non-deterministic:
the identical launch succeeds on retry).  Long-running pipelines wrap
their device launches with ``retry_on_device_error`` so a transient blip
does not destroy minutes of progress; persistent faults still raise.
"""
from __future__ import annotations

import time


def retry_on_device_error(fn, *args, retries: int = 2, backoff_s: float = 5.0, tag: str = "launch", **kwargs):
    """Call ``fn(*args, **kwargs)``, retrying on jax device errors."""
    from jax.errors import JaxRuntimeError

    last = None
    for attempt in range(retries + 1):
        try:
            return fn(*args, **kwargs)
        except JaxRuntimeError as e:  # pragma: no cover - device-only path
            if "UNAVAILABLE" not in str(e) or attempt == retries:
                raise
            last = e
            print(
                f"WARNING: transient TPU device error in {tag} "
                f"(attempt {attempt + 1}/{retries + 1}); retrying in {backoff_s}s",
                flush=True,
            )
            time.sleep(backoff_s)
    raise last  # unreachable
