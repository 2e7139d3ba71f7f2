"""Transient-device-fault retry (SURVEY.md §5 failure detection/recovery).

The TPU runtime in this environment occasionally kills a healthy launch
with ``UNAVAILABLE: TPU device error`` (observed to be non-deterministic:
the identical launch succeeds on retry).  Long-running pipelines wrap
their device launches with ``retry_on_device_error`` so a transient blip
does not destroy minutes of progress; persistent faults still raise.
"""
from __future__ import annotations

import time


# Error substrings that mark a TRANSIENT infrastructure fault (safe to
# retry the identical launch): the runtime watchdog killing a healthy
# program, and the remote-compile tunnel dropping a response mid-body
# (observed 2026-08-20: "INTERNAL: .../remote_compile: read body:
# response body closed before all bytes were read" on an otherwise
# healthy pipeline).  Genuine program faults (OOM, SIGILL, shape errors)
# match neither and raise immediately.
_TRANSIENT_MARKERS = ("UNAVAILABLE", "remote_compile")


def retry_on_device_error(fn, *args, retries: int = 2, backoff_s: float = 5.0, tag: str = "launch", **kwargs):
    """Call ``fn(*args, **kwargs)``, retrying on jax device errors."""
    from jax.errors import JaxRuntimeError

    last = None
    for attempt in range(retries + 1):
        try:
            return fn(*args, **kwargs)
        except JaxRuntimeError as e:  # pragma: no cover - device-only path
            transient = any(m in str(e) for m in _TRANSIENT_MARKERS)
            if not transient or attempt == retries:
                raise
            last = e
            print(
                f"WARNING: transient TPU device error in {tag} "
                f"(attempt {attempt + 1}/{retries + 1}); retrying in {backoff_s}s",
                flush=True,
            )
            time.sleep(backoff_s)
    raise last  # unreachable
