"""Transient-fault retry classification (utils/retry.py).

The wrapper must retry the two observed TRANSIENT infra faults — the
runtime watchdog (``UNAVAILABLE: TPU device error``) and the axon
remote-compile tunnel dropping a response body — and must NOT retry
genuine program faults (OOM/shape errors), which would waste minutes
re-running a deterministic failure.
"""
from __future__ import annotations

import pytest
from jax.errors import JaxRuntimeError

from dynhor_tpu.utils.retry import retry_on_device_error


def _flaky(markers: list[str], fails: int):
    calls = {"n": 0}

    def fn():
        calls["n"] += 1
        if calls["n"] <= fails:
            raise JaxRuntimeError(markers[(calls["n"] - 1) % len(markers)])
        return "ok"

    return fn, calls


@pytest.mark.parametrize(
    "msg",
    [
        "UNAVAILABLE: TPU device error",
        "INTERNAL: http://127.0.0.1:8083/remote_compile: read body:"
        " response body closed before all bytes were read",
    ],
)
def test_retries_transient_faults(msg):
    fn, calls = _flaky([msg], fails=2)
    assert retry_on_device_error(fn, retries=2, backoff_s=0.0) == "ok"
    assert calls["n"] == 3


def test_does_not_retry_program_faults():
    fn, calls = _flaky(["RESOURCE_EXHAUSTED: out of memory"], fails=1)
    with pytest.raises(JaxRuntimeError):
        retry_on_device_error(fn, retries=2, backoff_s=0.0)
    assert calls["n"] == 1


def test_raises_after_exhausting_retries():
    fn, calls = _flaky(["UNAVAILABLE: TPU device error"], fails=10)
    with pytest.raises(JaxRuntimeError):
        retry_on_device_error(fn, retries=2, backoff_s=0.0)
    assert calls["n"] == 3
