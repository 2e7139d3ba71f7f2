"""Test configuration: CPU backend with a simulated 8-device mesh.

Multi-chip sharding paths are exercised via
XLA_FLAGS=--xla_force_host_platform_device_count=8 (SURVEY.md §4), so the
whole suite runs without TPU hardware.

NOTE: this image pre-imports jax from sitecustomize (axon TPU plugin), so
env vars set here are too late — jax.config.update is the effective knob.
Only one process can hold the TPU at a time; tests must stay on CPU.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
