"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding logic is tested on a virtual CPU mesh
(xla_force_host_platform_device_count) so no real pod is needed; the real
TPU chip is exercised by bench.py, not the unit tests.

The axon sitecustomize pins JAX_PLATFORMS=axon, so the env var alone is not
enough — we must update jax.config before any backend is initialized.
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
