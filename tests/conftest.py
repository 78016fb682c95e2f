"""Test configuration: run everything on a virtual 8-device CPU mesh.

The container's axon sitecustomize force-registers the TPU backend and
overrides JAX_PLATFORMS, so we must override via jax.config after import
(before any backend initialization). XLA_FLAGS must be set before the CPU
backend initializes to get 8 virtual devices for multi-chip sharding tests.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
