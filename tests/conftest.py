"""Test configuration: run everything on a virtual 8-device CPU mesh.

The container's axon sitecustomize force-registers the TPU backend and
overrides JAX_PLATFORMS, so we must override via jax.config after import
(before any backend initialization). XLA_FLAGS must be set before the CPU
backend initializes to get 8 virtual devices for multi-chip sharding tests.

The persistent compilation cache (same mechanism as __graft_entry__ and
bench.py) makes repeat suite runs skip the model-compile cost — the heavy
e2e files (test_pipeline / test_model_e2e / test_trainer / test_graft_entry)
each compile near-identical tiny models, which dominates suite wall time on
this 1-core box.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

_cache_dir = os.path.expanduser("~/.cache/proben_tpu_xla")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
# cache even sub-second compiles: the suite's wall time is dominated by many
# small-to-medium model compiles (a 5 s floor left most of them uncached —
# 15 entries after a full run; the floor exists to bound disk, and the CPU
# cache stays tens of MB even at 1 s)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
