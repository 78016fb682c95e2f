"""Environment helpers (reference ``utils/env.py:15`` seed_all_rng and
``utils/collect_env.py:55``)."""

from __future__ import annotations

import datetime
import os
import random
import sys

import numpy as np


def seed_all_rng(seed: int = None) -> int:
    """Seed python/numpy RNGs (JAX is functional: thread the returned seed
    into jax.random.PRNGKey)."""
    if seed is None:
        seed = (
            os.getpid()
            + int(datetime.datetime.now().strftime("%S%f"))
            + int.from_bytes(os.urandom(2), "big")
        )
    np.random.seed(seed % (2 ** 31))
    random.seed(seed)
    return seed


def collect_env_info() -> str:
    import jax
    import jaxlib

    lines = [
        f"sys.platform: {sys.platform}",
        f"python: {sys.version.splitlines()[0]}",
        f"numpy: {np.__version__}",
        f"jax: {jax.__version__}",
        f"jaxlib: {jaxlib.__version__}",
        f"devices: {jax.devices()}",
        f"default backend: {jax.default_backend()}",
        f"process count: {jax.process_count()}",
    ]
    try:
        import flax
        import optax

        lines += [f"flax: {flax.__version__}", f"optax: {optax.__version__}"]
    except ImportError:
        pass
    return "\n".join(lines)
