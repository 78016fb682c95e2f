"""OOM-retry helper (reference ``detectron2/utils/memory.py:26``
``retry_if_cuda_oom``): retry an op after freeing cached device memory, then
fall back to CPU execution."""

from __future__ import annotations

import functools
import logging

logger = logging.getLogger(__name__)


def _is_oom(err: Exception) -> bool:
    text = str(err).upper()
    return "RESOURCE_EXHAUSTED" in text or "OUT OF MEMORY" in text or "OOM" in text


def retry_if_oom(func):
    """Call ``func``; on a device OOM, clear jax caches/live buffers we can
    and retry once; on a second OOM, retry on CPU."""

    @functools.wraps(func)
    def wrapped(*args, **kwargs):
        import jax

        try:
            return func(*args, **kwargs)
        except Exception as e:  # jaxlib raises XlaRuntimeError
            if not _is_oom(e):
                raise
            logger.warning("device OOM in %s; clearing caches and retrying", func)
            jax.clear_caches()
        try:
            return func(*args, **kwargs)
        except Exception as e:
            if not _is_oom(e):
                raise
            logger.warning("device OOM again; retrying %s on CPU", func)
            with jax.default_device(jax.devices("cpu")[0]):
                return func(*args, **kwargs)

    return wrapped
