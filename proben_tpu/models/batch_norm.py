"""Batch normalization variants (reference ``detectron2/layers/batch_norm.py``).

* FrozenBN (:14) is a folded affine — see ``layers.affine``/``fold_batchnorm``.
* ``sync_batch_norm`` replaces NaiveSyncBatchNorm (:163): instead of
  autograd-wrapped dist.all_reduce of mean/meansqr, statistics are reduced
  with ``lax.pmean`` over the data mesh axis — the SPMD-native equivalent
  (differentiable for free, no custom autograd).
* ``precise_bn_stats`` recomputes running statistics over N batches
  (the PreciseBN hook, reference ``engine/hooks.py:358``).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def init_batch_norm(channels: int) -> Dict:
    return {
        "weight": jnp.ones((channels,), jnp.float32),
        "bias": jnp.zeros((channels,), jnp.float32),
        "running_mean": jnp.zeros((channels,), jnp.float32),
        "running_var": jnp.ones((channels,), jnp.float32),
    }


def sync_batch_norm(
    x: Array,  # (N, H, W, C)
    params: Dict,
    training: bool = True,
    axis_name: Optional[str] = None,  # mesh axis for cross-device stats
    momentum: float = 0.1,
    eps: float = 1e-5,
) -> Tuple[Array, Dict]:
    """Returns (normalized x, updated params). Under ``shard_map``/``pmap``
    with ``axis_name`` set, the statistics are global across devices (SyncBN);
    without it, per-device (plain BN)."""
    if training:
        mean = jnp.mean(x, axis=(0, 1, 2))
        meansqr = jnp.mean(x * x, axis=(0, 1, 2))
        if axis_name is not None:
            mean = jax.lax.pmean(mean, axis_name)
            meansqr = jax.lax.pmean(meansqr, axis_name)
        var = meansqr - mean * mean
        new_params = dict(params)
        new_params["running_mean"] = (
            (1 - momentum) * params["running_mean"] + momentum * mean
        )
        new_params["running_var"] = (
            (1 - momentum) * params["running_var"] + momentum * var
        )
    else:
        mean, var = params["running_mean"], params["running_var"]
        new_params = params
    inv = jax.lax.rsqrt(var + eps) * params["weight"]
    out = x * inv.astype(x.dtype) + (params["bias"] - mean * inv).astype(x.dtype)
    return out, new_params


def precise_bn_stats(stats_list):
    """Average per-batch (mean, var) pairs into precise running statistics
    (the PreciseBN recomputation)."""
    means = jnp.stack([m for m, _ in stats_list])
    vars_ = jnp.stack([v for _, v in stats_list])
    mean = jnp.mean(means, axis=0)
    # law of total variance across batches
    var = jnp.mean(vars_, axis=0) + jnp.mean(means * means, axis=0) - mean * mean
    return mean, var
