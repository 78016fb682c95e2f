"""Balanced positive/negative sampling with static shapes.

Equivalent of the reference ``detectron2/modeling/sampling.py:7``
(``subsample_labels``): pick up to ``num_samples * positive_fraction``
positives and fill the rest with negatives, uniformly at random. The reference
returns dynamic-length index tensors; here everything is fixed-shape:
``subsample_labels`` rewrites the label vector (non-sampled -> -1), and
``sample_topk_indices`` additionally returns a fixed-size index set for
gathering sampled proposals.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def _rank_within(mask: Array, key: jax.Array) -> Tuple[Array, Array]:
    """Random rank of each element within the True subset of ``mask``.

    Returns (rank (N,) int32 — 0-based among mask elements, count () int32).
    Elements outside the mask get rank >= count.
    """
    n = mask.shape[0]
    rand = jax.random.uniform(key, (n,))
    # masked elements sort first (by random value); others pushed to the end
    sort_key = jnp.where(mask, rand, 2.0 + rand)
    order = jnp.argsort(sort_key)
    rank = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    return rank, jnp.sum(mask.astype(jnp.int32))


def subsample_labels(
    labels: Array,  # (N,) int; 1=positive, 0=negative, -1=ignore
    num_samples: int,
    positive_fraction: float,
    key: jax.Array,
) -> Array:
    """Returns labels with non-sampled entries set to -1 (shape-preserving)."""
    pos_mask = labels == 1
    neg_mask = labels == 0
    kp, kn = jax.random.split(key)
    pos_rank, pos_count = _rank_within(pos_mask, kp)
    neg_rank, neg_count = _rank_within(neg_mask, kn)

    num_pos = jnp.minimum(pos_count, int(num_samples * positive_fraction))
    num_neg = jnp.minimum(neg_count, num_samples - num_pos)

    keep_pos = pos_mask & (pos_rank < num_pos)
    keep_neg = neg_mask & (neg_rank < num_neg)
    return jnp.where(keep_pos, 1, jnp.where(keep_neg, 0, -1)).astype(jnp.int32)


def sample_topk_indices(
    labels: Array,  # (N,) int; 1=positive, 0=negative, -1=ignore
    num_samples: int,
    positive_fraction: float,
    key: jax.Array,
) -> Tuple[Array, Array, Array]:
    """Fixed-size sampled index set, positives first.

    Returns:
        idx: (num_samples,) int32 indices into the input (unused slots -> 0)
        sampled_is_pos: (num_samples,) bool
        sampled_valid: (num_samples,) bool
    """
    sampled = subsample_labels(labels, num_samples, positive_fraction, key)
    is_pos = sampled == 1
    is_neg = sampled == 0
    chosen = is_pos | is_neg
    # priority: positives (0..1), then negatives (1..2), others huge
    n = labels.shape[0]
    rand = jax.random.uniform(jax.random.fold_in(key, 1), (n,))
    priority = jnp.where(is_pos, rand, jnp.where(is_neg, 1.0 + rand, 1e9))
    _, idx = jax.lax.top_k(-priority, num_samples)
    idx = idx.astype(jnp.int32)
    sampled_valid = chosen[idx]
    idx = jnp.where(sampled_valid, idx, 0)
    return idx, is_pos[idx] & sampled_valid, sampled_valid
