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


def _pick_random_subset(mask: Array, key: jax.Array, k_static: int, limit) -> Array:
    """Keep-mask of ``limit`` (dynamic, <= k_static) uniformly random True
    elements of ``mask``. Uses top_k of iid uniforms with a BOUNDED k — a full
    argsort here cost ~20 ms/step at RPN anchor counts (204k x 8 images); the
    partial top-k is the same uniform-subset distribution at O(N log k)."""
    n = mask.shape[0]
    rand = jax.random.uniform(key, (n,))
    vals, idx = jax.lax.top_k(jnp.where(mask, rand, -1.0), k_static)
    sel = (jnp.arange(k_static) < limit) & (vals >= 0.0)
    return jnp.zeros((n,), bool).at[idx].set(sel)


def subsample_labels(
    labels: Array,  # (N,) int; 1=positive, 0=negative, -1=ignore
    num_samples: int,
    positive_fraction: float,
    key: jax.Array,
) -> Array:
    """Returns labels with non-sampled entries set to -1 (shape-preserving)."""
    labels = jax.lax.stop_gradient(labels)
    pos_mask = labels == 1
    neg_mask = labels == 0
    kp, kn = jax.random.split(key)

    pos_count = jnp.sum(pos_mask.astype(jnp.int32))
    neg_count = jnp.sum(neg_mask.astype(jnp.int32))
    num_pos = jnp.minimum(pos_count, int(num_samples * positive_fraction))
    num_neg = jnp.minimum(neg_count, num_samples - num_pos)

    k = min(num_samples, labels.shape[0])
    keep_pos = _pick_random_subset(pos_mask, kp, k, num_pos)
    keep_neg = _pick_random_subset(neg_mask, kn, k, num_neg)
    return jnp.where(keep_pos, 1, jnp.where(keep_neg, 0, -1)).astype(jnp.int32)


def sample_topk_indices(
    labels: Array,  # (N,) int; 1=positive, 0=negative, -1=ignore
    num_samples: int,
    positive_fraction: float,
    key: jax.Array,
) -> Tuple[Array, Array, Array]:
    """Fixed-size sampled index set, positives first.

    Ordering eligible elements by iid uniform priorities is a uniform random
    permutation, so the first ``num_pos`` positives (resp. ``num_neg``
    negatives) of the two top-k lists are exactly the reference's uniform
    subsets (``sampling.py:7``) — one random vector + two bounded top-ks
    replace the earlier three-top-k formulation (~1.3 ms each at 204k anchors
    x batch 8). Sharing one priority vector between positives and negatives is
    sound: the supports are disjoint, and disjoint coordinates of an iid
    vector are independent.

    Returns:
        idx: (num_samples,) int32 indices into the input (unused slots -> 0)
        sampled_is_pos: (num_samples,) bool
        sampled_valid: (num_samples,) bool
    """
    n = labels.shape[0]
    pos_mask = labels == 1
    neg_mask = labels == 0
    rand = jax.random.uniform(key, (n,))
    k = min(num_samples, n)

    pos_count = jnp.sum(pos_mask.astype(jnp.int32))
    neg_count = jnp.sum(neg_mask.astype(jnp.int32))
    num_pos = jnp.minimum(pos_count, int(num_samples * positive_fraction))
    num_neg = jnp.minimum(neg_count, num_samples - num_pos)

    # the positives list never needs more than the positive-fraction cap
    # (num_pos <= int(num_samples * positive_fraction)), so its top-k is
    # bounded by kp, not num_samples — at RPN scale the 204k-wide top-k's
    # cost scales with k
    kp = max(1, min(int(num_samples * positive_fraction), k))
    _, pidx = jax.lax.top_k(jnp.where(pos_mask, rand, -1.0), kp)
    _, nidx = jax.lax.top_k(jnp.where(neg_mask, rand, -1.0), k)

    j = jnp.arange(num_samples)
    take_pos = j < num_pos
    idx = jnp.where(
        take_pos,
        pidx[jnp.minimum(j, kp - 1)],
        nidx[jnp.clip(j - num_pos, 0, k - 1)],
    ).astype(jnp.int32)
    sampled_valid = j < (num_pos + num_neg)
    idx = jnp.where(sampled_valid, idx, 0)
    return idx, take_pos & sampled_valid, sampled_valid
