"""Exact top-k via radix select — a faster drop-in for ``jax.lax.top_k``.

TPU-native replacement for the reference's reliance on CUDA ``topk``/``sort``
(e.g. pre-NMS proposal selection, `detectron2/modeling/proposal_generator/
rpn_outputs.py:52-108`, and balanced sampling `modeling/sampling.py:7`).

``lax.top_k`` lowers to a sorting network on the VPU whose cost grows with
``N`` well past the data-read floor (measured 1.3-1.6 ms per (8, 204k)
tensor in the RPN train step). For N >> k the selection can instead be done
with a few histogram passes:

  1. map f32 -> orderable u32 (IEEE totalOrder: sign-flip trick),
  2. 4 rounds of 256-bin radix refinement find T = the k-th largest key
     (each round: one-hot bin counts of the surviving prefix class, reversed
     cumulative count, pick the bin containing rank ``rem``),
  3. the winners are {u > T} plus the first ``k - count_gt`` ties (u == T)
     in ascending index order — exactly ``lax.top_k``'s stable tie-break.
     Both sets are compacted WITHOUT an N-length cumsum or scatter: per-block
     counts + a small searchsorted per output rank, then an intra-block
     prefix over one gathered block per rank,
  4. a final ``lax.top_k`` over the k compacted candidates (trivial size)
     restores exact (value desc, index asc) output order.

Exactness: output matches ``lax.top_k(x, k)`` bit-for-bit for all finite
and infinite inputs, including arbitrary duplicate runs (ties resolved by
ascending index, verified against ``lax.top_k`` in tests/test_topk.py).
NaN inputs follow the same total order as XLA's comparator (NaN sorts above
+inf, -NaN below -inf).

The fast path engages for 1-D/2-D f32 with N >= max(4096, 16k); anything
else falls through to ``lax.top_k`` unchanged.

STATUS — not wired into the model paths. Standalone on a v5e the radix
select beats ``lax.top_k`` ~2x at the RPN sampler shape ((8, 204624) k=256:
34.3 vs 64.4 ms incl. tunnel overhead), but swapped into the batch-8 R101
TRAIN STEP it REGRESSED the step 140 -> 148 ms: inside the big program
XLA's TopK emitter overlaps with neighbouring work while the fori_loop
histogram serializes. Kept as a library op (and as the measurement record)
for standalone/host-path uses; model code keeps ``lax.top_k``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray

_BLOCK = 256  # compaction block; N is padded to a multiple of this


def _orderable(x: Array) -> Array:
    """f32 -> u32 preserving IEEE totalOrder (ascending)."""
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    neg = bits >> 31 == 1
    return jnp.where(neg, ~bits, bits | jnp.uint32(0x80000000))


def _radix_threshold(u: Array, k: int) -> Tuple[Array, Array]:
    """(T, count_gt): the k-th largest key of ``u`` (1-D) and |{u > T}|.

    Eight rounds of nibble-wise refinement, high nibble first (16 bins keeps
    the per-element histogram work at 8x16 compares — a 256-bin version is
    4x more VPU ops for half the rounds and measured slower). Invariant: the
    k-th largest key starts with ``prefix`` in the nibbles fixed so far and
    is the ``rem``-th largest among keys sharing that prefix.
    """
    bins = jnp.arange(16, dtype=jnp.uint32)

    def round_fn(r, carry):
        prefix, rem, count_gt_acc = carry
        shift = (7 - r) * 4
        # mask of the nibbles fixed in previous rounds (empty in round 0;
        # the shift amount is clamped because its value is unused then)
        hi = jnp.minimum(shift + 4, 31)
        high_mask = jnp.where(
            r == 0, jnp.uint32(0), (jnp.uint32(0xFFFFFFFF) << hi).astype(jnp.uint32)
        )
        alive = (u & high_mask) == (prefix & high_mask)
        nib = jnp.where(alive, (u >> shift) & jnp.uint32(0xF), jnp.uint32(16))
        counts = jnp.sum(
            nib[:, None] == bins[None, :], axis=0, dtype=jnp.int32
        )  # (16,)
        # csum[b] = #keys with this prefix and nibble >= b (decreasing in b)
        csum = jnp.cumsum(counts[::-1])[::-1]
        chosen = jnp.sum((csum >= rem).astype(jnp.int32)) - 1  # largest such b
        above = jnp.where(chosen < 15, csum[jnp.minimum(chosen + 1, 15)], 0)
        prefix = prefix | (chosen.astype(jnp.uint32) << shift)
        return prefix, rem - above, count_gt_acc + above

    prefix, rem, count_gt = jax.lax.fori_loop(
        0, 8, round_fn, (jnp.uint32(0), jnp.int32(k), jnp.int32(0))
    )
    return prefix, count_gt


def _block_compact(sel: Array, k: int) -> Array:
    """Indices (ascending) of the first ``k`` True entries of ``sel`` (1-D,
    length divisible by _BLOCK) without an N-cumsum or N-scatter: per-block
    counts -> block prefix -> searchsorted per rank -> intra-block prefix on
    ONE gathered block per rank. Ranks beyond the True count return garbage
    (callers mask)."""
    n = sel.shape[0]
    nb = n // _BLOCK
    blocks = sel.reshape(nb, _BLOCK)
    bcount = jnp.sum(blocks, axis=1, dtype=jnp.int32)
    bcsum = jnp.cumsum(bcount)  # (nb,) inclusive
    ranks = jnp.arange(k, dtype=jnp.int32)
    blk = jnp.searchsorted(bcsum, ranks + 1, side="left").astype(jnp.int32)
    blk = jnp.minimum(blk, nb - 1)
    # rank within the chosen block
    prev = jnp.where(blk > 0, bcsum[jnp.maximum(blk - 1, 0)], 0)
    local_rank = ranks - prev
    rows = blocks[blk]  # (k, _BLOCK)
    local_csum = jnp.cumsum(rows.astype(jnp.int32), axis=1)
    local_idx = jnp.sum(
        (local_csum <= local_rank[:, None]).astype(jnp.int32), axis=1
    )
    local_idx = jnp.minimum(local_idx, _BLOCK - 1)
    return blk * _BLOCK + local_idx


def _topk_1d(x: Array, k: int) -> Tuple[Array, Array]:
    n = x.shape[0]
    pad = (-n) % _BLOCK
    if pad:
        x_p = jnp.pad(x, (0, pad), constant_values=-jnp.inf)
    else:
        x_p = x
    u = _orderable(x_p)
    if pad:
        # padded slots must never win: force below every real key
        u = u.at[n:].set(jnp.uint32(0))
    t, count_gt = _radix_threshold(u, k)

    idx_gt = _block_compact(u > t, k)
    idx_eq = _block_compact(u == t, k)
    j = jnp.arange(k, dtype=jnp.int32)
    idx = jnp.where(j < count_gt, idx_gt, idx_eq[jnp.maximum(j - count_gt, 0)])
    vals = x_p[idx]
    # exact output order: value desc, index asc on ties. The candidates are
    # already index-ascending within the gt and eq groups, and every gt value
    # strictly exceeds every eq value, so a stable small top_k finishes it.
    vals_s, perm = jax.lax.top_k(vals, k)
    return vals_s, idx[perm].astype(jnp.int32)


def topk(x: Array, k: int) -> Tuple[Array, Array]:
    """Drop-in ``lax.top_k`` (values, indices), radix-select fast path.

    Fast path: f32, selection axis is last, N >= max(4096, 16k) (below that
    ratio the ~5 histogram/compaction passes cost more than the sort);
    otherwise delegates to ``lax.top_k``.
    """
    n = x.shape[-1]
    if x.dtype != jnp.float32 or k >= n or n < max(4096, 16 * k):
        return jax.lax.top_k(x, k)
    fn = _topk_1d
    for _ in range(x.ndim - 1):
        fn = jax.vmap(fn, in_axes=(0, None))
    return fn(x, k)
