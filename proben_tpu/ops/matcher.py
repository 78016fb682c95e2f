"""IoU matcher with low-quality-match recovery.

Functional equivalent of the reference ``detectron2/modeling/matcher.py:6``:
given an (M_gt, N_pred) match-quality matrix, assign each prediction the
best-matching GT and a label derived from threshold intervals, optionally
force-matching each GT's best prediction(s) (``allow_low_quality_matches``).

Padded GT rows are handled via ``gt_valid``: invalid rows can never match.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def match(
    quality: Array,  # (M, N) IoU of gt x predictions
    gt_valid: Array,  # (M,) bool
    thresholds: Sequence[float],
    labels: Sequence[int],
    allow_low_quality_matches: bool = False,
) -> Tuple[Array, Array]:
    """Returns (matched_idx (N,) int32 into gt rows, match_labels (N,) int8).

    ``labels`` has len(thresholds)+1 entries from the lowest interval up, each
    in {-1, 0, 1} (ignore / negative / positive), like the reference. With no
    valid GT, every prediction gets the lowest-interval label (background when
    labels[0] == 0).
    """
    assert len(labels) == len(thresholds) + 1
    m, n = quality.shape
    # invalid gt rows can never win the argmax
    masked_q = jnp.where(gt_valid[:, None], quality, -1.0)

    forced = None
    if m == 0:
        matched_vals = jnp.full((n,), -1.0)
        matched_idx = jnp.zeros((n,), jnp.int32)
    elif allow_low_quality_matches:
        # ONE variadic reduce over the gt axis computing (max, first-argmax,
        # any(is_best)) together: the separate argmax and any() reductions
        # each re-traversed (and re-fused the IoU compute of) the full
        # (M, N) matrix — at RPN scale (100, 204k) x batch 8 that was two
        # ~1.1-1.6 ms passes (docs/PERF.md round 3d). Exact semantics
        # preserved: max-with-lowest-index is associative/commutative and
        # equals jnp.argmax's first-occurrence tie-break.
        highest_per_gt = jnp.max(masked_q, axis=1, keepdims=True)  # (M, 1)
        is_best = (
            (masked_q >= highest_per_gt) & (highest_per_gt > 0) & gt_valid[:, None]
        )
        iota = jax.lax.broadcasted_iota(jnp.int32, masked_q.shape, 0)

        def combiner(acc, x):
            av, ai, af = acc
            xv, xi, xf = x
            better = (xv > av) | ((xv == av) & (xi < ai))
            return (
                jnp.where(better, xv, av),
                jnp.where(better, xi, ai),
                af | xf,
            )

        matched_vals, matched_idx, forced = jax.lax.reduce(
            (masked_q, iota, is_best),
            (jnp.float32(-jnp.inf), jnp.int32(2**31 - 1), jnp.asarray(False)),
            combiner,
            (0,),
        )
    else:
        matched_vals = jnp.max(masked_q, axis=0)
        matched_idx = jnp.argmax(masked_q, axis=0).astype(jnp.int32)

    match_labels = jnp.full((n,), labels[0], jnp.int8)
    lo = float("-inf")
    for threshold, label in zip(list(thresholds) + [float("inf")], labels):
        interval = (matched_vals >= lo) & (matched_vals < threshold)
        match_labels = jnp.where(interval, jnp.int8(label), match_labels)
        lo = threshold

    if forced is not None:
        # For each valid gt, predictions tying its max quality (if > 0) become fg.
        match_labels = jnp.where(forced, jnp.int8(1), match_labels)

    return matched_idx, match_labels
