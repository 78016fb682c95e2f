"""IoU matcher with low-quality-match recovery.

Functional equivalent of the reference ``detectron2/modeling/matcher.py:6``:
given an (M_gt, N_pred) match-quality matrix, assign each prediction the
best-matching GT and a label derived from threshold intervals, optionally
force-matching each GT's best prediction(s) (``allow_low_quality_matches``).

Padded GT rows are handled via ``gt_valid``: invalid rows can never match.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

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
    matched_vals = jnp.max(masked_q, axis=0) if m > 0 else jnp.full((n,), -1.0)
    matched_idx = (
        jnp.argmax(masked_q, axis=0).astype(jnp.int32)
        if m > 0
        else jnp.zeros((n,), jnp.int32)
    )

    match_labels = jnp.full((n,), labels[0], jnp.int8)
    lo = float("-inf")
    for threshold, label in zip(list(thresholds) + [float("inf")], labels):
        interval = (matched_vals >= lo) & (matched_vals < threshold)
        match_labels = jnp.where(interval, jnp.int8(label), match_labels)
        lo = threshold

    if allow_low_quality_matches and m > 0:
        # For each valid gt, predictions tying its max quality (if > 0) become fg.
        highest_per_gt = jnp.max(masked_q, axis=1, keepdims=True)  # (M, 1)
        is_best = (masked_q >= highest_per_gt) & (highest_per_gt > 0) & gt_valid[:, None]
        forced = jnp.any(is_best, axis=0)  # (N,)
        match_labels = jnp.where(forced, jnp.int8(1), match_labels)

    return matched_idx, match_labels
