"""Anchor generation (static, computed with numpy at trace time).

Rebuild of reference ``detectron2/modeling/anchor_generator.py:59``
(DefaultAnchorGenerator). Anchors are a pure function of static feature-map
shapes, so they become XLA constants — zero runtime cost.

Ordering parity: flattened (H, W, A) with anchor index fastest, matching the
reference's ``_grid_anchors`` + the RPN head's (N, A, H, W) -> (N, H, W, A)
permute-flatten, so imported checkpoints predict deltas for the same slots.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def cell_anchors(sizes: Sequence[float], aspect_ratios: Sequence[float]) -> np.ndarray:
    """(len(sizes)*len(aspect_ratios), 4) XYXY anchors centered at origin.

    Loop order: sizes outer, ratios inner (reference generate_cell_anchors).
    """
    out = []
    for size in sizes:
        area = size ** 2
        for ratio in aspect_ratios:
            w = np.sqrt(area / ratio)
            h = ratio * w
            out.append([-w / 2.0, -h / 2.0, w / 2.0, h / 2.0])
    return np.asarray(out, np.float32)


def grid_anchors(
    feature_shape: Tuple[int, int],  # (H, W)
    stride: int,
    sizes: Sequence[float],
    aspect_ratios: Sequence[float],
    offset: float = 0.0,
) -> np.ndarray:
    """(H*W*A, 4) anchors for one level, A fastest."""
    h, w = feature_shape
    base = cell_anchors(sizes, aspect_ratios)  # (A, 4)
    shifts_x = (np.arange(w, dtype=np.float32) + offset) * stride
    shifts_y = (np.arange(h, dtype=np.float32) + offset) * stride
    shift_y, shift_x = np.meshgrid(shifts_y, shifts_x, indexing="ij")
    shifts = np.stack(
        [shift_x.ravel(), shift_y.ravel(), shift_x.ravel(), shift_y.ravel()], axis=1
    )  # (H*W, 4)
    anchors = shifts[:, None, :] + base[None, :, :]
    return anchors.reshape(-1, 4).astype(np.float32)


def multilevel_anchors(
    feature_shapes: Sequence[Tuple[int, int]],
    strides: Sequence[int],
    sizes_per_level: Sequence[Sequence[float]],
    aspect_ratios: Sequence[float],
    offset: float = 0.0,
) -> List[Array]:
    """Per-level anchors as jnp constants. Default ProbEn/FPN config:
    strides (4,8,16,32,64), sizes [[32],[64],[128],[256],[512]],
    ratios [0.5, 1.0, 2.0]."""
    assert len(feature_shapes) == len(strides) == len(sizes_per_level)
    return [
        jnp.asarray(grid_anchors(fs, st, sz, aspect_ratios, offset))
        for fs, st, sz in zip(feature_shapes, strides, sizes_per_level)
    ]
