"""Box representations and pure-functional box ops.

TPU-native replacement for the reference `detectron2/structures/boxes.py`
(`Boxes`, `BoxMode`, `pairwise_iou`): instead of a tensor-wrapping class, boxes
are plain ``(..., 4)`` jnp arrays in XYXY absolute coordinates, and every op is
a pure function usable under ``jit``/``vmap``. Empty/padded boxes are handled
with explicit validity masks rather than dynamic filtering.
"""

from __future__ import annotations

import enum
from typing import Tuple, Union

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


class BoxMode(enum.IntEnum):
    """Coordinate conventions (mirrors reference ``structures/boxes.py:14``)."""

    XYXY_ABS = 0
    XYWH_ABS = 1
    XYXY_REL = 2
    XYWH_REL = 3


def convert_box_mode(box: Array, from_mode: BoxMode, to_mode: BoxMode) -> Array:
    """Convert boxes between XYXY_ABS and XYWH_ABS (the modes the pipeline uses).

    Works on numpy or jnp arrays of shape (..., 4).
    """
    if from_mode == to_mode:
        return box
    xp = jnp if isinstance(box, jnp.ndarray) else np
    if from_mode == BoxMode.XYWH_ABS and to_mode == BoxMode.XYXY_ABS:
        x, y, w, h = box[..., 0], box[..., 1], box[..., 2], box[..., 3]
        return xp.stack([x, y, x + w, y + h], axis=-1)
    if from_mode == BoxMode.XYXY_ABS and to_mode == BoxMode.XYWH_ABS:
        x1, y1, x2, y2 = box[..., 0], box[..., 1], box[..., 2], box[..., 3]
        return xp.stack([x1, y1, x2 - x1, y2 - y1], axis=-1)
    raise NotImplementedError(f"conversion {from_mode} -> {to_mode}")


def box_area(boxes: Array) -> Array:
    """Area of XYXY boxes, shape (..., 4) -> (...)."""
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def clip_boxes(boxes: Array, image_size: Tuple[Union[int, Array], Union[int, Array]]) -> Array:
    """Clip XYXY boxes to [0, W] x [0, H]. ``image_size`` is (H, W)."""
    h, w = image_size
    x1 = jnp.clip(boxes[..., 0], 0, w)
    y1 = jnp.clip(boxes[..., 1], 0, h)
    x2 = jnp.clip(boxes[..., 2], 0, w)
    y2 = jnp.clip(boxes[..., 3], 0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def nonempty_boxes(boxes: Array, threshold: float = 0.0) -> Array:
    """Mask of boxes with both sides > threshold (reference ``boxes.py`` nonempty)."""
    widths = boxes[..., 2] - boxes[..., 0]
    heights = boxes[..., 3] - boxes[..., 1]
    return (widths > threshold) & (heights > threshold)


def pairwise_intersection(boxes1: Array, boxes2: Array) -> Array:
    """Intersection areas between all pairs: (N, 4) x (M, 4) -> (N, M).

    Computed per coordinate: a stacked (N, M, 2) lt/rb intermediate forced
    XLA to materialize 1.3 GB/step at RPN scale (204k anchors x 100 gt x
    batch 8); with only (N, M) values the whole expression fuses into the
    IoU consumer.
    """
    iw = jnp.minimum(boxes1[:, None, 2], boxes2[None, :, 2]) - jnp.maximum(
        boxes1[:, None, 0], boxes2[None, :, 0]
    )
    ih = jnp.minimum(boxes1[:, None, 3], boxes2[None, :, 3]) - jnp.maximum(
        boxes1[:, None, 1], boxes2[None, :, 1]
    )
    return jnp.clip(iw, 0, None) * jnp.clip(ih, 0, None)


def pairwise_iou(boxes1: Array, boxes2: Array) -> Array:
    """IoU between all pairs: (N, 4) x (M, 4) -> (N, M).

    Matches reference ``structures/boxes.py:299``: IoU of a degenerate
    (zero-area) pair is 0, never NaN.
    """
    area1 = box_area(boxes1)  # (N,)
    area2 = box_area(boxes2)  # (M,)
    inter = pairwise_intersection(boxes1, boxes2)
    union = area1[:, None] + area2[None, :] - inter
    return jnp.where(inter > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)


def pairwise_ioa(boxes1: Array, boxes2: Array) -> Array:
    """Intersection over area of boxes2: (N, 4) x (M, 4) -> (N, M)."""
    area2 = box_area(boxes2)
    inter = pairwise_intersection(boxes1, boxes2)
    return jnp.where(inter > 0, inter / jnp.where(area2 > 0, area2, 1.0)[None, :], 0.0)


def box_centers(boxes: Array) -> Array:
    """Centers of XYXY boxes: (..., 4) -> (..., 2) as (cx, cy)."""
    return jnp.stack(
        [
            (boxes[..., 0] + boxes[..., 2]) * 0.5,
            (boxes[..., 1] + boxes[..., 3]) * 0.5,
        ],
        axis=-1,
    )
