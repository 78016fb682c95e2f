"""Box delta codec (Faster R-CNN parameterization).

Pure-functional equivalent of the reference ``Box2BoxTransform``
(``detectron2/modeling/box_regression.py:16``): deltas (dx, dy, dw, dh) between
source and target XYXY boxes, with per-coordinate weights and the standard
``scale_clamp`` on dw/dh at decode time. RoI-head weights are (10, 10, 5, 5),
RPN weights are (1, 1, 1, 1).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp

Array = jnp.ndarray

# log(1000 / 16): clamp for predicted dw/dh so exp() cannot overflow
SCALE_CLAMP = math.log(1000.0 / 16.0)


def _box_ctr_wh(boxes: Array) -> Tuple[Array, Array, Array, Array]:
    widths = boxes[..., 2] - boxes[..., 0]
    heights = boxes[..., 3] - boxes[..., 1]
    ctr_x = boxes[..., 0] + 0.5 * widths
    ctr_y = boxes[..., 1] + 0.5 * heights
    return ctr_x, ctr_y, widths, heights


def get_deltas(
    src_boxes: Array,
    target_boxes: Array,
    weights: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0),
) -> Array:
    """Encode target boxes relative to source boxes. (..., 4) x (..., 4) -> (..., 4).

    Padded/degenerate source boxes (non-positive size) are guarded so the op is
    total under jit; callers mask out those slots downstream.
    """
    sx, sy, sw, sh = _box_ctr_wh(src_boxes)
    tx, ty, tw, th = _box_ctr_wh(target_boxes)
    sw_safe = jnp.where(sw > 0, sw, 1.0)
    sh_safe = jnp.where(sh > 0, sh, 1.0)
    tw_safe = jnp.where(tw > 0, tw, 1.0)
    th_safe = jnp.where(th > 0, th, 1.0)
    wx, wy, ww, wh = weights
    dx = wx * (tx - sx) / sw_safe
    dy = wy * (ty - sy) / sh_safe
    dw = ww * jnp.log(tw_safe / sw_safe)
    dh = wh * jnp.log(th_safe / sh_safe)
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def apply_deltas(
    deltas: Array,
    boxes: Array,
    weights: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0),
    scale_clamp: float = SCALE_CLAMP,
) -> Array:
    """Decode deltas on top of boxes.

    deltas: (..., K*4) for K classes (or K=1), boxes: (..., 4).
    Returns boxes of the same shape as ``deltas``.
    """
    orig_shape = deltas.shape
    k4 = orig_shape[-1]
    assert k4 % 4 == 0, k4
    deltas = deltas.reshape(orig_shape[:-1] + (k4 // 4, 4))
    sx, sy, sw, sh = _box_ctr_wh(boxes)
    wx, wy, ww, wh = weights
    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = jnp.minimum(deltas[..., 2] / ww, scale_clamp)
    dh = jnp.minimum(deltas[..., 3] / wh, scale_clamp)

    pred_ctr_x = dx * sw[..., None] + sx[..., None]
    pred_ctr_y = dy * sh[..., None] + sy[..., None]
    pred_w = jnp.exp(dw) * sw[..., None]
    pred_h = jnp.exp(dh) * sh[..., None]

    out = jnp.stack(
        [
            pred_ctr_x - 0.5 * pred_w,
            pred_ctr_y - 0.5 * pred_h,
            pred_ctr_x + 0.5 * pred_w,
            pred_ctr_y + 0.5 * pred_h,
        ],
        axis=-1,
    )
    return out.reshape(orig_shape)
