"""Keypoint structures and heatmap codecs
(reference ``detectron2/structures/keypoints.py:82,142``).

Keypoints are (N, K, 3) arrays (x, y, visibility); the codecs convert between
keypoint coordinates and per-RoI heatmaps for the keypoint head."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def keypoints_to_heatmap(
    keypoints: Array,  # (N, K, 3)
    boxes: Array,  # (N, 4) XYXY
    heatmap_size: int,
) -> Tuple[Array, Array]:
    """Returns (heatmap indices (N, K) int32 into S*S, valid (N, K) bool)
    — the training-target encoding (reference :82)."""
    x1, y1 = boxes[:, 0:1], boxes[:, 1:2]
    sw = heatmap_size / jnp.clip(boxes[:, 2:3] - x1, 1e-6, None)
    sh = heatmap_size / jnp.clip(boxes[:, 3:4] - y1, 1e-6, None)
    x = (keypoints[..., 0] - x1) * sw
    y = (keypoints[..., 1] - y1) * sh
    xi = jnp.clip(jnp.floor(x), 0, heatmap_size - 1).astype(jnp.int32)
    yi = jnp.clip(jnp.floor(y), 0, heatmap_size - 1).astype(jnp.int32)
    inside = (x >= 0) & (x < heatmap_size) & (y >= 0) & (y < heatmap_size)
    valid = inside & (keypoints[..., 2] > 0)
    return yi * heatmap_size + xi, valid


def heatmaps_to_keypoints(
    heatmaps: Array,  # (N, K, S, S) predicted logits
    boxes: Array,  # (N, 4)
) -> Array:
    """Decode heatmap argmax to (N, K, 3) keypoints (x, y, score)
    (reference :142)."""
    n, k, s, _ = heatmaps.shape
    flat = heatmaps.reshape(n, k, -1)
    idx = jnp.argmax(flat, axis=-1)
    score = jnp.max(jax.nn.softmax(flat, axis=-1), axis=-1)
    yi = (idx // s).astype(jnp.float32) + 0.5
    xi = (idx % s).astype(jnp.float32) + 0.5
    x1, y1 = boxes[:, 0:1], boxes[:, 1:2]
    bw = jnp.clip(boxes[:, 2:3] - x1, 1e-6, None)
    bh = jnp.clip(boxes[:, 3:4] - y1, 1e-6, None)
    x = x1 + xi / s * bw
    y = y1 + yi / s * bh
    return jnp.stack([x, y, score], axis=-1)
