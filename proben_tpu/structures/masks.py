"""Mask structures (reference ``detectron2/structures/masks.py``:
BitMasks / PolygonMasks) and mask pasting (``layers/mask_ops.py``
paste_masks_in_image).

Host-side rasterization uses cv2 (the vendored pycocotools Cython RLE codec
is replaced by the pure-python RLE in evaluation-free paths); the paste op is
pure-jnp bilinear sampling so it runs under jit.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


class PolygonMasks:
    """List-of-polygons per instance, host-side (XYXY abs coordinates)."""

    def __init__(self, polygons: Sequence[Sequence[np.ndarray]]):
        self.polygons = [
            [np.asarray(p, np.float64).reshape(-1) for p in per_instance]
            for per_instance in polygons
        ]

    def __len__(self):
        return len(self.polygons)

    def rasterize(self, boxes: np.ndarray, mask_size: int) -> np.ndarray:
        """Crop+rasterize each instance's polygons inside its box to a
        (N, S, S) uint8 array (reference PolygonMasks.crop_and_resize)."""
        import cv2

        out = np.zeros((len(self), mask_size, mask_size), np.uint8)
        for i, (polys, box) in enumerate(zip(self.polygons, boxes)):
            x1, y1, x2, y2 = box
            w = max(x2 - x1, 0.1)
            h = max(y2 - y1, 0.1)
            canvas = np.zeros((mask_size, mask_size), np.uint8)
            for p in polys:
                pts = p.reshape(-1, 2).copy()
                pts[:, 0] = (pts[:, 0] - x1) * mask_size / w
                pts[:, 1] = (pts[:, 1] - y1) * mask_size / h
                cv2.fillPoly(canvas, [np.round(pts).astype(np.int32)], 1)
            out[i] = canvas
        return out

    def area(self) -> np.ndarray:
        areas = []
        for polys in self.polygons:
            a = 0.0
            for p in polys:
                pts = p.reshape(-1, 2)
                x, y = pts[:, 0], pts[:, 1]
                a += 0.5 * abs(np.dot(x, np.roll(y, 1)) - np.dot(y, np.roll(x, 1)))
            areas.append(a)
        return np.asarray(areas)


class BitMasks:
    """(N, H, W) boolean masks (host or device)."""

    def __init__(self, tensor):
        self.tensor = tensor

    def __len__(self):
        return self.tensor.shape[0]

    def area(self):
        return self.tensor.reshape(len(self), -1).sum(axis=1)

    def nonempty(self):
        return self.area() > 0

    def get_bounding_boxes(self) -> np.ndarray:
        t = np.asarray(self.tensor)
        n, h, w = t.shape
        boxes = np.zeros((n, 4), np.float32)
        for i in range(n):
            ys, xs = np.nonzero(t[i])
            if len(xs):
                boxes[i] = [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]
        return boxes


def paste_masks_in_image(
    masks: Array,  # (N, S, S) float mask logits/probs in box-local coords
    boxes: Array,  # (N, 4) XYXY in image coords
    image_shape: Tuple[int, int],
    threshold: float = 0.5,
) -> Array:
    """Paste per-box masks into full-image masks (reference ``mask_ops.py``),
    as vectorized bilinear sampling — jit-friendly, fixed output (N, H, W)."""
    n, s, _ = masks.shape
    h, w = image_shape
    ys = jnp.arange(h, dtype=jnp.float32) + 0.5
    xs = jnp.arange(w, dtype=jnp.float32) + 0.5

    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    bw = jnp.clip(x2 - x1, 1e-3, None)
    bh = jnp.clip(y2 - y1, 1e-3, None)
    # image pixel centers -> mask-local continuous coords
    gx = (xs[None, :] - x1[:, None]) / bw[:, None] * s - 0.5  # (N, W)
    gy = (ys[None, :] - y1[:, None]) / bh[:, None] * s - 0.5  # (N, H)

    def sample_one(mask, gy_i, gx_i):
        y0 = jnp.clip(jnp.floor(gy_i), 0, s - 1)
        x0 = jnp.clip(jnp.floor(gx_i), 0, s - 1)
        y1_ = jnp.clip(y0 + 1, 0, s - 1)
        x1_ = jnp.clip(x0 + 1, 0, s - 1)
        ly = jnp.clip(gy_i - y0, 0.0, 1.0)
        lx = jnp.clip(gx_i - x0, 0.0, 1.0)
        y0, x0, y1_, x1_ = (v.astype(jnp.int32) for v in (y0, x0, y1_, x1_))
        v00 = mask[y0[:, None], x0[None, :]]
        v01 = mask[y0[:, None], x1_[None, :]]
        v10 = mask[y1_[:, None], x0[None, :]]
        v11 = mask[y1_[:, None], x1_[None, :]]
        top = v00 * (1 - lx)[None, :] + v01 * lx[None, :]
        bot = v10 * (1 - lx)[None, :] + v11 * lx[None, :]
        val = top * (1 - ly)[:, None] + bot * ly[:, None]
        inside = (
            (gy_i >= -0.5)[:, None]
            & (gy_i <= s - 0.5)[:, None]
            & (gx_i >= -0.5)[None, :]
            & (gx_i <= s - 0.5)[None, :]
        )
        return jnp.where(inside, val, 0.0)

    pasted = jax.vmap(sample_one)(masks, gy, gx)  # (N, H, W)
    return pasted >= threshold if threshold is not None else pasted
