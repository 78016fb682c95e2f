"""Host-side image transforms (reference ``detectron2/data/transforms/transform_gen.py``).

Numpy/cv2 implementations of the two transforms on the ProbEn path:
``ResizeShortestEdge`` (:167) and ``RandomFlip`` (:115). Each returns the
transformed image plus a function mapping XYXY boxes to the new frame.
"""

from __future__ import annotations

import sys
from typing import Callable, Optional, Sequence, Tuple

import cv2
import numpy as np


def resize_shortest_edge_size(
    h: int, w: int, short: int, max_size: int
) -> Tuple[int, int]:
    """Target (new_h, new_w) (reference ResizeShortestEdge.get_transform)."""
    scale = short * 1.0 / min(h, w)
    if h < w:
        newh, neww = short, scale * w
    else:
        newh, neww = scale * h, short
    if max(newh, neww) > max_size:
        scale = max_size * 1.0 / max(newh, neww)
        newh, neww = newh * scale, neww * scale
    return int(newh + 0.5), int(neww + 0.5)


def resize_image(image: np.ndarray, new_h: int, new_w: int) -> np.ndarray:
    """Bilinear resize of an HWC image (any channel count)."""
    if image.shape[0] == new_h and image.shape[1] == new_w:
        return image
    out = cv2.resize(
        image.astype(np.float32), (new_w, new_h), interpolation=cv2.INTER_LINEAR
    )
    if out.ndim == 2:
        out = out[:, :, None]
    return out


def resize_boxes(boxes: np.ndarray, old_hw, new_hw) -> np.ndarray:
    sy = new_hw[0] / old_hw[0]
    sx = new_hw[1] / old_hw[1]
    return boxes * np.array([sx, sy, sx, sy], boxes.dtype)


def hflip_image(image: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(image[:, ::-1])


def hflip_boxes(boxes: np.ndarray, width: float) -> np.ndarray:
    out = boxes.copy()
    out[:, 0] = width - boxes[:, 2]
    out[:, 2] = width - boxes[:, 0]
    return out


def random_crop(
    image: np.ndarray,
    boxes: np.ndarray,
    crop_size: Tuple[float, float],
    rng: np.random.RandomState,
) -> Tuple[np.ndarray, np.ndarray]:
    """Relative-range random crop (reference RandomCrop "relative_range"):
    crop h, w sampled in [crop_size, 1] fractions of the image."""
    h, w = image.shape[:2]
    ch = int(h * (crop_size[0] + (1 - crop_size[0]) * rng.rand()) + 0.5)
    cw = int(w * (crop_size[1] + (1 - crop_size[1]) * rng.rand()) + 0.5)
    y0 = rng.randint(0, h - ch + 1)
    x0 = rng.randint(0, w - cw + 1)
    image = image[y0 : y0 + ch, x0 : x0 + cw]
    boxes = boxes - np.array([x0, y0, x0, y0], boxes.dtype)
    return np.ascontiguousarray(image), boxes


class TrainAugment:
    """[RandomCrop] + ResizeShortestEdge(choice) + RandomFlip(horizontal 0.5)."""

    def __init__(
        self,
        short_sides: Sequence[int] = (640, 672, 704, 736, 768, 800),
        max_size: int = 1333,
        flip: bool = True,
        rng: Optional[np.random.RandomState] = None,
        crop: Optional[Tuple[float, float]] = None,  # relative_range crop size
    ):
        self.short_sides = list(short_sides)
        self.max_size = max_size
        self.flip = flip
        self.crop = crop
        self.rng = rng or np.random.RandomState()

    def __call__(
        self, image: np.ndarray, boxes: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray]:
        if self.crop is not None:
            image, boxes = random_crop(image, boxes, self.crop, self.rng)
        h, w = image.shape[:2]
        short = self.short_sides[self.rng.randint(len(self.short_sides))]
        nh, nw = resize_shortest_edge_size(h, w, short, self.max_size)
        image = resize_image(image, nh, nw)
        boxes = resize_boxes(boxes, (h, w), (nh, nw))
        if self.flip and self.rng.rand() < 0.5:
            image = hflip_image(image)
            boxes = hflip_boxes(boxes, nw)
        return image, boxes


class TestResize:
    """Deterministic ResizeShortestEdge at test time (min=800, max=1333)."""

    def __init__(self, short_side: int = 800, max_size: int = 1333):
        self.short_side = short_side
        self.max_size = max_size

    def __call__(self, image: np.ndarray) -> Tuple[np.ndarray, Tuple[int, int]]:
        h, w = image.shape[:2]
        nh, nw = resize_shortest_edge_size(h, w, self.short_side, self.max_size)
        return resize_image(image, nh, nw), (nh, nw)
