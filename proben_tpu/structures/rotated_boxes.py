"""Rotated boxes (cx, cy, w, h, angle-degrees)
(reference ``detectron2/structures/rotated_boxes.py``).

The rotated detection family is a declared non-goal for the ProbEn path
(SURVEY §7); this module provides the structure ops (area, normalize-angle,
corner extraction, axis-aligned hull, scale/clip) plus an exact pairwise
rotated IoU via polygon clipping (vectorized numpy — used by tests and any
future rotated NMS)."""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

Array = jnp.ndarray


def area(boxes: Array) -> Array:
    return boxes[..., 2] * boxes[..., 3]


def normalize_angles(boxes: Array) -> Array:
    """Angles into (-180, 180] (reference normalize_angle)."""
    a = jnp.remainder(boxes[..., 4] + 180.0, 360.0) - 180.0
    a = jnp.where(a == -180.0, 180.0, a)
    return jnp.concatenate([boxes[..., :4], a[..., None]], axis=-1)


def corners(boxes) -> np.ndarray:
    """(N, 5) -> (N, 4, 2) corner coordinates (numpy or jnp)."""
    xp = jnp if isinstance(boxes, jnp.ndarray) else np
    cx, cy, w, h, ang = (boxes[..., i] for i in range(5))
    theta = ang * xp.pi / 180.0
    c, s = xp.cos(theta), xp.sin(theta)
    dx = xp.stack([-w / 2, w / 2, w / 2, -w / 2], axis=-1)
    dy = xp.stack([-h / 2, -h / 2, h / 2, h / 2], axis=-1)
    # note: image y grows downward; rotation by +angle is CCW in math coords
    x = cx[..., None] + dx * c[..., None] - dy * s[..., None]
    y = cy[..., None] + dx * s[..., None] + dy * c[..., None]
    return xp.stack([x, y], axis=-1)


def to_axis_aligned(boxes: Array) -> Array:
    """Axis-aligned hull XYXY of rotated boxes."""
    pts = corners(boxes)
    return jnp.concatenate(
        [pts.min(axis=-2), pts.max(axis=-2)], axis=-1
    )


def _polygon_area(pts: np.ndarray) -> float:
    x, y = pts[:, 0], pts[:, 1]
    return 0.5 * abs(np.dot(x, np.roll(y, 1)) - np.dot(y, np.roll(x, 1)))


def _clip_polygon(subject: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Sutherland-Hodgman clip of polygon by half-plane left of edge a->b."""
    out = []
    n = len(subject)
    for i in range(n):
        p, q = subject[i], subject[(i + 1) % n]
        side_p = (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0])
        side_q = (b[0] - a[0]) * (q[1] - a[1]) - (b[1] - a[1]) * (q[0] - a[0])
        if side_p >= 0:
            out.append(p)
        if (side_p >= 0) != (side_q >= 0):
            t = side_p / (side_p - side_q)
            out.append(p + t * (q - p))
    return np.asarray(out) if out else np.zeros((0, 2))


def pairwise_iou_rotated(boxes1, boxes2) -> np.ndarray:
    """Exact rotated IoU (host-side polygon clipping; reference
    ``csrc/box_iou_rotated``)."""
    b1 = np.asarray(boxes1, float).reshape(-1, 5)
    b2 = np.asarray(boxes2, float).reshape(-1, 5)
    c1 = np.asarray(corners(b1))
    c2 = np.asarray(corners(b2))
    a1 = b1[:, 2] * b1[:, 3]
    a2 = b2[:, 2] * b2[:, 3]
    def signed_area(pts):
        x, y = pts[:, 0], pts[:, 1]
        return 0.5 * (np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))

    out = np.zeros((len(b1), len(b2)))
    for i in range(len(b1)):
        for j in range(len(b2)):
            poly = c1[i]
            clipper = c2[j]
            # the half-plane test keeps points with positive cross product:
            # orient the clipper accordingly
            if signed_area(clipper) < 0:
                clipper = clipper[::-1]
            for k in range(4):
                poly_c = _clip_polygon(poly, clipper[k], clipper[(k + 1) % 4])
                poly = poly_c
                if len(poly) == 0:
                    break
            inter = _polygon_area(poly) if len(poly) >= 3 else 0.0
            union = a1[i] + a2[j] - inter
            out[i, j] = inter / union if union > 0 else 0.0
    return out
