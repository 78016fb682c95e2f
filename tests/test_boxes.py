"""Structure-layer tests mirroring the reference's tests/test_boxes.py strategy:
tiny hand-computed golden cases + property checks."""

import jax.numpy as jnp
import numpy as np

from proben_tpu.structures import (
    BoxMode,
    box_area,
    clip_boxes,
    convert_box_mode,
    nonempty_boxes,
    pairwise_iou,
)


def test_box_mode_roundtrip():
    xywh = np.array([[10.0, 20.0, 30.0, 40.0]])
    xyxy = convert_box_mode(xywh, BoxMode.XYWH_ABS, BoxMode.XYXY_ABS)
    np.testing.assert_allclose(xyxy, [[10, 20, 40, 60]])
    back = convert_box_mode(xyxy, BoxMode.XYXY_ABS, BoxMode.XYWH_ABS)
    np.testing.assert_allclose(back, xywh)


def test_area_and_nonempty():
    boxes = jnp.array([[0.0, 0.0, 10.0, 5.0], [3.0, 3.0, 3.0, 8.0]])
    np.testing.assert_allclose(box_area(boxes), [50.0, 0.0])
    np.testing.assert_array_equal(nonempty_boxes(boxes), [True, False])


def test_clip():
    boxes = jnp.array([[-5.0, -5.0, 105.0, 45.0]])
    clipped = clip_boxes(boxes, (40, 100))  # H=40, W=100
    np.testing.assert_allclose(clipped, [[0, 0, 100, 40]])


def test_pairwise_iou_golden():
    a = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    b = jnp.array(
        [
            [0.0, 0.0, 10.0, 10.0],  # identical -> 1
            [5.0, 5.0, 15.0, 15.0],  # quarter overlap: 25/(100+100-25)
            [20.0, 20.0, 30.0, 30.0],  # disjoint -> 0
            [0.0, 0.0, 0.0, 0.0],  # degenerate -> 0, not NaN
        ]
    )
    iou = np.asarray(pairwise_iou(a, b))
    np.testing.assert_allclose(iou[0], [1.0, 25.0 / 175.0, 0.0, 0.0], atol=1e-6)
    assert np.isfinite(iou).all()


def test_pairwise_iou_matches_naive_random():
    rng = np.random.RandomState(0)
    pts = rng.rand(50, 4) * 100
    boxes1 = np.stack(
        [np.minimum(pts[:, 0], pts[:, 2]), np.minimum(pts[:, 1], pts[:, 3]),
         np.maximum(pts[:, 0], pts[:, 2]), np.maximum(pts[:, 1], pts[:, 3])], axis=1)
    pts = rng.rand(30, 4) * 100
    boxes2 = np.stack(
        [np.minimum(pts[:, 0], pts[:, 2]), np.minimum(pts[:, 1], pts[:, 3]),
         np.maximum(pts[:, 0], pts[:, 2]), np.maximum(pts[:, 1], pts[:, 3])], axis=1)

    def naive(b1, b2):
        out = np.zeros((len(b1), len(b2)))
        for i, x in enumerate(b1):
            for j, y in enumerate(b2):
                ix = max(0, min(x[2], y[2]) - max(x[0], y[0]))
                iy = max(0, min(x[3], y[3]) - max(x[1], y[1]))
                inter = ix * iy
                ua = (x[2] - x[0]) * (x[3] - x[1]) + (y[2] - y[0]) * (y[3] - y[1]) - inter
                out[i, j] = inter / ua if ua > 0 else 0.0
        return out

    got = np.asarray(pairwise_iou(jnp.asarray(boxes1), jnp.asarray(boxes2)))
    np.testing.assert_allclose(got, naive(boxes1, boxes2), atol=1e-5)
