"""Masks / keypoints / rotated-box structure tests (hand-computed cases)."""

import jax.numpy as jnp
import numpy as np

from proben_tpu.structures.keypoints import heatmaps_to_keypoints, keypoints_to_heatmap
from proben_tpu.structures.masks import BitMasks, PolygonMasks, paste_masks_in_image
from proben_tpu.structures.rotated_boxes import (
    area,
    corners,
    normalize_angles,
    pairwise_iou_rotated,
    to_axis_aligned,
)


def test_polygon_rasterize_and_area():
    # unit square polygon 10..30
    poly = PolygonMasks([[np.array([10, 10, 30, 10, 30, 30, 10, 30])]])
    np.testing.assert_allclose(poly.area(), [400.0])
    boxes = np.array([[10.0, 10.0, 30.0, 30.0]])
    m = poly.rasterize(boxes, 8)
    assert m.shape == (1, 8, 8)
    assert m.mean() > 0.9  # box-filling polygon rasterizes to ~all ones


def test_bitmasks():
    t = np.zeros((2, 10, 12), bool)
    t[0, 2:5, 3:7] = True
    bm = BitMasks(t)
    np.testing.assert_array_equal(bm.area(), [12, 0])
    np.testing.assert_array_equal(bm.nonempty(), [True, False])
    np.testing.assert_allclose(bm.get_bounding_boxes()[0], [3, 2, 7, 5])


def test_paste_masks():
    masks = jnp.ones((1, 4, 4))
    boxes = jnp.array([[4.0, 4.0, 12.0, 12.0]])
    out = np.asarray(paste_masks_in_image(masks, boxes, (16, 16)))
    assert out.shape == (1, 16, 16)
    assert out[0, 8, 8]  # center inside
    assert not out[0, 1, 1]  # outside box
    assert not out[0, 14, 14]


def test_keypoint_heatmap_roundtrip():
    boxes = jnp.array([[10.0, 10.0, 50.0, 50.0]])
    kpts = jnp.array([[[20.0, 30.0, 2.0], [5.0, 5.0, 2.0]]])  # 2nd outside box
    idx, valid = keypoints_to_heatmap(kpts, boxes, 14)
    assert np.asarray(valid).tolist() == [[True, False]]
    # decode: heatmap with a peak at that index recovers the bin's location
    hm = np.full((1, 2, 14, 14), -10.0, np.float32)
    flat_idx = int(np.asarray(idx)[0, 0])
    hm[0, 0, flat_idx // 14, flat_idx % 14] = 10.0
    dec = np.asarray(heatmaps_to_keypoints(jnp.asarray(hm), boxes))
    # bin width = 40/14 ~ 2.86: decoded to bin center, within one bin
    assert abs(dec[0, 0, 0] - 20.0) < 3.0
    assert abs(dec[0, 0, 1] - 30.0) < 3.0


def test_rotated_box_ops():
    b = jnp.array([[10.0, 10.0, 8.0, 4.0, 0.0], [0.0, 0.0, 2.0, 2.0, 450.0]])
    np.testing.assert_allclose(np.asarray(area(b)), [32.0, 4.0])
    nb = np.asarray(normalize_angles(b))
    assert nb[1, 4] == 90.0
    pts = np.asarray(corners(b[:1]))
    np.testing.assert_allclose(sorted(pts[0, :, 0]), [6, 6, 14, 14])
    aabb = np.asarray(to_axis_aligned(b[:1]))
    np.testing.assert_allclose(aabb[0], [6, 8, 14, 12])


def test_rotated_iou_golden():
    # identical boxes -> 1; 90-degree-rotated square -> 1; shifted -> known
    a = [[10, 10, 4, 4, 0]]
    np.testing.assert_allclose(pairwise_iou_rotated(a, a)[0, 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(
        pairwise_iou_rotated(a, [[10, 10, 4, 4, 90]])[0, 0], 1.0, atol=1e-6
    )
    # 45-degree square inscribed: intersection of axis square (area 16) and
    # same square rotated 45 (area 16): octagon area = 16*(2*sqrt(2)-2)
    iou_45 = pairwise_iou_rotated(a, [[10, 10, 4, 4, 45]])[0, 0]
    inter = 16 * (2 * np.sqrt(2) - 2)
    np.testing.assert_allclose(iou_45, inter / (32 - inter), atol=1e-6)
    # disjoint
    np.testing.assert_allclose(
        pairwise_iou_rotated(a, [[100, 100, 4, 4, 30]])[0, 0], 0.0
    )
