"""NMS tests: exact parity with a naive numpy greedy reference (the semantics
of torchvision NMS, which the reference wraps in detectron2/layers/nms.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from proben_tpu.ops import batched_nms_mask, nms_mask, nms_topk


def naive_greedy_nms(boxes, scores, iou_threshold):
    """Reference greedy NMS, suppress if IoU > threshold. Returns keep mask."""
    order = np.argsort(-scores, kind="stable")
    keep = np.zeros(len(boxes), bool)
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep[i] = True
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        union = area_i + areas - inter
        iou = np.where(inter > 0, inter / np.where(union > 0, union, 1), 0)
        newly = iou > iou_threshold
        newly[i] = False
        suppressed |= newly
    return keep


def _rand_boxes(rng, n, scale=100):
    xy = rng.rand(n, 2) * scale
    wh = rng.rand(n, 2) * scale * 0.3 + 1
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def test_simple_chain():
    # A suppresses B, B would suppress C, but B is gone -> keep A and C.
    boxes = np.array(
        [
            [0.0, 0.0, 10.0, 10.0],  # A score .9
            [1.0, 1.0, 11.0, 11.0],  # B score .8, IoU(A,B) high
            [8.0, 8.0, 18.0, 18.0],  # C score .7, overlaps B not A
        ],
        np.float32,
    )
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    keep = np.asarray(
        nms_mask(jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(3, bool), 0.3)
    )
    expected = naive_greedy_nms(boxes, scores, 0.3)
    np.testing.assert_array_equal(keep, expected)
    np.testing.assert_array_equal(keep, [True, False, True])


def test_random_parity_with_naive():
    rng = np.random.RandomState(3)
    for trial in range(5):
        n = 200
        boxes = _rand_boxes(rng, n)
        scores = rng.rand(n).astype(np.float32)
        for thresh in (0.3, 0.5, 0.7):
            keep = np.asarray(
                nms_mask(jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(n, bool), thresh)
            )
            expected = naive_greedy_nms(boxes, scores, thresh)
            np.testing.assert_array_equal(keep, expected)


def test_valid_mask_excludes_padding():
    boxes = np.array(
        [[0.0, 0.0, 10.0, 10.0], [0.0, 0.0, 10.0, 10.0], [0.0, 0.0, 10.0, 10.0]],
        np.float32,
    )
    scores = np.array([0.5, 0.9, 0.7], np.float32)
    valid = jnp.array([True, False, True])  # highest-scoring box is padding
    keep = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores), valid, 0.5))
    # box 2 (score .7) wins; box 0 suppressed; box 1 invalid
    np.testing.assert_array_equal(keep, [False, False, True])


def test_batched_nms_groups_do_not_interact():
    boxes = np.tile(np.array([[0.0, 0.0, 10.0, 10.0]], np.float32), (4, 1))
    scores = np.array([0.9, 0.8, 0.7, 0.6], np.float32)
    idxs = jnp.array([0, 0, 1, 1])
    keep = np.asarray(
        batched_nms_mask(jnp.asarray(boxes), jnp.asarray(scores), idxs, jnp.ones(4, bool), 0.5)
    )
    np.testing.assert_array_equal(keep, [True, False, True, False])


def test_batched_random_parity():
    rng = np.random.RandomState(7)
    n = 300
    boxes = _rand_boxes(rng, n)
    scores = rng.rand(n).astype(np.float32)
    idxs = rng.randint(0, 3, n)
    keep = np.asarray(
        batched_nms_mask(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(idxs), jnp.ones(n, bool), 0.5
        )
    )
    expected = np.zeros(n, bool)
    for c in range(3):
        m = idxs == c
        expected[m] = naive_greedy_nms(boxes[m], scores[m], 0.5)
    np.testing.assert_array_equal(keep, expected)


def test_nms_topk_sorted_and_padded():
    rng = np.random.RandomState(11)
    n = 100
    boxes = _rand_boxes(rng, n)
    scores = rng.rand(n).astype(np.float32)
    idx, valid = jax.jit(lambda b, s: nms_topk(b, s, jnp.ones(n, bool), 0.5, 20))(
        jnp.asarray(boxes), jnp.asarray(scores)
    )
    idx, valid = np.asarray(idx), np.asarray(valid)
    expected_mask = naive_greedy_nms(boxes, scores, 0.5)
    expected_order = np.argsort(-scores[expected_mask], kind="stable")
    expected_idx = np.flatnonzero(expected_mask)[expected_order][:20]
    nv = valid.sum()
    assert nv == min(20, expected_mask.sum())
    np.testing.assert_array_equal(idx[:nv], expected_idx[:nv])
