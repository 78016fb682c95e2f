"""Matcher and subsampling tests (reference semantics: matcher.py, sampling.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from proben_tpu.ops import match, sample_topk_indices, subsample_labels


def test_matcher_rpn_thresholds():
    # RPN config: thresholds [0.3, 0.7], labels [0, -1, 1]
    quality = jnp.array(
        [
            [0.9, 0.5, 0.1, 0.75],
            [0.2, 0.6, 0.05, 0.1],
        ]
    )
    gt_valid = jnp.array([True, True])
    idx, labels = match(quality, gt_valid, [0.3, 0.7], [0, -1, 1])
    np.testing.assert_array_equal(np.asarray(idx), [0, 1, 0, 0])
    np.testing.assert_array_equal(np.asarray(labels), [1, -1, 0, 1])


def test_matcher_invalid_gt_rows_ignored():
    quality = jnp.array(
        [
            [0.9, 0.9, 0.9, 0.9],  # invalid row
            [0.2, 0.8, 0.05, 0.4],
        ]
    )
    gt_valid = jnp.array([False, True])
    idx, labels = match(quality, gt_valid, [0.5], [0, 1])
    np.testing.assert_array_equal(np.asarray(idx), [1, 1, 1, 1])
    np.testing.assert_array_equal(np.asarray(labels), [0, 1, 0, 0])


def test_matcher_all_gt_invalid_gives_background():
    quality = jnp.ones((2, 5))
    gt_valid = jnp.zeros((2,), bool)
    _, labels = match(quality, gt_valid, [0.5], [0, 1])
    np.testing.assert_array_equal(np.asarray(labels), [0] * 5)


def test_low_quality_match_recovery():
    # gt 0's best match (0.25) is below the fg threshold but must be forced fg
    quality = jnp.array(
        [
            [0.25, 0.1, 0.05],
            [0.1, 0.9, 0.2],
        ]
    )
    gt_valid = jnp.array([True, True])
    _, labels_no = match(quality, gt_valid, [0.3, 0.7], [0, -1, 1], False)
    _, labels_yes = match(quality, gt_valid, [0.3, 0.7], [0, -1, 1], True)
    assert np.asarray(labels_no)[0] == 0
    assert np.asarray(labels_yes)[0] == 1
    assert np.asarray(labels_yes)[1] == 1  # gt1's best


def test_subsample_respects_fraction_and_counts():
    key = jax.random.PRNGKey(0)
    labels = jnp.array([1] * 30 + [0] * 200 + [-1] * 26)
    out = np.asarray(subsample_labels(labels, 64, 0.5, key))
    assert (out == 1).sum() == 30  # fewer positives than budget -> all kept
    assert (out == 0).sum() == 34  # fill to 64
    # ignore slots stay ignored
    assert (out[230:] == -1).all()


def test_subsample_caps_positives():
    key = jax.random.PRNGKey(1)
    labels = jnp.array([1] * 100 + [0] * 100)
    out = np.asarray(subsample_labels(labels, 64, 0.25, key))
    assert (out == 1).sum() == 16
    assert (out == 0).sum() == 48


def test_sample_topk_indices_fixed_shape():
    key = jax.random.PRNGKey(2)
    labels = jnp.array([1] * 10 + [0] * 20 + [-1] * 2)
    idx, is_pos, valid = sample_topk_indices(labels, 16, 0.25, key)
    idx, is_pos, valid = map(np.asarray, (idx, is_pos, valid))
    assert idx.shape == (16,)
    assert valid.all()  # 30 candidates > 16 samples
    assert is_pos.sum() == 4  # 16 * 0.25
    labels_np = np.asarray(labels)
    assert (labels_np[idx[is_pos]] == 1).all()
    assert (labels_np[idx[~is_pos]] == 0).all()
    # positives come first
    assert is_pos[:4].all()


def test_sample_topk_underfull():
    key = jax.random.PRNGKey(3)
    labels = jnp.array([1] * 2 + [0] * 3 + [-1] * 20)
    idx, is_pos, valid = sample_topk_indices(labels, 16, 0.5, key)
    valid = np.asarray(valid)
    assert valid.sum() == 5
    assert np.asarray(is_pos).sum() == 2


def test_label_anchors_idx_consistent_with_label_anchors():
    """label_anchors (reference _get_ground_truth shape) and the
    gather-deferred label_anchors_idx used by rpn_losses must agree."""
    from proben_tpu.models.rpn import label_anchors, label_anchors_idx

    key = jax.random.PRNGKey(11)
    anchors = jax.random.uniform(key, (200, 4), minval=0.0, maxval=100.0)
    anchors = jnp.concatenate(
        [jnp.minimum(anchors[:, :2], anchors[:, 2:]),
         jnp.maximum(anchors[:, :2], anchors[:, 2:]) + 4.0], axis=1
    )
    gt = jnp.array([[10.0, 10.0, 40.0, 44.0], [60.0, 50.0, 90.0, 95.0],
                    [0.0, 0.0, 0.0, 0.0]])
    gt_valid = jnp.array([True, True, False])
    labels_a, matched_gt = label_anchors(anchors, gt, gt_valid)
    labels_b, matched_idx = label_anchors_idx(anchors, gt, gt_valid)
    np.testing.assert_array_equal(np.asarray(labels_a), np.asarray(labels_b))
    np.testing.assert_allclose(
        np.asarray(matched_gt), np.asarray(gt)[np.asarray(matched_idx)]
    )
