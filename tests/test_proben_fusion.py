"""ProbEn fusion tests: closed-form Bayesian cases, numpy-vs-jax parity on
random ensembles, and the reference's dispatch rules. The reference itself has
no fusion tests (SURVEY §4) — these are the closed-form cases it lacks."""

import jax.numpy as jnp
import numpy as np
import pytest

from proben_tpu.fusion import (
    bayesian_score_fusion,
    fuse_detections,
    fuse_detections_jax,
    fuse_multi_model,
)


def test_bayesian_fusion_two_agreeing_models():
    # two models, both 80% car (class 2 of 3): fused confidence must exceed 0.8
    p = np.array([[0.05, 0.05, 0.8], [0.05, 0.05, 0.8]])
    s, c = bayesian_score_fusion(p)
    assert c == 2
    assert s > 0.8
    # closed form: softmax of sum of logs = products: [.0025,.0025,.64,.01]
    prod = np.array([0.05 ** 2, 0.05 ** 2, 0.8 ** 2, 0.1 ** 2])
    np.testing.assert_allclose(s, (prod / prod.sum()).max(), rtol=1e-9)


def test_bayesian_fusion_disagreeing_models():
    p = np.array([[0.7, 0.1, 0.1], [0.1, 0.7, 0.1]])
    s, c = bayesian_score_fusion(p)
    prod = np.array([0.07, 0.07, 0.01, 0.1 * 0.1])
    np.testing.assert_allclose(s, (prod / prod.sum()).max(), rtol=1e-9)
    assert c in (0, 1)


def test_bayesian_fusion_single_member_is_softmax_renorm():
    p = np.array([[0.6, 0.2, 0.1]])
    s, c = bayesian_score_fusion(p)
    assert c == 0
    np.testing.assert_allclose(s, 0.6, rtol=1e-9)


def _random_model(rng, n, c=3, img=(640, 512)):
    xy = rng.rand(n, 2) * np.array([img[0] - 100, img[1] - 100])
    wh = rng.rand(n, 2) * 80 + 20
    boxes = np.concatenate([xy, xy + wh], 1)
    raw = rng.rand(n, c) + 0.1
    probs = raw / raw.sum(1, keepdims=True) * rng.uniform(0.7, 0.99, (n, 1))
    classes = probs.argmax(1)
    scores = probs.max(1)
    variances = rng.uniform(0.5, 2.0, n)
    return {
        "boxes": boxes,
        "scores": scores,
        "classes": classes,
        "probs": probs,
        "vars": variances,
    }


@pytest.mark.parametrize("score_method", ["probEn", "avg", "max"])
@pytest.mark.parametrize("box_method", ["v-avg", "s-avg", "avg", "argmax"])
def test_numpy_vs_jax_parity(score_method, box_method):
    seed = (["probEn", "avg", "max"].index(score_method) * 7
            + ["v-avg", "s-avg", "avg", "argmax"].index(box_method))
    rng = np.random.RandomState(seed)
    models = [_random_model(rng, n) for n in (12, 9, 7)]
    boxes = np.concatenate([m["boxes"] for m in models])
    scores = np.concatenate([m["scores"] for m in models])
    classes = np.concatenate([m["classes"] for m in models])
    probs = np.concatenate([m["probs"] for m in models])
    variances = np.concatenate([m["vars"] for m in models])

    nb, ns, nc = fuse_detections(
        boxes, scores, classes, probs, variances, score_method, box_method
    )

    # jax path with padding
    pad = 40
    n = len(boxes)
    jb = np.zeros((pad, 4), np.float32); jb[:n] = boxes
    js = np.zeros((pad,), np.float32); js[:n] = scores
    jc = np.zeros((pad,), np.int32); jc[:n] = classes
    jp = np.zeros((pad, 3), np.float32); jp[:n] = probs
    jv = np.ones((pad,), np.float32); jv[:n] = variances
    valid = np.arange(pad) < n
    ob, os_, oc, ov = fuse_detections_jax(
        jnp.asarray(jb), jnp.asarray(js), jnp.asarray(jc), jnp.asarray(jp),
        jnp.asarray(jv), jnp.asarray(valid),
        score_method=score_method, box_method=box_method, topk=pad,
    )
    ob, os_, oc, ov = map(np.asarray, (ob, os_, oc, ov))
    m = int(ov.sum())
    assert m == len(ns), (m, len(ns))
    np.testing.assert_allclose(os_[:m], ns, rtol=2e-4, atol=2e-5)
    np.testing.assert_array_equal(oc[:m], nc)
    np.testing.assert_allclose(ob[:m], nb, rtol=2e-4, atol=2e-3)


def test_dispatch_zero_and_one_model():
    empty = {"boxes": np.zeros((0, 4)), "scores": np.zeros(0), "classes": np.zeros(0),
             "probs": np.zeros((0, 3)), "vars": np.zeros(0)}
    rng = np.random.RandomState(0)
    m = _random_model(rng, 5)
    b, s, c = fuse_multi_model([empty, empty], "probEn", "v-avg")
    assert len(b) == 0
    # single present model: exact passthrough, no re-NMS
    b, s, c = fuse_multi_model([m, empty], "probEn", "v-avg")
    np.testing.assert_allclose(b, m["boxes"], rtol=1e-6)
    np.testing.assert_allclose(s, m["scores"], rtol=1e-6)


def test_max_argmax_is_plain_nms():
    rng = np.random.RandomState(1)
    m1, m2 = _random_model(rng, 8), _random_model(rng, 8)
    b, s, c = fuse_multi_model([m1, m2], "max", "argmax")
    # every output box must be one of the input boxes (no averaging)
    all_boxes = np.concatenate([m1["boxes"], m2["boxes"]])
    for bb in b:
        assert np.min(np.abs(all_boxes - bb).sum(1)) < 1e-3  # f32 output cast
    assert (np.diff(s) <= 1e-9).all()  # score-sorted


def test_identical_boxes_fuse_to_one():
    box = np.array([[100.0, 100.0, 200.0, 200.0]])
    m1 = {"boxes": box, "scores": np.array([0.9]), "classes": np.array([1]),
          "probs": np.array([[0.05, 0.9, 0.05]]), "vars": np.array([1.0])}
    m2 = {"boxes": box + 2.0, "scores": np.array([0.8]), "classes": np.array([1]),
          "probs": np.array([[0.1, 0.8, 0.1]]), "vars": np.array([4.0])}
    b, s, c = fuse_multi_model([m1, m2], "probEn", "v-avg")
    assert len(b) == 1
    assert c[0] == 1
    assert s[0] > 0.9  # agreement boosts confidence
    # v-avg: weights 1/1 and 1/4 -> fused box = (box*1 + (box+2)*0.25) / 1.25
    np.testing.assert_allclose(b[0], (box[0] + 2.0 * 0.2), rtol=1e-5)
