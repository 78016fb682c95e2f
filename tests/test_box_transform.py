"""Box delta codec tests: roundtrip, golden values, and clamp behavior,
mirroring reference tests/test_box2box_transform.py."""

import jax.numpy as jnp
import numpy as np

from proben_tpu.ops import apply_deltas, get_deltas

ROI_WEIGHTS = (10.0, 10.0, 5.0, 5.0)


def _rand_boxes(rng, n):
    xy = rng.rand(n, 2) * 100
    wh = rng.rand(n, 2) * 50 + 1
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def test_roundtrip_identity_weights():
    rng = np.random.RandomState(1)
    src = jnp.asarray(_rand_boxes(rng, 32))
    tgt = jnp.asarray(_rand_boxes(rng, 32))
    deltas = get_deltas(src, tgt)
    rec = apply_deltas(deltas, src)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(tgt), rtol=1e-4, atol=1e-3)


def test_roundtrip_roi_weights():
    rng = np.random.RandomState(2)
    src = jnp.asarray(_rand_boxes(rng, 32))
    tgt = jnp.asarray(_rand_boxes(rng, 32))
    deltas = get_deltas(src, tgt, ROI_WEIGHTS)
    rec = apply_deltas(deltas, src, ROI_WEIGHTS)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(tgt), rtol=1e-4, atol=1e-3)


def test_zero_deltas_identity():
    src = jnp.array([[10.0, 10.0, 30.0, 50.0]])
    rec = apply_deltas(jnp.zeros((1, 4)), src)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(src), atol=1e-5)


def test_golden_deltas():
    # src: ctr (20,30), w=20, h=40; tgt: ctr (25,20), w=40, h=20
    src = jnp.array([[10.0, 10.0, 30.0, 50.0]])
    tgt = jnp.array([[5.0, 10.0, 45.0, 30.0]])
    d = np.asarray(get_deltas(src, tgt))
    np.testing.assert_allclose(
        d, [[5.0 / 20.0, -10.0 / 40.0, np.log(2.0), np.log(0.5)]], atol=1e-5
    )


def test_scale_clamp():
    src = jnp.array([[0.0, 0.0, 16.0, 16.0]])
    huge = jnp.array([[0.0, 0.0, 100.0, 100.0]])  # dw=dh=100 pre-clamp
    out = np.asarray(apply_deltas(huge, src))
    # max size = 16 * exp(log(1000/16)) = 1000
    w = out[0, 2] - out[0, 0]
    assert w <= 1000.0 + 1e-3
    assert np.isfinite(out).all()


def test_multiclass_deltas_shape():
    src = jnp.array([[10.0, 10.0, 30.0, 50.0]])
    deltas = jnp.tile(jnp.array([[0.1, 0.2, 0.0, 0.0]]), (1, 3))  # 3 classes
    out = apply_deltas(deltas, src, ROI_WEIGHTS)
    assert out.shape == (1, 12)
    per_class = np.asarray(out).reshape(1, 3, 4)
    np.testing.assert_allclose(per_class[0, 0], per_class[0, 1], atol=1e-6)
