"""Pallas RoIAlign kernel parity vs the gather implementation (interpret mode
on the CPU mesh; the compiled path is exercised on real TPU by bench/verify)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from proben_tpu.ops.roi_align import multilevel_roi_align
from proben_tpu.ops.roi_align_pallas import multilevel_roi_align_pallas

STRIDES = (4, 8, 16, 32)


def _feats(rng, b, base=64, c=32):
    return [
        jnp.asarray(rng.rand(b, base // (2 ** i), base // (2 ** i), c).astype(np.float32))
        for i in range(4)
    ]


def _boxes(rng, b, k, img=256):
    xy = rng.rand(b, k, 2) * (img * 0.6)
    wh = rng.rand(b, k, 2) * (img * 0.35) + 8
    return jnp.asarray(np.concatenate([xy, xy + wh], -1).astype(np.float32))


def test_pallas_matches_gather_random():
    rng = np.random.RandomState(0)
    b, k = 2, 16
    feats = _feats(rng, b)
    boxes = _boxes(rng, b, k)
    want = jax.vmap(
        lambda f0, f1, f2, f3, bx: multilevel_roi_align(
            [f0, f1, f2, f3], bx, STRIDES, 7, 2
        )
    )(*feats, boxes)
    got = multilevel_roi_align_pallas(feats, boxes, STRIDES, 7, 2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3, rtol=1e-3)


def test_pallas_small_levels_padded():
    # levels smaller than the window (p5 = 8x8 here) must still work
    rng = np.random.RandomState(1)
    b, k = 1, 8
    feats = _feats(rng, b, base=64, c=16)
    boxes = _boxes(rng, b, k, img=256)
    want = jax.vmap(
        lambda f0, f1, f2, f3, bx: multilevel_roi_align(
            [f0, f1, f2, f3], bx, STRIDES, 7, 2
        )
    )(*feats, boxes)
    got = multilevel_roi_align_pallas(feats, boxes, STRIDES, 7, 2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3, rtol=1e-3)


def test_pallas_degenerate_boxes():
    rng = np.random.RandomState(2)
    feats = _feats(rng, 1, base=32, c=16)
    boxes = jnp.asarray(
        np.array([[[0.0, 0.0, 0.0, 0.0], [10.0, 10.0, 10.5, 200.0]]], np.float32)
    )
    got = multilevel_roi_align_pallas(feats, boxes, STRIDES, 7, 2, interpret=True)
    assert np.isfinite(np.asarray(got)).all()
