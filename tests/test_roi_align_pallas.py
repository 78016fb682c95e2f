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


def test_pallas_duplicate_window_dedup():
    """Clustered and exactly-repeated boxes force the dedup fast path (dup /
    pair / split compute variants and skipped DMAs) — the host sorts RoIs by
    window key, so duplicate runs of every length appear. Must stay
    bit-comparable to the per-RoI gather path."""
    rng = np.random.RandomState(7)
    b, k = 2, 32
    feats = _feats(rng, b)
    base = _boxes(rng, b, 6)
    reps = []
    for j in range(k):
        src = np.asarray(base[:, j % 6])
        jit = (rng.rand(b, 4) - 0.5) * (0.0 if j % 3 else 2.0)  # exact + near dups
        reps.append(src + jit)
    boxes = jnp.asarray(np.stack(reps, 1).astype(np.float32))
    want = jax.vmap(
        lambda f0, f1, f2, f3, bx: multilevel_roi_align(
            [f0, f1, f2, f3], bx, STRIDES, 7, 0
        )
    )(*feats, boxes)
    got = multilevel_roi_align_pallas(feats, boxes, STRIDES, 7, 0, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3, rtol=1e-3)


def test_pallas_all_identical_boxes():
    """Degenerate extreme: every RoI shares ONE window (a single DMA serves
    the whole grid; slot rotation never advances)."""
    rng = np.random.RandomState(8)
    b, k = 1, 24
    feats = _feats(rng, b)
    one = np.array([[30.0, 40.0, 90.0, 120.0]], np.float32)
    boxes = jnp.asarray(np.tile(one, (b, k, 1)))
    want = jax.vmap(
        lambda f0, f1, f2, f3, bx: multilevel_roi_align(
            [f0, f1, f2, f3], bx, STRIDES, 7, 0
        )
    )(*feats, boxes)
    got = multilevel_roi_align_pallas(feats, boxes, STRIDES, 7, 0, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3, rtol=1e-3)
