"""Pallas RoIAlign kernel parity vs the gather implementation (interpret mode
on the CPU mesh; the compiled path is exercised on real TPU by bench/verify).

Suite-speed note: the cost of each test here is the CPU COMPILE of the
interpreted kernel program (the unrolled level x size-class x slot branch
tree), not the data. All tests therefore share two canonical shape/ratio
signatures — (b=2, k=32, base=64, c=32) at sampling_ratio 2 and 0 — so the
persistent compilation cache collapses five compiles into two.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from proben_tpu.ops.roi_align import multilevel_roi_align
from proben_tpu.ops.roi_align_pallas import multilevel_roi_align_pallas

STRIDES = (4, 8, 16, 32)
B, K, BASE, C = 2, 32, 64, 32  # one signature -> one cached compile


def _feats(rng, b=B, base=BASE, c=C):
    return [
        jnp.asarray(rng.rand(b, base // (2 ** i), base // (2 ** i), c).astype(np.float32))
        for i in range(4)
    ]


def _boxes(rng, b, k, img=256):
    xy = rng.rand(b, k, 2) * (img * 0.6)
    wh = rng.rand(b, k, 2) * (img * 0.35) + 8
    return jnp.asarray(np.concatenate([xy, xy + wh], -1).astype(np.float32))


def _check(feats, boxes, ratio):
    want = jax.vmap(
        lambda f0, f1, f2, f3, bx: multilevel_roi_align(
            [f0, f1, f2, f3], bx, STRIDES, 7, ratio
        )
    )(*feats, boxes)
    got = multilevel_roi_align_pallas(feats, boxes, STRIDES, 7, ratio, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3, rtol=1e-3)
    return got


def test_pallas_matches_gather_random():
    rng = np.random.RandomState(0)
    _check(_feats(rng), _boxes(rng, B, K), ratio=2)


def test_pallas_small_levels_padded():
    # levels smaller than the window (p5 = 8x8 here) must still work; the
    # shared base=64 pyramid exercises this in every test, with boxes spread
    # over all levels here
    rng = np.random.RandomState(1)
    _check(_feats(rng), _boxes(rng, B, K, img=256), ratio=2)


def test_pallas_degenerate_boxes():
    rng = np.random.RandomState(2)
    feats = _feats(rng)
    deg = np.array([[0.0, 0.0, 0.0, 0.0], [10.0, 10.0, 10.5, 200.0]], np.float32)
    boxes = jnp.asarray(np.tile(deg, (B, K // 2, 1)))
    got = multilevel_roi_align_pallas(feats, boxes, STRIDES, 7, 0, interpret=True)
    assert np.isfinite(np.asarray(got)).all()


def test_pallas_duplicate_window_dedup():
    """Clustered and exactly-repeated boxes force the dedup fast path (dup /
    pair / split compute variants and skipped DMAs) — the host sorts RoIs by
    window key, so duplicate runs of every length appear. Must stay
    bit-comparable to the per-RoI gather path."""
    rng = np.random.RandomState(7)
    feats = _feats(rng)
    base = _boxes(rng, B, 6)
    reps = []
    for j in range(K):
        src = np.asarray(base[:, j % 6])
        jit = (rng.rand(B, 4) - 0.5) * (0.0 if j % 3 else 2.0)  # exact + near dups
        reps.append(src + jit)
    boxes = jnp.asarray(np.stack(reps, 1).astype(np.float32))
    _check(feats, boxes, ratio=0)


def test_pallas_channel_split_c512():
    """C>256 (middle-fusion concat width) runs as two channel-half calls —
    must equal the gather path on the full-width features exactly (pooling
    is per-channel linear, so the split is exact by construction)."""
    rng = np.random.RandomState(9)
    feats = [
        jnp.concatenate([a, b], axis=-1)
        for a, b in zip(_feats(rng), _feats(rng))
    ]  # (B, ., ., 2C)
    boxes = _boxes(rng, B, K)
    want = jax.vmap(
        lambda f0, f1, f2, f3, bx: multilevel_roi_align(
            [f0, f1, f2, f3], bx, STRIDES, 7, 0
        )
    )(*feats, boxes)
    got = multilevel_roi_align_pallas(feats, boxes, STRIDES, 7, 0, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3, rtol=1e-3)


def _pool_dual_case(n, k, c=16):
    """_pool_dual(with_perm=True) on one dispatch branch (n<8 per-stream,
    n>=8 batch-stacked) must equal the perm-free concat of per-stream pools
    re-indexed by the returned perm. Pins the invariant the inference path
    rests on: the window-sort key is box-only and argsort is stable, so the
    two streams' perms coincide (models/rcnn.py::_pool_dual)."""
    from proben_tpu.models.rcnn import ROI_IN_FEATURES, _pool_dual

    rng = np.random.RandomState(20 + n)
    streams = tuple(
        {f: jnp.asarray(rng.rand(n, BASE // (2 ** i), BASE // (2 ** i), c)
                        .astype(np.float32))
         for i, f in enumerate(ROI_IN_FEATURES)}
        for _ in range(2)
    )
    boxes = _boxes(rng, n, k)

    def pool(fs, bx):
        return multilevel_roi_align_pallas(
            fs, bx, STRIDES, 7, 0, return_perm=True, interpret=True
        )

    got, perm = _pool_dual(pool, streams, boxes, with_perm=True)
    ref = jnp.concatenate(
        [
            multilevel_roi_align_pallas(
                [s[f] for f in ROI_IN_FEATURES], boxes, STRIDES, 7, 0,
                interpret=True,
            )
            for s in streams
        ],
        axis=-1,
    )
    # row i of the sorted output carries original box perm[i]
    want = np.take_along_axis(
        np.asarray(ref), np.asarray(perm)[:, :, None, None, None], axis=1
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-3, rtol=1e-3)


def test_pool_dual_with_perm_per_stream_branch():
    _pool_dual_case(n=2, k=16)


def test_pool_dual_with_perm_stacked_branch():
    _pool_dual_case(n=8, k=8)


def test_pallas_return_perm_padded_tail():
    """r=2 with odd B*K (n_pad != 0) must fall back to the inverse-perm
    path and return the identity perm instead of asserting (a config with
    odd post_nms_topk previously worked without return_perm)."""
    rng = np.random.RandomState(31)
    feats = _feats(rng, b=1, c=16)
    boxes = _boxes(rng, 1, 7)  # B*K = 7, odd
    got, perm = multilevel_roi_align_pallas(
        feats, boxes, STRIDES, 7, 0, return_perm=True, interpret=True
    )
    want = multilevel_roi_align_pallas(feats, boxes, STRIDES, 7, 0, interpret=True)
    np.testing.assert_array_equal(np.asarray(perm), np.arange(7)[None])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3, rtol=1e-3)


def test_pallas_all_identical_boxes():
    """Degenerate extreme: every RoI shares ONE window (a single DMA serves
    the whole grid; slot rotation never advances)."""
    rng = np.random.RandomState(8)
    feats = _feats(rng)
    one = np.array([[30.0, 40.0, 90.0, 120.0]], np.float32)
    boxes = jnp.asarray(np.tile(one, (B, K, 1)))
    _check(feats, boxes, ratio=0)


def test_nonfinite_boxes_yield_inrange_indices():
    """Non-finite boxes must produce in-range level/window indices: a garbage
    level skips the kernel's lvl-dispatched DMA start while its class-
    dispatched semaphore wait still runs — a chip-hanging deadlock on real
    hardware (reproduced + fixed round 5, dev/nan_box_repro.py)."""
    from proben_tpu.ops.roi_align import build_window_weights, roi_level_assignment

    boxes = jnp.asarray([
        [10.0, 10.0, 50.0, 80.0],
        [np.nan, np.nan, np.nan, np.nan],
        [np.inf, np.inf, np.inf, np.inf],
        [-np.inf, -np.inf, -np.inf, -np.inf],
        [100.0, np.nan, 200.0, 150.0],
    ])
    levels = roi_level_assignment(boxes, 2, 5, 224.0, 4)
    assert ((levels >= 2) & (levels <= 5)).all(), np.asarray(levels)
    lvl = jnp.clip(levels - 2, 0, 3)
    heights = jnp.asarray([200, 100, 50, 25], jnp.int32)
    widths = jnp.asarray([256, 128, 64, 32], jnp.int32)
    pad_hs = jnp.asarray([200, 104, 64, 64], jnp.int32)
    pad_ws = jnp.asarray([256, 128, 64, 64], jnp.int32)
    y0, x0, wy, wx, oow = build_window_weights(
        boxes, lvl, [4, 8, 16, 32], heights, widths, pad_hs, pad_ws, 7, 0, 16
    )
    y0, x0 = np.asarray(y0), np.asarray(x0)
    ph, pw = np.asarray(pad_hs)[np.asarray(lvl)], np.asarray(pad_ws)[np.asarray(lvl)]
    assert ((y0 >= 0) & (y0 <= ph - 56)).all(), y0
    assert ((x0 >= 0) & (x0 <= pw - 64)).all(), x0
