"""RoIAlign tier-3 overflow: pin the last silent approximation in the
flagship path (round-2 verdict item 6).

The windowed RoIAlign (ops/roi_align.py) reads one static (56, 64) window
per RoI; RoIs whose sample span exceeds it ("out-of-window", OOW) are
re-pooled EXACTLY against the full level map, up to ``fallback_capacity``
per call. These tests establish:

  1. which boxes can be OOW at all — a scale x aspect sweep through the
     real level-assignment + weight-builder shows every box with aspect
     ratio in [1/4, 4] fits the window at EVERY scale (measured boundary:
     wide boxes first overflow at aspect 8, tall ones around 1/6 — the y
     window is 56 rows vs 64 columns — for mid scales where the level
     rounding puts ~28 feature pixels per sqrt(area) unit). KAIST
     pedestrians are ~0.41 w/h and FLIR objects similar — well inside the
     safe region;
  2. capacity is honored: with capacity >= #OOW the result equals exact
     whole-map pooling for every OOW box;
  3. the beyond-capacity behavior is PINNED: overflow rows keep the
     window-clamped tier-1 value (identical to capacity=0), are finite, and
     their error vs exact is bounded by the out-of-window mass.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from proben_tpu.ops import multilevel_roi_align, roi_level_assignment
from proben_tpu.ops.roi_align import WIN_X, WIN_Y, wholemap_roi_align

STRIDES = (4, 8, 16, 32)
H, W = 800, 1024  # input-image frame


def _features(seed=0, c=8):
    rng = np.random.RandomState(seed)
    return [
        jnp.asarray(rng.rand(H // s, W // s, c).astype(np.float32))
        for s in STRIDES
    ]


def _sliver_boxes(n, aspect=30.0, side=900.0, seed=1):
    """n pathological wide slivers: width ~side, height side/aspect."""
    rng = np.random.RandomState(seed)
    out = []
    for i in range(n):
        w = side - rng.rand() * 60
        h = w / aspect
        x1 = rng.rand() * (W - w - 2) + 1
        y1 = rng.rand() * (H - h - 2) + 1
        out.append([x1, y1, x1 + w, y1 + h])
    return jnp.asarray(np.asarray(out, np.float32))


def _exact(features, boxes):
    lvl = roi_level_assignment(boxes, 2, 5, 224.0, 4) - 2
    return np.asarray(
        wholemap_roi_align(list(features), boxes, lvl, list(STRIDES), 7, 0)
    )


def test_window_covers_all_aspects_quarter_to_four():
    """Sweep scales x aspects through the REAL pipeline: capacity=0 (pure
    windowed) must equal capacity=K (all-exact) for every box with aspect
    in [1/4, 4] that fits the image — i.e. nothing in that family is OOW,
    so the fallback (let alone its overflow) is never even consulted for
    realistic KAIST/FLIR geometry (pedestrians ~0.41 w/h). Measured
    boundary: wide boxes first overflow at aspect 8, tall ones around 1/6
    (the y window is 56 rows vs 64 columns, so tall boxes hit it sooner)."""
    features = _features()
    boxes = []
    for sqrt_area in (8, 16, 32, 64, 100, 128, 180, 256, 360, 512):
        for aspect in (1 / 4, 1 / 3, 0.41, 1.0, 2.0, 3.0, 4.0):
            w = sqrt_area * np.sqrt(aspect)
            h = sqrt_area / np.sqrt(aspect)
            if w >= W - 10 or h >= H - 10:
                continue  # cannot exist in-frame (detector boxes are clipped)
            boxes.append([4.0, 2.0, 4.0 + w, 2.0 + h])
    boxes = jnp.asarray(np.asarray(boxes, np.float32))
    windowed = np.asarray(
        multilevel_roi_align(features, boxes, STRIDES, 7, 0, fallback_capacity=0)
    )
    all_exact = np.asarray(
        multilevel_roi_align(
            features, boxes, STRIDES, 7, 0, fallback_capacity=boxes.shape[0]
        )
    )
    np.testing.assert_array_equal(windowed, all_exact)


def test_capacity_honored_for_oow_slivers():
    """40 genuine OOW slivers, capacity 40: every row equals exact
    whole-map pooling."""
    features = _features()
    boxes = _sliver_boxes(40)
    got = np.asarray(
        multilevel_roi_align(features, boxes, STRIDES, 7, 0, fallback_capacity=40)
    )
    exact = _exact(features, boxes)
    assert not np.allclose(
        np.asarray(
            multilevel_roi_align(features, boxes, STRIDES, 7, 0, fallback_capacity=0)
        ),
        exact,
    ), "fixture boxes are not actually out-of-window"
    np.testing.assert_allclose(got, exact, rtol=1e-5, atol=1e-5)


def test_beyond_capacity_overflow_pinned():
    """40 OOW slivers at the default capacity 32: exactly 32 rows exact,
    the 8 overflow rows keep the tier-1 window-clamped value (== the
    capacity=0 result) — finite, deterministic, bounded error."""
    features = _features()
    boxes = _sliver_boxes(40)
    cap = 32
    got = np.asarray(
        multilevel_roi_align(features, boxes, STRIDES, 7, 0, fallback_capacity=cap)
    )
    tier1 = np.asarray(
        multilevel_roi_align(features, boxes, STRIDES, 7, 0, fallback_capacity=0)
    )
    exact = _exact(features, boxes)

    row_exact = np.array(
        [np.allclose(got[i], exact[i], rtol=1e-5, atol=1e-5) for i in range(40)]
    )
    row_tier1 = np.array([np.array_equal(got[i], tier1[i]) for i in range(40)])
    assert row_exact.sum() == cap, row_exact.sum()
    # every non-exact row is the pinned tier-1 approximation, nothing else
    assert (row_exact | row_tier1).all()
    assert np.isfinite(got).all()

    # quantify the approximation: the window keeps a 64-column span of a
    # ~110-column sliver, losing ~half the sample mass (the divisor still
    # counts all samples), so edge bins can lose up to ~90% of their value
    # (measured max pointwise rel err 0.89, mean ~0.4). Pin that regime:
    # values bounded by the feature range (uniform[0,1) -> averages in
    # [0,1)), mean error below the half-mass level, so regressions to
    # garbage/NaN/sign-flips fail loudly.
    overflow = ~row_exact
    assert got[overflow].min() >= 0.0 and got[overflow].max() <= 1.0
    denom = max(np.abs(exact[overflow]).max(), 1e-9)
    rel_max = np.abs(got[overflow] - exact[overflow]).max() / denom
    rel_mean = np.abs(got[overflow] - exact[overflow]).mean() / denom
    assert rel_max < 1.0, f"beyond the documented window-clamp regime: {rel_max}"
    assert rel_mean < 0.6, f"mean overflow error regressed: {rel_mean}"


def test_capacity_flows_from_model_config():
    """ROIHeadsConfig.fallback_capacity reaches the pooling (config-driven
    per the round-2 verdict): capacity 40 through pool_box_features matches
    exact for 40 slivers; the default-32 path differs on 8 rows."""
    from proben_tpu.models.roi_heads import ROIHeadsConfig, pool_box_features

    features = _features(c=8)
    boxes = _sliver_boxes(40)
    exact = _exact(features, boxes)
    big = pool_box_features(
        features, boxes, ROIHeadsConfig(fallback_capacity=40)
    )
    np.testing.assert_allclose(np.asarray(big), exact, rtol=1e-5, atol=1e-5)
    dflt = pool_box_features(features, boxes, ROIHeadsConfig())
    n_diff = sum(
        not np.allclose(np.asarray(dflt)[i], exact[i], rtol=1e-5, atol=1e-5)
        for i in range(40)
    )
    assert n_diff == 8, n_diff
