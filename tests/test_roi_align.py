"""RoIAlign tests: numpy oracle of the ROIAlignV2 spec + cv2-resize special
case (the same oracle style as reference tests/test_roi_align.py)."""

import cv2
import jax.numpy as jnp
import numpy as np

from proben_tpu.ops import (
    multilevel_roi_align,
    roi_level_assignment,
    single_level_roi_align,
)


def numpy_roi_align_v2(feature, box, stride, P, S):
    """Direct transliteration of the ROIAlignV2 algorithm (aligned=True)."""
    H, W, C = feature.shape
    scale = 1.0 / stride
    x1, y1, x2, y2 = [v * scale - 0.5 for v in box]
    bin_w = (x2 - x1) / P
    bin_h = (y2 - y1) / P
    out = np.zeros((P, P, C), np.float64)

    def interp(y, x):
        if y < -1.0 or y > H or x < -1.0 or x > W:
            return np.zeros(C)
        y = min(max(y, 0.0), H - 1.0)
        x = min(max(x, 0.0), W - 1.0)
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        y1_, x1_ = min(y0 + 1, H - 1), min(x0 + 1, W - 1)
        ly = y - y0 if y0 + 1 <= H - 1 else 0.0
        lx = x - x0 if x0 + 1 <= W - 1 else 0.0
        return (
            feature[y0, x0] * (1 - ly) * (1 - lx)
            + feature[y0, x1_] * (1 - ly) * lx
            + feature[y1_, x0] * ly * (1 - lx)
            + feature[y1_, x1_] * ly * lx
        )

    for py in range(P):
        for px in range(P):
            acc = np.zeros(C)
            for sy in range(S):
                for sx in range(S):
                    yy = y1 + (py + (sy + 0.5) / S) * bin_h
                    xx = x1 + (px + (sx + 0.5) / S) * bin_w
                    acc += interp(yy, xx)
            out[py, px] = acc / (S * S)
    return out


def test_single_level_matches_numpy_oracle():
    rng = np.random.RandomState(0)
    H, W, C = 24, 32, 3
    feature = rng.rand(H, W, C).astype(np.float32)
    boxes = np.array(
        [
            [4.0, 4.0, 28.0, 20.0],
            [0.0, 0.0, 8.0, 8.0],
            [-4.0, -4.0, 12.0, 12.0],  # partially outside
            [10.5, 3.25, 30.75, 22.5],  # fractional
        ],
        np.float32,
    )
    got = np.asarray(
        single_level_roi_align(jnp.asarray(feature), jnp.asarray(boxes), stride=1,
                               output_size=7, sampling_ratio=2)
    )
    for i, b in enumerate(boxes):
        want = numpy_roi_align_v2(feature, b, 1, 7, 2)
        np.testing.assert_allclose(got[i], want, atol=1e-4)


def test_stride_scaling_matches_oracle():
    rng = np.random.RandomState(1)
    feature = rng.rand(16, 16, 2).astype(np.float32)
    boxes = np.array([[8.0, 8.0, 120.0, 100.0]], np.float32)  # image coords, stride 8
    got = np.asarray(
        single_level_roi_align(jnp.asarray(feature), jnp.asarray(boxes), stride=8,
                               output_size=5, sampling_ratio=2)
    )
    want = numpy_roi_align_v2(feature, boxes[0], 8, 5, 2)
    np.testing.assert_allclose(got[0], want, atol=1e-4)


def test_matches_cv2_resize_on_dense_grid():
    """With aligned=True and enough samples, RoIAlign of the full feature map
    approximates bilinear resize (the reference's oracle)."""
    H = W = 16
    feature = np.arange(H * W, dtype=np.float32).reshape(H, W, 1)
    box = np.array([[0.0, 0.0, W, H]], np.float32)
    P = 8
    got = np.asarray(
        single_level_roi_align(jnp.asarray(feature), jnp.asarray(box), stride=1,
                               output_size=P, sampling_ratio=2)
    )[0, :, :, 0]
    want = cv2.resize(feature[:, :, 0], (P, P), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(got, want, atol=0.2)


def test_level_assignment():
    boxes = jnp.array(
        [
            [0.0, 0.0, 56.0, 56.0],  # sqrt area 56 -> lvl 2
            [0.0, 0.0, 112.0, 112.0],  # -> lvl 3
            [0.0, 0.0, 224.0, 224.0],  # -> lvl 4
            [0.0, 0.0, 448.0, 448.0],  # -> lvl 5
            [0.0, 0.0, 1000.0, 1000.0],  # clamped to 5
            [0.0, 0.0, 4.0, 4.0],  # clamped to 2
        ]
    )
    lv = np.asarray(roi_level_assignment(boxes, 2, 5))
    np.testing.assert_array_equal(lv, [2, 3, 4, 5, 5, 2])


def test_multilevel_routes_to_correct_level():
    rng = np.random.RandomState(2)
    C = 4
    feats = [jnp.asarray(rng.rand(64 // (2 ** i), 64 // (2 ** i), C).astype(np.float32))
             for i in range(4)]
    strides = [4, 8, 16, 32]
    # One small box (sqrt area 32 -> lvl 2) and one large (sqrt 450 -> lvl 5)
    boxes = np.array([[8.0, 8.0, 40.0, 40.0], [0.0, 0.0, 450.0, 450.0]], np.float32)
    got = np.asarray(
        multilevel_roi_align(feats, jnp.asarray(boxes), strides, output_size=7,
                             sampling_ratio=2)
    )
    want0 = numpy_roi_align_v2(np.asarray(feats[0]), boxes[0], 4, 7, 2)
    want1 = numpy_roi_align_v2(np.asarray(feats[3]), boxes[1], 32, 7, 2)
    np.testing.assert_allclose(got[0], want0, atol=1e-4)
    np.testing.assert_allclose(got[1], want1, atol=1e-4)


def test_degenerate_box_no_nan():
    feats = [jnp.ones((8, 8, 2))]
    boxes = jnp.array([[0.0, 0.0, 0.0, 0.0]])
    out = np.asarray(
        multilevel_roi_align(feats, boxes, [4], min_level=0,
                             levels=jnp.zeros((1,), jnp.int32))
    )
    assert np.isfinite(out).all()


def test_pair_gather_custom_vjp_matches_native_grad():
    """The custom scatter-add VJP must equal the native gather transpose."""
    import jax

    from proben_tpu.ops.roi_align import _pair_gather

    rng = np.random.RandomState(5)
    L, C, N = 37, 8, 50
    padded = jnp.asarray(rng.rand(L + 1, C).astype(np.float32))
    starts = jnp.asarray(rng.randint(0, L, N).astype(np.int32))
    cotangent = jnp.asarray(rng.rand(N, 2, C).astype(np.float32))

    def native(padded):
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,)
        )
        out = jax.lax.gather(padded, starts[:, None], dn, slice_sizes=(2, C),
                             mode=jax.lax.GatherScatterMode.CLIP)
        return jnp.sum(out * cotangent)

    def custom(padded):
        return jnp.sum(_pair_gather(padded, starts) * cotangent)

    g_native = jax.grad(native)(padded)
    g_custom = jax.grad(custom)(padded)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_native), atol=1e-5)
