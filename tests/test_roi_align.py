"""RoIAlign tests: numpy oracle of the ROIAlignV2 spec + cv2-resize special
case (the same oracle style as reference tests/test_roi_align.py). The oracle
supports S=0 = ADAPTIVE sampling (grid = ceil(roi/P), the reference default
`detectron2/config/defaults.py:290`, CUDA semantics ROIAlign_cuda.cu:108-135).
"""

import cv2
import jax.numpy as jnp
import numpy as np

from proben_tpu.ops import (
    multilevel_roi_align,
    roi_level_assignment,
    single_level_roi_align,
)


def numpy_roi_align_v2(feature, box, stride, P, S):
    """Direct transliteration of the ROIAlignV2 algorithm (aligned=True).
    S=0 -> adaptive grid = ceil(roi_size/P) per axis, count = max(gh*gw, 1)."""
    H, W, C = feature.shape
    scale = 1.0 / stride
    x1, y1, x2, y2 = [v * scale - 0.5 for v in box]
    bin_w = (x2 - x1) / P
    bin_h = (y2 - y1) / P
    gh = S if S > 0 else int(np.ceil((y2 - y1) / P))
    gw = S if S > 0 else int(np.ceil((x2 - x1) / P))
    count = max(gh * gw, 1)
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
            for sy in range(gh):
                for sx in range(gw):
                    yy = y1 + (py + (sy + 0.5) / gh) * bin_h
                    xx = x1 + (px + (sx + 0.5) / gw) * bin_w
                    acc += interp(yy, xx)
            out[py, px] = acc / count
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
    for S in (2, 0):
        got = np.asarray(
            single_level_roi_align(jnp.asarray(feature), jnp.asarray(boxes),
                                   stride=1, output_size=7, sampling_ratio=S)
        )
        for i, b in enumerate(boxes):
            want = numpy_roi_align_v2(feature, b, 1, 7, S)
            np.testing.assert_allclose(got[i], want, atol=1e-4)


def test_stride_scaling_matches_oracle():
    rng = np.random.RandomState(1)
    feature = rng.rand(16, 16, 2).astype(np.float32)
    boxes = np.array([[8.0, 8.0, 120.0, 100.0]], np.float32)  # image coords, stride 8
    for S in (2, 0):
        got = np.asarray(
            single_level_roi_align(jnp.asarray(feature), jnp.asarray(boxes),
                                   stride=8, output_size=5, sampling_ratio=S)
        )
        want = numpy_roi_align_v2(feature, boxes[0], 8, 5, S)
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
    for S in (2, 0):
        got = np.asarray(
            multilevel_roi_align(feats, jnp.asarray(boxes), strides, output_size=7,
                                 sampling_ratio=S)
        )
        want0 = numpy_roi_align_v2(np.asarray(feats[0]), boxes[0], 4, 7, S)
        want1 = numpy_roi_align_v2(np.asarray(feats[3]), boxes[1], 32, 7, S)
        np.testing.assert_allclose(got[0], want0, atol=1e-4)
        np.testing.assert_allclose(got[1], want1, atol=1e-4)


def test_adaptive_adversarial_aspect_ratios():
    """Exactness at ratio=0 for elongated boxes whose sample span exceeds the
    static window (out-of-window -> whole-map fallback). Round 1 clamped
    these samples into the window (documented approximation, now removed)."""
    rng = np.random.RandomState(3)
    C = 4
    feats = [jnp.asarray(rng.rand(128 // (2 ** i), 160 // (2 ** i), C).astype(np.float32))
             for i in range(4)]
    strides = [4, 8, 16, 32]
    boxes = np.array(
        [
            [40.0, 4.0, 56.0, 500.0],   # aspect 31: tall sliver, lvl 2, span ~124 rows
            [8.0, 60.0, 630.0, 76.0],   # wide sliver, lvl 2, span ~155 cols
            [0.0, 0.0, 640.0, 512.0],   # whole image, lvl 5
            [100.0, 100.0, 140.0, 460.0],  # aspect 9 pedestrian-ish, lvl 3
            [30.0, 30.0, 90.0, 90.0],   # normal box for contrast, lvl 2
            [3.0, 7.0, 630.0, 500.0],   # near-whole-image fractional
        ],
        np.float32,
    )
    got = np.asarray(
        multilevel_roi_align(feats, jnp.asarray(boxes), strides, output_size=7,
                             sampling_ratio=0)
    )
    levels = np.asarray(roi_level_assignment(jnp.asarray(boxes), 2, 5))
    for i, b in enumerate(boxes):
        f = np.asarray(feats[levels[i] - 2])
        want = numpy_roi_align_v2(f, b, strides[levels[i] - 2], 7, 0)
        np.testing.assert_allclose(got[i], want, atol=1e-4, err_msg=f"box {i}")


def test_pallas_matches_gather_adversarial():
    """pallas == gather == oracle at ratio=0 incl. out-of-window fallbacks."""
    from proben_tpu.ops.roi_align_pallas import multilevel_roi_align_pallas

    # shapes match test_roi_align_pallas's canonical (b=2, k=32, base=64,
    # c=32, ratio=0) signature so the interpret-mode kernel program compiles
    # ONCE for the whole suite (the compile, not the data, is the cost here)
    rng = np.random.RandomState(4)
    C = 32
    feats = [rng.rand(2, 64 // (2 ** i), 64 // (2 ** i), C).astype(np.float32)
             for i in range(4)]
    strides = [4, 8, 16, 32]
    adv = np.array(
        [
            [40.0, 2.0, 48.0, 254.0],  # tall sliver, span > window -> oow
            [2.0, 60.0, 254.0, 68.0],  # wide sliver -> oow
            [30.0, 30.0, 90.0, 90.0],
            [0.0, 0.0, 190.0, 250.0],
            [0.0, 0.0, 0.0, 0.0],  # degenerate
            [10.5, 3.25, 150.75, 12.5],
            [100.0, 100.0, 120.0, 230.0],
            [5.0, 5.0, 250.0, 250.0],
        ],
        np.float32,
    )
    boxes = np.stack(
        [
            np.concatenate([adv + 4.0 * j for j in range(4)], axis=0),
            np.concatenate([adv[::-1] + 3.0 * j for j in range(4)], axis=0),
        ]
    ).astype(np.float32)
    got_p = np.asarray(
        multilevel_roi_align_pallas(
            [jnp.asarray(f) for f in feats], jnp.asarray(boxes), strides,
            output_size=7, sampling_ratio=0,
        )
    )
    for bi in range(2):
        got_g = np.asarray(
            multilevel_roi_align(
                [jnp.asarray(f[bi]) for f in feats], jnp.asarray(boxes[bi]),
                strides, output_size=7, sampling_ratio=0,
            )
        )
        np.testing.assert_allclose(got_p[bi], got_g, atol=1e-5)
        levels = np.asarray(roi_level_assignment(jnp.asarray(boxes[bi]), 2, 5))
        for i, b in enumerate(boxes[bi]):
            want = numpy_roi_align_v2(
                feats[levels[i] - 2][bi], b, strides[levels[i] - 2], 7, 0
            )
            np.testing.assert_allclose(
                got_p[bi, i], want, atol=1e-4, err_msg=f"img {bi} box {i}"
            )


def test_box_chunking_equivalence():
    """Chunked lax.map evaluation must equal the single-pass result."""
    rng = np.random.RandomState(6)
    C = 4
    feats = [jnp.asarray(rng.rand(64 // (2 ** i), 64 // (2 ** i), C).astype(np.float32))
             for i in range(4)]
    strides = [4, 8, 16, 32]
    boxes = jnp.asarray(rng.rand(37, 4).astype(np.float32) * 100)
    boxes = jnp.concatenate(
        [jnp.minimum(boxes[:, :2], boxes[:, 2:]),
         jnp.maximum(boxes[:, :2], boxes[:, 2:]) + 1.0], axis=1
    )
    a = np.asarray(multilevel_roi_align(feats, boxes, strides, box_chunk=8))
    b = np.asarray(multilevel_roi_align(feats, boxes, strides, box_chunk=64))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_degenerate_box_no_nan():
    feats = [jnp.ones((8, 8, 2))]
    boxes = jnp.array([[0.0, 0.0, 0.0, 0.0]])
    for S in (2, 0):
        out = np.asarray(
            multilevel_roi_align(feats, boxes, [4], min_level=0, sampling_ratio=S,
                                 levels=jnp.zeros((1,), jnp.int32))
        )
        assert np.isfinite(out).all()
        if S == 0:
            # reference: empty grid -> output exactly 0 (count = max(0, 1))
            np.testing.assert_array_equal(out, 0.0)


def test_window_gather_custom_vjp_matches_native_grad():
    """The custom scatter-add VJP must equal the native gather transpose."""
    import jax

    from proben_tpu.ops.roi_align import _make_window_gather

    rng = np.random.RandomState(5)
    R, C, M, WX = 100, 8, 20, 16
    flat = jnp.asarray(rng.rand(R, C).astype(np.float32))
    starts = jnp.asarray(rng.randint(0, R - WX, M).astype(np.int32))
    cotangent = jnp.asarray(rng.rand(M, WX, C).astype(np.float32))

    def native(flat):
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,)
        )
        out = jax.lax.gather(flat, starts[:, None], dn, slice_sizes=(WX, C),
                             mode=jax.lax.GatherScatterMode.CLIP)
        return jnp.sum(out * cotangent)

    def custom(flat):
        fn = _make_window_gather(R, C, WX, "float32")
        return jnp.sum(fn(flat, starts) * cotangent)

    g_native = jax.grad(native)(flat)
    g_custom = jax.grad(custom)(flat)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_native), atol=1e-5)


def test_pooling_differentiable_wrt_features():
    """End-to-end grad through the windowed einsum path (training uses it)."""
    import jax

    rng = np.random.RandomState(7)
    feats = [jnp.asarray(rng.rand(32 // (2 ** i), 32 // (2 ** i), 3).astype(np.float32))
             for i in range(4)]
    boxes = jnp.asarray(np.array([[4.0, 4.0, 60.0, 20.0], [0.0, 0.0, 100.0, 100.0]],
                                 np.float32))

    def loss(f0):
        out = multilevel_roi_align([f0] + feats[1:], boxes, [4, 8, 16, 32],
                                   sampling_ratio=0)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(feats[0])
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0.0
