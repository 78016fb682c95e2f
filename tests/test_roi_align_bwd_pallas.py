"""Fused Pallas RoIAlign backward parity vs the einsum whole-map backward
(interpret mode on the CPU mesh; the compiled path is cross-checked on real
TPU by dev/bisect_bwd.py and exercised by bench --train).

The kernel is the exact VJP of the windowed Pallas forward: for in-window
rows the whole-map and windowed gradients coincide, and rows the forward
re-pooled whole-map (the capacity-bounded out-of-window fallback) get their
exact whole-map gradient via the caller-side einsum add. The einsum
reference (ops/roi_align.wholemap_roi_align_grad) is whole-map for ALL rows,
so the two agree exactly whenever every out-of-window row is within
fallback capacity. Reference semantics:
detectron2/layers/csrc/ROIAlign/ROIAlign_cuda.cu:247-340 (backward).

Suite-speed note: like test_roi_align_pallas.py, each test's cost is the CPU
compile of the interpreted kernel, so all tests share one shape signature
(B=2, K=16, C=32, base=50) and one (bs=4, ty=8) tiling.
"""

import jax
import jax.numpy as jnp
import numpy as np

from proben_tpu.ops.roi_align import wholemap_roi_align_grad
from proben_tpu.ops.roi_align_bwd_pallas import wholemap_grad_pallas

STRIDES = (4, 8, 16, 32)
P = 7
B, K, C = 2, 16, 32
# level-0 taller than WIN_Y=56 so an elongated sliver can genuinely lose
# window weight (out-of-window) and exercise the fallback tier
SHAPES = [(80, 64), (40, 32), (20, 16), (10, 8)]


def _inputs(seed, sliver=False):
    rng = np.random.RandomState(seed)
    feats = [
        jnp.asarray(rng.rand(B, h, w, C).astype(np.float32)) for h, w in SHAPES
    ]
    xy = rng.rand(B, K, 2) * 120
    wh = rng.rand(B, K, 2) * 90 + 8
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    if sliver:
        # one elongated sliver per image: ~78 level-0 rows > WIN_Y=56, so it
        # loses window weight (oow) and exercises the fallback tier of the VJP.
        # y2=312 keeps bin_h = 77.5/7 away from an exact integer: ceil(bin) on
        # an integer boundary flips by one sample between eager and compiled
        # (FMA-contracted) evaluations of _roi_geometry — a 1-ulp hazard, not
        # a kernel bug (y2=310 -> bin_h == 11.0 exactly reproduced it)
        boxes[:, 0] = [2.0, 2.0, 8.0, 312.0]
    g = jnp.asarray(rng.rand(B, K, P, P, C).astype(np.float32))
    return feats, jnp.asarray(boxes), g


def _einsum_ref(feats, boxes, g):
    out = jax.vmap(
        lambda f0, f1, f2, f3, bx, gg: wholemap_roi_align_grad(
            [f0, f1, f2, f3], bx, gg, STRIDES, P, 0, 2, 224.0, 4
        )
    )(*feats, boxes, g)
    return [np.asarray(o) for o in out]


def _pallas(feats, boxes, g, **kw):
    kw.setdefault("bs", 4)
    kw.setdefault("ty", 8)
    out = wholemap_grad_pallas(
        feats, boxes, g, STRIDES, P, 0, 2, 224.0, 4, interpret=True, **kw
    )
    return [np.asarray(o) for o in out]


def _assert_levels_close(ref, out, atol=1e-5):
    for li, (r, o) in enumerate(zip(ref, out)):
        scale = np.abs(r).max() + 1e-9
        np.testing.assert_allclose(
            o / scale, r / scale, atol=atol, err_msg=f"level {li}"
        )


def test_bwd_matches_einsum_in_window():
    feats, boxes, g = _inputs(0)
    _assert_levels_close(_einsum_ref(feats, boxes, g), _pallas(feats, boxes, g))


def test_bwd_fallback_tier_exact():
    # out-of-window slivers within capacity get the exact whole-map gradient
    feats, boxes, g = _inputs(0, sliver=True)
    _assert_levels_close(_einsum_ref(feats, boxes, g), _pallas(feats, boxes, g))


def test_bwd_capacity_zero_clamps_only_oow_rows():
    # with the fallback disabled, oow rows keep window-clamped grads (they
    # diverge from whole-map) while every in-window row still matches exactly
    feats, boxes, g = _inputs(0, sliver=True)
    ref = _einsum_ref(feats, boxes, g)
    out = _pallas(feats, boxes, g, fallback_capacity=0)
    # the sliver row contributes only to its own level; zero its cotangent in
    # a second reference to isolate the in-window rows' contribution
    g_masked = g.at[:, 0].set(0.0)
    ref_masked = _einsum_ref(feats, boxes, g_masked)
    out_masked = _pallas(feats, boxes, g_masked, fallback_capacity=0)
    _assert_levels_close(ref_masked, out_masked)
    # and the unmasked comparison must differ somewhere (the clamped row)
    diff = max(np.abs(r - o).max() for r, o in zip(ref, out))
    assert diff > 1e-4, "capacity=0 sliver should diverge from whole-map"


def test_bwd_channel_split_path():
    # C > 256 takes the recursive channel-split branch (middle-fusion concat);
    # stitch two 32-channel problems into one 512-wide call via tiling the
    # small inputs -- keeps the interpret compile on the shared signature
    feats, boxes, g = _inputs(3)
    wide = 288  # > 256 triggers the split; 288 = 9 * 32 keeps shapes tiny
    reps = wide // C
    feats_w = [jnp.tile(f, (1, 1, 1, reps)) for f in feats]
    g_w = jnp.tile(g, (1, 1, 1, 1, reps))
    out = _pallas(feats_w, boxes, g_w)
    ref = _einsum_ref(feats, boxes, g)
    for li, (r, o) in enumerate(zip(ref, out)):
        for j in range(reps):
            scale = np.abs(r).max() + 1e-9
            np.testing.assert_allclose(
                o[..., j * C : (j + 1) * C] / scale,
                r / scale,
                atol=1e-5,
                err_msg=f"level {li} rep {j}",
            )
