"""Pallas TPU kernel for multi-level RoIAlign.

Why: the pure-XLA gather formulation (ops/roi_align.py) is the hottest op of
the whole detector — profiling showed row-gathers at ~30 ms/batch in round 1
(docs/PERF.md), far below HBM bandwidth on the scalar-index path. This kernel
restructures the op around sequential DMA + MXU:

  per RoI: DMA one static (WIN_Y, WIN_X, C) window of its FPN level into
  VMEM, then pool with two small separable matmuls
    t1[p, x, c]  = sum_y Wy[p, y] * win[y, x, c]      (y interp + averaging)
    out[p, q, c] = sum_x Wx[q, x] * t1[p, x, c]       (x interp + averaging)

The per-RoI weight matrices (K, P, WIN) come from the SAME builder as the
XLA path (``ops/roi_align.build_window_weights``) — exact ROIAlignV2 border
semantics, and exact ADAPTIVE sampling (``sampling_ratio=0``, the reference
default `detectron2/config/defaults.py:290`): the grid count only changes the
weights, never the kernel shapes. Bilinear sampling + in-bin averaging are
fully folded, so the matmuls are P=7 rows regardless of sampling ratio
(round 1 used P*S=14 rows plus an outer mean).

Out-of-window RoIs (sample span or adaptive grid beyond the static window —
pathologically elongated boxes) are detected during weight construction and
re-pooled EXACTLY against their full level map via the shared whole-map
fallback (``ops/roi_align.apply_oow_fallback``), capacity-bounded; round 1
silently clamped their samples into the window.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .roi_align import (
    WIN_X,
    WIN_Y,
    apply_oow_fallback,
    build_window_weights,
    pad_level,
    roi_level_assignment,
)

Array = jnp.ndarray

# reduced DMA extents for RoIs whose weight span fits: the kernel is
# window-DMA-bandwidth-bound, so the copied extent per RoI is the smallest
# (y, x) class covering its exact weight span. x extents stay 16-aligned
# (bf16 sublane tile, same constraint as x0); y (third-minor) is free.
# Class-grid sizing is NOT bytes-bound beyond this point: at bench
# conditions (R101 800x1024, calibrated proposals; span_y p50=7, span_x
# p50=15 incl. alignment slack) a finer 5x4 grid cuts the average copied
# window 371 KB -> 201 KB yet measured SLOWER (18.1 vs 16.7 ms/8192 RoIs) —
# the kernel is bound by the per-RoI fixed cost (scalar-core branch tree +
# DMA issue latency), and more classes means a deeper branch tree. 3x3 is
# the measured optimum.
Y_EXTENTS = (16, WIN_Y // 2, WIN_Y)  # 16, 28, 56
X_EXTENTS = (32, 48, WIN_X)  # 32, 48, 64
WIN_Y2 = WIN_Y // 2  # kept for importers
WIN_X2 = 48
DMA_SIZES = tuple((ny, nx) for ny in Y_EXTENTS for nx in X_EXTENTS)


def feats_dtype_size(dtype) -> int:
    return jnp.dtype(dtype).itemsize


def window_size_classes(wy: Array, wx: Array) -> Array:
    """(N,) int32 index into ``DMA_SIZES``: the smallest (y, x) extent class
    covering the RoI's exact weight span. All-zero rows (padding) map to the
    largest class (their weights are all zero, so any extent is correct)."""
    used_y = jnp.any(wy != 0, axis=1)  # (N, WIN_Y)
    used_x = jnp.any(wx != 0, axis=1)
    span_y = wy.shape[-1] - jnp.argmax(used_y[:, ::-1].astype(jnp.int32), axis=1)
    span_x = wx.shape[-1] - jnp.argmax(used_x[:, ::-1].astype(jnp.int32), axis=1)
    iy = sum((span_y > e).astype(jnp.int32) for e in Y_EXTENTS[:-1])
    ix = sum((span_x > e).astype(jnp.int32) for e in X_EXTENTS[:-1])
    return (iy * len(X_EXTENTS) + ix).astype(jnp.int32)


def _kernel(
    nslot,
    r,  # RoIs per grid step (amortizes the fixed per-step overhead)
    # scalar prefetch
    img_ref,  # (N,) image index per roi
    lvl_ref,  # (N,) level index per roi
    y0_ref,  # (N,) window origin rows
    x0_ref,  # (N,) window origin cols
    cls_ref,  # (N,) window size class: tall*2 + wide
    # inputs
    wyb_ref,  # (1, r*P, r*WIN_Y) BLOCK-DIAGONAL y weights for the step's rois
    wx_ref,  # (r, P, WIN_X) x weights
    f0_ref, f1_ref, f2_ref, f3_ref,  # level features (B, H_l, W_l, C) in ANY
    # output
    out_ref,  # (r, P, P, C)
    # scratch
    win_ref,  # (nslot, WIN_Y, WIN_X, C) VMEM
    sem,
):
    i = pl.program_id(0)
    n = pl.num_programs(0) * r  # total rois (host pads to a multiple of r)

    c = out_ref.shape[-1]
    p = out_ref.shape[1]

    SIZES = DMA_SIZES

    def start_dma(roi, slot):
        """Kick off the window DMA for RoI ``roi`` into buffer ``slot``.

        The copied extent shrinks to (WIN_Y2, WIN_X2) when the RoI's weight
        span allows — most canonical-band RoIs use under half the window, and
        the kernel is window-DMA-bandwidth-bound. Slot regions beyond the
        copied extent hold stale-but-finite data (slots are zero-filled once
        at step 0) whose weights are exactly zero, so outputs are
        bit-identical. The wait in the compute loop reconstructs the SAME
        per-class extent: TPU DMA semaphores count bytes, so the wait
        descriptor must match the started copy.
        """
        img = img_ref[roi]
        lvl = lvl_ref[roi]
        y0 = y0_ref[roi]
        x0 = pl.multiple_of(x0_ref[roi], 16)  # host guarantees 16-aligned
        cls_ = cls_ref[roi]

        def go(fref):
            for cv, (ny, nx) in enumerate(SIZES):

                @pl.when(cls_ == cv)
                def _(ny=ny, nx=nx):
                    pltpu.make_async_copy(
                        fref.at[img, pl.ds(y0, ny), pl.ds(x0, nx), :],
                        win_ref.at[slot, pl.ds(0, ny), pl.ds(0, nx), :],
                        sem.at[slot],
                    ).start()

        @pl.when(lvl == 0)
        def _():
            go(f0_ref)

        @pl.when(lvl == 1)
        def _():
            go(f1_ref)

        @pl.when(lvl == 2)
        def _():
            go(f2_ref)

        @pl.when(lvl == 3)
        def _():
            go(f3_ref)

    def wait_dma(roi, slot):
        cls_ = cls_ref[roi]
        for cv, (ny, nx) in enumerate(SIZES):

            @pl.when(cls_ == cv)
            def _(ny=ny, nx=nx):
                dst = win_ref.at[slot, pl.ds(0, ny), pl.ds(0, nx), :]
                pltpu.make_async_copy(dst, dst, sem.at[slot]).wait()

    # nslot-deep DMA pipeline (nslot a multiple of r): step 0 zero-fills the
    # scratch (so never-copied regions are finite) and fills every slot;
    # step i>0 issues the r DMAs for rois [i*r + nslot - r, i*r + nslot)
    NSLOT = nslot

    @pl.when(i == 0)
    def _():
        win_ref[...] = jnp.zeros_like(win_ref)
        for j in range(NSLOT):

            @pl.when(j < n)
            def _():
                start_dma(j, j)

    for j in range(r):
        roi_pf = i * r + (NSLOT - r) + j

        @pl.when((i > 0) & (roi_pf < n))
        def _(roi_pf=roi_pf):
            start_dma(roi_pf, roi_pf % NSLOT)

    base = (i * r) % NSLOT  # within a step the r slots are contiguous
    for j in range(r):
        wait_dma(i * r + j, base + j)

    # stacked y-pass: ONE (r*P, r*WIN_Y) @ (r*WIN_Y, WIN_X*C) matmul with
    # block-diagonal weights — r tiny M=P matmuls had ~5% MXU utilization;
    # stacking multiplies M (and the utilization) by r at the same wall
    # time. The slot group is selected with a STATIC branch per parity so
    # the stacked read is a contiguous view, not a dynamic-index VMEM copy.
    def compute(g0):
        stacked = win_ref[g0 : g0 + r].reshape(r * WIN_Y, WIN_X * c)
        wyb = wyb_ref[0]  # (r*P, r*WIN_Y)
        t1 = jnp.dot(
            wyb.astype(stacked.dtype), stacked, preferred_element_type=jnp.float32
        ).reshape(r, p, WIN_X, c)
        for j in range(r):
            # x-pass: contract WIN_X: (P, WIN_X) x (P, WIN_X, C) -> (Px,Py,C)
            wx = wx_ref[j]
            t2 = jax.lax.dot_general(
                wx.astype(t1.dtype),
                t1[j],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            out_ref[j] = jnp.transpose(t2, (1, 0, 2)).astype(out_ref.dtype)

    for gi in range(NSLOT // r):

        @pl.when(base == gi * r)
        def _(gi=gi):
            compute(gi * r)


def multilevel_roi_align_pallas(
    features: Sequence[Array],  # per level (B, H_l, W_l, C)
    boxes: Array,  # (B, K, 4) XYXY image coords
    strides: Sequence[int],
    output_size: int = 7,
    sampling_ratio: int = 0,
    min_level: int = 2,
    canonical_box_size: float = 224.0,
    canonical_level: int = 4,
    s_max: int = 16,
    fallback_capacity: int = 32,
    interpret: Optional[bool] = None,
) -> Array:
    """Batched multi-level RoIAlignV2. Returns (B, K, P, P, C)."""
    # pipeline depth bounded by VMEM (~16 MB): size the slot count from the
    # ACTUAL window bytes (C doubles to 512 for the middle-fusion concat
    # backbone, f32 doubles again) against a ~12 MB slot budget. 2 RoIs per
    # grid step when 4 slots fit (block-diag y matmul doubles the MXU M dim;
    # the group read is a static-branch contiguous view). Measured
    # r=3/nslot=6 slightly SLOWER (9.65 vs 9.0 ms/4096 RoIs) — shallower
    # per-group DMA lookahead outweighs the extra M — so r=2/nslot=4 caps.
    slot_bytes = WIN_Y * WIN_X * features[0].shape[-1] * feats_dtype_size(
        features[0].dtype
    )
    nslot = max(2, min(4, (12 << 20) // slot_bytes))
    r = 2 if nslot % 2 == 0 and nslot >= 4 else 1
    if interpret is None:
        # compiled Mosaic kernels need a TPU; tests on the CPU mesh interpret
        interpret = jax.default_backend() != "tpu"
    assert len(features) == 4, "kernel is specialized to 4 FPN levels"
    b, k, _ = boxes.shape
    c = features[0].shape[-1]
    p = output_size
    n = b * k
    n_pad = (-n) % r

    feats = [pad_level(f) for f in features]
    heights = jnp.array([f.shape[1] for f in features], jnp.int32)
    widths = jnp.array([f.shape[2] for f in features], jnp.int32)
    pad_hs = jnp.array([f.shape[1] for f in feats], jnp.int32)
    pad_ws = jnp.array([f.shape[2] for f in feats], jnp.int32)

    flat_boxes = boxes.reshape(n, 4)
    levels = roi_level_assignment(
        flat_boxes, min_level, min_level + 3, canonical_box_size, canonical_level
    )
    lvl_idx = levels - min_level

    y0w, x0w, wy, wx, oow = build_window_weights(
        flat_boxes, lvl_idx, strides, heights, widths, pad_hs, pad_ws,
        p, sampling_ratio, s_max,
    )

    img_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), k)
    size_cls = window_size_classes(wy, wx)
    if n_pad:
        pad1 = [(0, n_pad)]
        img_idx = jnp.pad(img_idx, pad1)
        lvl_idx_k = jnp.pad(lvl_idx, pad1)
        y0w = jnp.pad(y0w, pad1)
        x0w = jnp.pad(x0w, pad1)
        size_cls = jnp.pad(size_cls, pad1, constant_values=len(DMA_SIZES) - 1)
        wy = jnp.pad(wy, pad1 + [(0, 0)] * 2)
        wx = jnp.pad(wx, pad1 + [(0, 0)] * 2)
    else:
        lvl_idx_k = lvl_idx

    # block-diagonal y-weights per r-group: (G, r*P, r*WIN_Y). Built with
    # pad+concat (one fusion) — the .at[].set form lowered to a 1.8 ms
    # dynamic-update-slice at batch-8 inference.
    g = (n + n_pad) // r
    wy_g = wy.reshape(g, r, p, WIN_Y)
    wyb = jnp.concatenate(
        [
            jnp.pad(
                wy_g[:, j],
                [(0, 0), (0, 0), (j * WIN_Y, (r - 1 - j) * WIN_Y)],
            )
            for j in range(r)
        ],
        axis=1,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, r * p, r * WIN_Y), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((r, p, WIN_X), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((r, p, p, c), lambda i, *_: (i, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((nslot, WIN_Y, WIN_X, c), feats[0].dtype),
            pltpu.SemaphoreType.DMA((nslot,)),
        ],
    )

    pooled = pl.pallas_call(
        functools.partial(_kernel, nslot, r),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n + n_pad, p, p, c), features[0].dtype),
        interpret=interpret,
    )(img_idx, lvl_idx_k, y0w, x0w, size_cls, wyb, wx, *feats)

    pooled = pooled[:n].reshape(b, k, p, p, c)

    if fallback_capacity > 0:
        def fb(pooled_i, oow_i, boxes_i, lvl_i, feats_i):
            return apply_oow_fallback(
                pooled_i, oow_i, feats_i, boxes_i, lvl_i, strides, p,
                sampling_ratio, fallback_capacity,
            )

        pooled = jax.vmap(fb, in_axes=(0, 0, 0, 0, 0))(
            pooled,
            oow.reshape(b, k),
            boxes,
            lvl_idx.reshape(b, k),
            list(features),
        )
    return pooled


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8, 9))
def multilevel_roi_align_pallas_train(
    features,  # list of (B, H_l, W_l, C)
    boxes,  # (B, K, 4)
    strides,
    output_size: int = 7,
    sampling_ratio: int = 0,
    min_level: int = 2,
    canonical_box_size: float = 224.0,
    canonical_level: int = 4,
    s_max: int = 16,
    fallback_capacity: int = 32,
):
    """Batched training pooling: Pallas windowed-DMA forward + the shared
    SCATTER-FREE whole-map matmul backward (ops/roi_align.
    wholemap_roi_align_grad). The forward gather path measured ~59 ms and its
    native scatter backward ~390 ms of a 640 ms batch-8 train step; this
    pairing runs the same math as two MXU matmul families."""
    return multilevel_roi_align_pallas(
        features, boxes, list(strides), output_size, sampling_ratio,
        min_level, canonical_box_size, canonical_level, s_max,
        fallback_capacity,
    )


def _pallas_train_fwd(features, boxes, strides, output_size, sampling_ratio,
                      min_level, canonical_box_size, canonical_level, s_max,
                      fallback_capacity):
    out = multilevel_roi_align_pallas_train(
        features, boxes, strides, output_size, sampling_ratio, min_level,
        canonical_box_size, canonical_level, s_max, fallback_capacity,
    )
    return out, (features, boxes)


def _pallas_train_bwd(strides, output_size, sampling_ratio, min_level,
                      canonical_box_size, canonical_level, s_max,
                      fallback_capacity, res, g):
    from .roi_align import wholemap_roi_align_grad

    features, boxes = res

    def per_image(feats_i, boxes_i, g_i):
        return wholemap_roi_align_grad(
            list(feats_i), boxes_i, g_i, strides, output_size,
            sampling_ratio, min_level, canonical_box_size, canonical_level,
        )

    dfs = jax.vmap(per_image)(list(features), boxes, g)
    if isinstance(features, tuple):
        dfs = tuple(dfs)
    return dfs, jnp.zeros_like(boxes)


multilevel_roi_align_pallas_train.defvjp(_pallas_train_fwd, _pallas_train_bwd)
