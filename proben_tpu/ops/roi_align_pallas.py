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
import os
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

# Opt-in switch for the fused Pallas RoIAlign backward (see _pallas_train_bwd
# for the round-4 measurements that keep the einsum path the default).
USE_PALLAS_BWD = False

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
    one_class,  # interpret mode: single max-extent DMA class (see host)
    # scalar prefetch
    img_ref,  # (N,) image index per roi (HOST-SORTED window order)
    lvl_ref,  # (N,) level index per roi
    y0_ref,  # (N,) window origin rows
    x0_ref,  # (N,) window origin cols
    cls_ref,  # (N,) window size class index into DMA_SIZES
    dma_ref,  # (N,) dma index per roi: D[q] = index of roi q's window copy
    order_ref,  # (N,) roi index of the d-th DMA (inverse of D on run leaders)
    # inputs
    wyb_ref,  # (1, r*P, r*WIN_Y) y weights: block-diag (pair) or left-stacked (dup)
    wx_ref,  # (r, P, WIN_X) x weights
    f0_ref, f1_ref, f2_ref, f3_ref,  # level features (B, H_l, W_l, C) in ANY
    # output
    out_ref,  # (r, P, P, C)
    # scratch
    win_ref,  # (nslot, WIN_Y, WIN_X, C) VMEM
    sem,
):
    """Windowed-DMA pooling with DUPLICATE-WINDOW SKIPPING.

    The host sorts RoIs by (img, lvl, y0, x0, cls) so RoIs sharing one exact
    window become adjacent runs; only each run's LEADER fetches the window
    (one DMA per distinct window, slot = dma_index % nslot). The kernel is
    per-RoI-issue-cost-bound (docs/PERF.md), and at bench conditions ~36% of
    RoIs continue a duplicate run (~61% with Y_ALIGN=4) — proposals cluster
    on objects — so skipping duplicate fetches attacks the dominant cost
    directly. Slot-overwrite safety is unchanged from the dense rotation:
    DMA d+nslot is issued at least one grid step AFTER the step that waits
    on (and last reads) DMA d, because issue windows advance with D.
    """
    i = pl.program_id(0)
    n = pl.num_programs(0) * r  # total rois (host pads to a multiple of r)

    c = out_ref.shape[-1]
    p = out_ref.shape[1]

    # In interpret mode only the LAST (max-extent) class occurs: extent
    # classes merely trim zero-weight copy tails (window origins are clamped
    # so the full window is always in bounds), and every pl.when branch is
    # traced per call — collapsing 5 classes x 4 levels to 1 x 4 cuts the
    # fixed ~8 s/call interpret trace cost that dominated the CPU test suite.
    SIZES = list(enumerate(DMA_SIZES))[-1:] if one_class else list(
        enumerate(DMA_SIZES)
    )
    NSLOT = nslot

    def start_dma(roi, slot):
        """Kick off the window DMA for RoI ``roi`` into buffer ``slot``.

        The copied extent shrinks to the RoI's size class. Slot regions
        beyond the copied extent hold stale-but-finite data (slots are
        zero-filled once at step 0) whose weights are exactly zero, so
        outputs are bit-identical. The wait reconstructs the SAME per-class
        extent: TPU DMA semaphores count bytes, so the wait descriptor must
        match the started copy. Duplicate RoIs share the leader's class
        (cls is part of the sort key), so their weight spans are covered.
        """
        img = img_ref[roi]
        lvl = lvl_ref[roi]
        y0 = y0_ref[roi]
        x0 = pl.multiple_of(x0_ref[roi], 16)  # host guarantees 16-aligned
        cls_ = cls_ref[roi]

        def go(fref):
            for cv, (ny, nx) in SIZES:

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
        for cv, (ny, nx) in SIZES:

            @pl.when(cls_ == cv)
            def _(ny=ny, nx=nx):
                dst = win_ref.at[slot, pl.ds(0, ny), pl.ds(0, nx), :]
                pltpu.make_async_copy(dst, dst, sem.at[slot]).wait()

    n_dma = dma_ref[n - 1] + 1

    # DMA-space pipeline: step 0 zero-fills the scratch (never-copied regions
    # stay finite) and issues copies [0, nslot); step i>0 issues copies
    # [D[r*(i-1)] + nslot, D[r*i] + nslot) — at most r per step since D grows
    # by <= 1 per roi, and continuous across steps. Duplicate runs compress
    # D, so the prefetch pointer runs AHEAD in roi-space (deeper effective
    # lookahead, never shallower).
    @pl.when(i == 0)
    def _():
        win_ref[...] = jnp.zeros_like(win_ref)
        for d in range(NSLOT):

            @pl.when(d < n_dma)
            def _(d=d):
                start_dma(order_ref[d], d % NSLOT)

    @pl.when(i > 0)
    def _():
        prev = dma_ref[jnp.maximum(i - 1, 0) * r]
        cur = dma_ref[i * r]
        for j in range(r):
            d = prev + NSLOT + j

            @pl.when(d < jnp.minimum(cur + NSLOT, n_dma))
            def _(d=d):
                start_dma(order_ref[d], d % NSLOT)

    # waits: exactly one per DMA, at its run leader (the first roi of the
    # run — detected as D[q] != D[q-1]; roi 0 is always a leader)
    for j in range(r):
        q = i * r + j
        is_leader = (q == 0) | (dma_ref[q] != dma_ref[jnp.maximum(q - 1, 0)])

        @pl.when(is_leader)
        def _(q=q):
            wait_dma(q, dma_ref[q] % NSLOT)

    # stacked y-pass: ONE (r*P, .) @ (., WIN_X*C) matmul — r tiny M=P matmuls
    # had ~5% MXU utilization; stacking multiplies M by r at the same wall
    # time. Slots are selected with STATIC branches on (base, mode) so every
    # read is a static view. Three shapes:
    #   dup   — both RoIs share one window: (r*P, WIN_Y) @ slot b
    #   pair  — consecutive slots b, b+1: block-diag (r*P, r*WIN_Y) @ view
    #   split — slot wrap (b = nslot-1): per-RoI (P, WIN_Y) matmuls
    # All three sum identical nonzero terms in identical order (the extra
    # operands are exact zeros), so outputs are bit-identical across modes.
    wyb = wyb_ref[0]  # (r*P, r*WIN_Y)
    d0 = dma_ref[i * r]
    d1 = dma_ref[i * r + (r - 1)]

    def x_pass(t1):
        # t1: (r, P, WIN_X, C)
        for j in range(r):
            wx = wx_ref[j]
            t2 = jax.lax.dot_general(
                wx.astype(t1.dtype),
                t1[j],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            out_ref[j] = jnp.transpose(t2, (1, 0, 2)).astype(out_ref.dtype)

    def compute_dup(b):
        win = win_ref[b].reshape(WIN_Y, WIN_X * c)
        t1 = jnp.dot(
            wyb[:, :WIN_Y].astype(win.dtype), win,
            preferred_element_type=jnp.float32,
        ).reshape(r, p, WIN_X, c)
        x_pass(t1)

    def compute_pair(b):
        stacked = win_ref[b : b + r].reshape(r * WIN_Y, WIN_X * c)
        t1 = jnp.dot(
            wyb.astype(stacked.dtype), stacked, preferred_element_type=jnp.float32
        ).reshape(r, p, WIN_X, c)
        x_pass(t1)

    def compute_split(b):
        # slots wrap (b, 0): per-RoI y-pass with the matching wyb block
        t1s = []
        for j in range(r):
            slot = (b + j) % NSLOT
            win = win_ref[slot].reshape(WIN_Y, WIN_X * c)
            t1s.append(
                jnp.dot(
                    wyb[j * p : (j + 1) * p, j * WIN_Y : (j + 1) * WIN_Y].astype(
                        win.dtype
                    ),
                    win,
                    preferred_element_type=jnp.float32,
                ).reshape(1, p, WIN_X, c)
            )
        x_pass(jnp.concatenate(t1s, axis=0))

    for b in range(NSLOT):

        @pl.when((d0 % NSLOT == b) & (d1 == d0))
        def _(b=b):
            compute_dup(b)

        if b + r <= NSLOT:

            @pl.when((d0 % NSLOT == b) & (d1 != d0))
            def _(b=b):
                compute_pair(b)
        else:

            @pl.when((d0 % NSLOT == b) & (d1 != d0))
            def _(b=b):
                compute_split(b)


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
    return_perm: bool = False,
    realloc: bool = False,
) -> Array:
    """Batched multi-level RoIAlignV2. Returns (B, K, P, P, C).

    ``realloc`` enables the level-map buffer-reallocation cliff guard (see
    inline comment below). Callers opt in PER SURFACE: the buffer-placement
    cliff is program-specific — the guard measured 151.0 -> 54.7 ms/batch
    on the b8 inference graph but 129 -> 180 ms/step on the b8 TRAIN graph
    (round 5), so inference passes True and the train wrapper False.
    ``PROBEN_POOL_REALLOC=0/1`` force-overrides for probing.

    With ``return_perm`` returns (pooled, perm) where ``pooled`` stays in the
    kernel's window-sorted order and ``perm`` (B, K) holds per-image local
    indices such that ``pooled[b, j] == pooled_original[b, perm[b, j]]``.
    Callers permute their per-RoI metadata instead — un-permuting the
    (B*K, P, P, C) tensor itself costs a full read+write pass (~0.9 ms at
    batch-8 bench shapes). Requires r | B*K (no padding rows).
    """
    # C>256 (the middle-fusion concat backbone) runs as TWO channel-half
    # calls: pooling is per-channel linear so the split is exact, and it
    # sidesteps a measured Mosaic per-step cliff — C=512 windows put the
    # kernel in a ~28 us/RoI regime at FLIR map sizes (vs ~2 us at C=256;
    # trigger depends on batch x map dims, docs/PERF.md round 3d) on top of
    # the shallower nslot=3/r=1 slot budget the 3.7 MB windows force.
    if features[0].shape[-1] > 256:
        c_total = features[0].shape[-1]
        split = c_total // 2
        outs = [
            multilevel_roi_align_pallas(
                [f[..., lo:hi] for f in features], boxes, list(strides),
                output_size, sampling_ratio, min_level, canonical_box_size,
                canonical_level, s_max, fallback_capacity, interpret,
                return_perm, realloc,
            )
            for lo, hi in ((0, split), (split, c_total))
        ]
        if return_perm:
            # both half-C calls sort by the same (channel-free) key
            return jnp.concatenate([outs[0][0], outs[1][0]], axis=-1), outs[0][1]
        return jnp.concatenate(outs, axis=-1)
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
    # defense in depth for the kernel's lvl-dispatched DMA starts: an
    # out-of-range level would skip the start while the class-dispatched
    # wait still runs — a chip-hanging semaphore deadlock (see
    # roi_level_assignment's non-finite guard; int clip is total)
    lvl_idx = jnp.clip(levels - min_level, 0, 3)

    y0w, x0w, wy, wx, oow = build_window_weights(
        flat_boxes, lvl_idx, strides, heights, widths, pad_hs, pad_ws,
        p, sampling_ratio, s_max,
    )

    img_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), k)
    size_cls = window_size_classes(wy, wx)
    if interpret:
        # single max-extent class (matches the kernel's one_class branch
        # tree); outputs are unchanged — the extra copied region has
        # exactly-zero weights
        size_cls = jnp.full_like(size_cls, len(DMA_SIZES) - 1)
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
    nt = n + n_pad

    # ---- duplicate-window dedup (see _kernel docstring) ----
    # sort key packs (img, lvl, y0, x0, cls) into one int32: 27 bits used
    # (y0/x0 < 512 after padding+alignment, cls < 16, lvl < 4). Padding rois
    # sort last (max key) and become one shared "window".
    sort_key = (
        (((img_idx * 4 + lvl_idx_k) << 9 | y0w) << 9 | x0w) << 4
    ) | size_cls
    if n_pad:
        sort_key = sort_key.at[n:].set(jnp.int32(2**31 - 1))
    perm = jnp.argsort(sort_key)  # stable
    key_s = sort_key[perm]
    img_idx = img_idx[perm]
    lvl_idx_k = lvl_idx_k[perm]
    y0w = y0w[perm]
    x0w = x0w[perm]
    size_cls = size_cls[perm]
    wy = wy[perm]
    wx = wx[perm]
    dup = jnp.concatenate(
        [jnp.zeros((1,), bool), key_s[1:] == key_s[:-1]]
    )
    dma_idx = jnp.cumsum((~dup).astype(jnp.int32)) - 1  # (NT,) D[q]
    # roi index of the d-th DMA: leaders scatter their roi index to slot D
    dma_order = (
        jnp.zeros((nt + 1,), jnp.int32)
        .at[jnp.where(dup, nt, dma_idx)]
        .set(jnp.arange(nt, dtype=jnp.int32))[:nt]
    )

    # y-weights per r-group: block-diagonal (G, r*P, r*WIN_Y) for pair
    # groups, both blocks LEFT-stacked in columns [0, WIN_Y) for dup groups
    # (the kernel's dup variant multiplies the shared window by a vertically
    # stacked (r*P, WIN_Y) matrix). Built with pad+concat — .at[].set lowered
    # to a 1.8 ms dynamic-update-slice at batch-8 inference.
    g = nt // r
    wy_g = wy.reshape(g, r, p, WIN_Y)
    wyb_pair = jnp.concatenate(
        [
            jnp.pad(
                wy_g[:, j],
                [(0, 0), (0, 0), (j * WIN_Y, (r - 1 - j) * WIN_Y)],
            )
            for j in range(r)
        ],
        axis=1,
    )
    if r > 1:
        wyb_dup = jnp.pad(
            wy_g.reshape(g, r * p, WIN_Y), [(0, 0), (0, 0), (0, (r - 1) * WIN_Y)]
        )
        gmode_dup = (
            dma_idx.reshape(g, r)[:, r - 1] == dma_idx.reshape(g, r)[:, 0]
        )
        wyb = jnp.where(gmode_dup[:, None, None], wyb_dup, wyb_pair)
    else:
        wyb = wyb_pair

    # Mosaic producer-adjacency cliff guard: a kernel instance whose feature
    # operands are consumed DIRECTLY from conv-produced intermediates can
    # fall into a deterministic ~28 us/grid-step mode (~8x) depending on
    # graph position — round 4 saw the single-modality b8 instance flip into
    # it from an unrelated STEM reformulation (13.4 -> 111.2 ms/batch). The
    # barrier pins the producer/kernel scheduling boundary and restores the
    # fast mode (dev/mosaic_cliff_repro.py pins this trigger); the operands
    # are materialized FPN maps either way, so it costs nothing.
    if os.environ.get("PROBEN_POOL_BARRIER", "1") == "1":
        feats = list(jax.lax.optimization_barrier(tuple(feats)))
    if os.environ.get("PROBEN_POOL_FLATTEN", "0") == "1":
        # layout-normalization probe: flatten+reshape is a bitcast when the
        # level map already has the default layout, a relayout copy when an
        # upstream layout choice propagated into it
        feats = [f.reshape(-1).reshape(f.shape) for f in feats]
    env_realloc = os.environ.get("PROBEN_POOL_REALLOC")
    if realloc if env_realloc is None else env_realloc == "1":
        # buffer REALLOCATION guard for the ~28 us/step cliff mode that the
        # scheduling barrier does NOT fix (round 5: pack24 AND pallas-stem
        # graph contexts both flipped the kernel 13.4 -> 111 ms/batch with
        # identical kernel MLIR — so the slowdown is runtime HBM buffer
        # placement, not Mosaic codegen): forcing each level map into a
        # fresh, differently-sized allocation at a shifted offset restores
        # the fast mode (151.0 -> 54.7 ms/batch b8 flagship, pallas stem).
        # Placement is program-specific, hence the per-surface opt-in (see
        # docstring). Costs 4 map copies (~35 MB, pad fusion 0.66 ms at b8;
        # the padded maps feed the kernel DIRECTLY — window origins are
        # clamped to the pre-pad bounds, so the extra rows are never read
        # and the round-trip slice-back copy (0.64 ms) is unnecessary. The
        # barrier keeps XLA from folding the pads away.
        feats = [
            jnp.pad(f, ((0, 0), (0, 8 * (i + 1)), (0, 0), (0, 0)))
            for i, f in enumerate(feats)
        ]
        feats = list(jax.lax.optimization_barrier(tuple(feats)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
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
        functools.partial(_kernel, nslot, r, interpret),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nt, p, p, c), features[0].dtype),
        interpret=interpret,
    )(img_idx, lvl_idx_k, y0w, x0w, size_cls, dma_idx, dma_order,
      wyb, wx, *feats)

    if return_perm and n_pad == 0:
        # keep the window-sorted order; hand the caller per-image local
        # indices instead. The (img, ...) sort key is image-major and every
        # image holds exactly k rows, so sorted block i IS image i.
        local_perm = perm - (jnp.arange(nt, dtype=jnp.int32) // k) * k
        fb_oow = oow[perm].reshape(b, k)
        fb_boxes = flat_boxes[perm].reshape(b, k, 4)
        fb_lvl = lvl_idx[perm].reshape(b, k)
        pooled = pooled.reshape(b, k, p, p, c)
    else:
        # n_pad != 0 (r does not divide B*K, e.g. an odd post_nms_topk):
        # the padded tail rows break the "sorted block i IS image i"
        # identity, so fall back to un-permuting the pooled tensor and
        # return the identity perm — same caller contract, one extra
        # gather pass (the configs we ship never hit this).
        local_perm = jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32), (b, k))
        # undo the window sort (gather by inverse permutation; this sits
        # inside the train path's custom VJP, so it is never differentiated).
        # The inverse is a scatter of iota — a second argsort costs a full
        # 8k-row sort pass (~0.26 ms/batch) for the same result.
        inv_perm = (
            jnp.zeros((nt,), jnp.int32)
            .at[perm]
            .set(jnp.arange(nt, dtype=jnp.int32))
        )
        pooled = pooled[inv_perm][:n].reshape(b, k, p, p, c)
        fb_oow = oow.reshape(b, k)
        fb_boxes = boxes
        fb_lvl = lvl_idx.reshape(b, k)

    if fallback_capacity > 0:
        def run_fallback(pooled_in):
            def fb(pooled_i, oow_i, boxes_i, lvl_i, feats_i):
                return apply_oow_fallback(
                    pooled_i, oow_i, feats_i, boxes_i, lvl_i, strides, p,
                    sampling_ratio, fallback_capacity,
                )

            return jax.vmap(fb, in_axes=(0, 0, 0, 0, 0))(
                pooled_in, fb_oow, fb_boxes, fb_lvl, list(features),
            )

        # Batch-level gate: the exact whole-map re-pool is only needed when
        # some RoI's span overflowed its window, which is rare at FLIR/KAIST
        # box statistics (docs/PERF.md: a ~1.8 ms/batch "oow tax" paid every
        # inference batch). This function sits at the batch level (never
        # vmapped), so lax.cond executes ONE branch; with oow rows present
        # the computation is exactly the unconditional one.
        pooled = jax.lax.cond(
            jnp.any(oow[:n]), run_fallback, lambda p_: p_, pooled
        )
    if return_perm:
        return pooled, local_perm.reshape(b, k)
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
    features, boxes = res

    if USE_PALLAS_BWD and jax.default_backend() == "tpu":
        # fused Pallas backward (ops/roi_align_bwd_pallas): keeps the u
        # intermediate in VMEM tile-by-tile. MEASURED round 4: the kernel
        # itself is 7.6 ms at bench shapes (vs the einsum path's 12.2 ms
        # after its y-first/longer-axis-first optimizations) but the
        # XLA-side per-visit weight relayout gathers cost ~127 ms, and the
        # block-diag first dot wastes FLOPs quadratically in the RoI block
        # size — end-to-end it is parity-at-best with the einsum path, so
        # the einsum backward stays the default (docs/PERF.md round 4).
        from .roi_align_bwd_pallas import wholemap_grad_pallas

        dfs = wholemap_grad_pallas(
            list(features), boxes, g, strides, output_size, sampling_ratio,
            min_level, canonical_box_size, canonical_level, s_max,
            fallback_capacity,
        )
    else:
        # scatter-free einsum backward: both dots near HBM peak on the u
        # intermediate, contraction ordered so u carries the shorter
        # spatial axis (12.2 ms at batch-8 bench shapes)
        from .roi_align import wholemap_roi_align_grad

        def per_image(feats_i, boxes_i, g_i):
            return wholemap_roi_align_grad(
                list(feats_i), boxes_i, g_i, strides, output_size,
                sampling_ratio, min_level, canonical_box_size,
                canonical_level,
            )

        dfs = jax.vmap(per_image)(list(features), boxes, g)
    if isinstance(features, tuple):
        dfs = tuple(dfs)
    return dfs, jnp.zeros_like(boxes)


multilevel_roi_align_pallas_train.defvjp(_pallas_train_fwd, _pallas_train_bwd)
