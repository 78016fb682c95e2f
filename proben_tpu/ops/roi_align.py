"""RoIAlign (V2 / ``aligned=True``) as windowed dense einsums with per-box
separable interpolation-weight matrices — exact ADAPTIVE sampling included.

TPU-native replacement for the reference CUDA kernel
(`detectron2/layers/csrc/ROIAlign/ROIAlign_cuda.cu:88-140`) and the
multi-level ``ROIPooler`` scatter/gather (`detectron2/modeling/poolers.py:84-235`).

Key reformulation: ROIAlignV2's bilinear sampling + in-bin averaging is fully
separable per axis, so for every RoI the pooled output is two small matmuls

    out[p, q, c] = sum_{h, w} Wy[p, h] * Wx[q, w] * window[h, w, c]

where ``Wy`` (P, WIN) folds — per output row p — ALL of that bin's sample
rows' bilinear weights and the 1/grid averaging into one dense row-weight
vector. Because the sampling grid count only changes the WEIGHTS and never
the compute shape, the reference's adaptive sampling ratio
(``POOLER_SAMPLING_RATIO=0`` → ``grid = ceil(roi_size/P)`` per RoI, the
detectron2 default, `detectron2/config/defaults.py:290`) is exact here at the
same cost as any static ratio — no ragged shapes, MXU-friendly.

Exact CUDA-kernel semantics reproduced (`ROIAlign_cuda.cu:88-140`):
  * coordinates scaled by 1/stride then shifted by -0.5 (half-pixel, V2)
  * grid_y = ceil(roi_h/P) when ratio==0 (can be <=0 for degenerate boxes ->
    that axis contributes nothing and the output is 0, count = max(g*g, 1))
  * sample points outside [-1, H] x [-1, W] contribute exactly 0 but still
    count in the average divisor
  * in-range points are clamped to [0, H-1] x [0, W-1]; the high bilinear
    index is border-clamped (y0 >= H-1 -> all weight on row H-1)

Evaluation strategy (static shapes, three tiers):
  1. windowed einsum: each RoI reads one static (WIN_Y, WIN_X) window of its
     FPN level (XLA slice-gather here; DMA in ops/roi_align_pallas.py — both
     consume the SAME weights/origins, so they agree bit-for-bit in f32).
  2. whole-map fallback: RoIs whose sample span or grid count exceeds the
     window ("out-of-window", e.g. pathologically elongated boxes) are
     detected during weight construction; the top ``fallback_capacity`` of
     them are re-pooled exactly against their FULL (unwindowed) level map.
  3. beyond-capacity overflow (requires > capacity giant-span RoIs in one
     image) keeps the window-clamped approximation of tier 1.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray

# Static feature-space window, shared with the Pallas kernel: the x (W) axis
# is sublane-tiled in the HBM layout, so its DMA offset must be aligned — the
# origin is aligned down to 16 and the window widened to 64 to compensate.
WIN_Y = 56
WIN_X = 64
X_ALIGN = 16
# y origins are aligned too (costing <= Y_ALIGN-1 rows of window slack) so
# that RoIs clustered on the same object share EXACT window descriptors —
# the Pallas kernel dedups identical windows across sorted RoIs, and origin
# alignment raises the duplicate rate from ~36% (align 1) to ~71% (align 8)
# at bench conditions (kernel 14.9 -> 13.4 ms/8192 RoIs; align 4 = 13.8).
# Outputs are invariant to the origin shift (weights are window-relative).
Y_ALIGN = 8


def roi_level_assignment(
    boxes: Array,
    min_level: int,
    max_level: int,
    canonical_box_size: float = 224.0,
    canonical_level: int = 4,
) -> Array:
    """FPN level per box by sqrt(area), reference ``poolers.py:13``.

    Returns int32 levels in [min_level, max_level].
    """
    area = jnp.clip(
        (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1]), 1e-6, None
    )
    sqrt_area = jnp.sqrt(area)
    lvl = jnp.floor(canonical_level + jnp.log2(sqrt_area / canonical_box_size + 1e-8))
    # total under non-finite boxes: clip(NaN) stays NaN and the int cast of
    # NaN is implementation-defined — a garbage level reaches the Pallas
    # kernel as a start-DMA branch that never fires while its semaphore
    # wait still runs, hanging the chip until the watchdog kills the worker
    # (reproduced: dev/nan_box_repro.py; a mid-divergence training step
    # must produce garbage outputs, not a dead TPU)
    lvl = jnp.where(jnp.isfinite(lvl), lvl, float(min_level))
    return jnp.clip(lvl, min_level, max_level).astype(jnp.int32)


def axis_weights(
    start: Array,  # (K,) roi start coordinate (feature space, V2-aligned)
    bin_sz: Array,  # (K,) bin size = roi_span / P (may be <= 0)
    dim_size: Array,  # (K,) level H (or W) per RoI
    win_start: Array,  # (K,) int32 window origin (0 for whole-map)
    win: int,  # static window extent
    p: int,  # pooled output size along this axis
    ratio: int,  # static sampling ratio; 0 = adaptive ceil(bin_sz)
    s_max: int,  # static number of sample slots (== ratio when ratio > 0)
) -> Tuple[Array, Array]:
    """(K, P, win) composite f32 row weights + (K,) out-of-window flags.

    Folds bilinear interpolation and in-bin sample averaging into one dense
    weight matrix per RoI with exact ROIAlignV2 border semantics.
    """
    if ratio > 0:
        s_max = ratio
        grid = jnp.full(start.shape, float(ratio), jnp.float32)
        over = jnp.zeros(start.shape, bool)
    else:
        # reference: roi_bin_grid = ceil(roi_size / pooled_size) == ceil(bin)
        grid = jnp.ceil(bin_sz)
        over = grid > float(s_max)  # adaptive grid beyond slot capacity

    gridc = jnp.clip(grid, 1.0, float(s_max))  # sampling divisor
    i = jnp.arange(s_max, dtype=jnp.float32)
    pp = jnp.arange(p, dtype=jnp.float32)
    # sample coordinates (K, P, S): start + (p + (i+0.5)/grid) * bin
    coords = (
        start[:, None, None]
        + (pp[None, :, None] + (i[None, None, :] + 0.5) / gridc[:, None, None])
        * bin_sz[:, None, None]
    )
    slot_ok = i[None, None, :] < jnp.minimum(grid, float(s_max))[:, None, None]
    dimf = dim_size.astype(jnp.float32)[:, None, None]
    # outside [-1, dim] -> contributes 0 (but still counts in the divisor)
    valid = (coords >= -1.0) & (coords <= dimf)
    c = jnp.clip(coords, 0.0, dimf - 1.0)
    c0 = jnp.floor(c)
    frac = c - c0
    # border clamp: hi index out of range -> all weight moves to lo
    hi_oob = c0 + 1.0 > dimf - 1.0
    frac = jnp.where(hi_oob, 0.0, frac)
    rel = c0.astype(jnp.int32) - win_start[:, None, None]

    active = slot_ok & valid
    lost = active & (
        (rel < 0) | (rel > win - 1) | ((rel > win - 2) & (frac > 0.0))
    )
    oow = jnp.any(lost, axis=(1, 2)) | over

    lo = jnp.clip(rel, 0, win - 1)
    hi = jnp.clip(rel + 1, 0, win - 1)
    cols = jnp.arange(win, dtype=jnp.int32)
    w_lo = (cols == lo[..., None]) * (1.0 - frac)[..., None]
    w_hi = (cols == hi[..., None]) * frac[..., None]
    w = jnp.sum((w_lo + w_hi) * active[..., None].astype(jnp.float32), axis=2)
    w = w / gridc[:, None, None]
    return w.astype(jnp.float32), oow


def window_origin(
    start: Array,  # (K,) first sample-span coordinate (feature space)
    dim: Array,  # (K,) level extent
    pad_dim: Array,  # (K,) padded level extent (>= win)
    win: int,
    align: int = 1,
) -> Array:
    """Per-RoI window origin: floor of the clamped span start, aligned down.

    Shared by the XLA and Pallas paths so their weights are identical.
    """
    first = jnp.clip(start, 0.0, dim.astype(jnp.float32) - 1.0)
    o = jnp.floor(first).astype(jnp.int32)
    o = (o // align) * align
    return jnp.clip(o, 0, pad_dim - win)


@functools.lru_cache(maxsize=None)
def _make_window_gather(rows: int, c: int, win_x: int, dtype_name: str):
    """custom-vjp'd (rows, C) x (M,) -> (M, win_x, C) contiguous slice gather.

    XLA lowers a gather's native transpose to a serial one-row-per-iteration
    scatter on TPU (measured 1.6 s/step in round 1); the explicit dense
    scatter-add below is ~25x faster.
    """
    dtype = jnp.dtype(dtype_name)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,)
    )

    @jax.custom_vjp
    def window_gather(flat, starts):
        return jax.lax.gather(
            flat, starts[:, None], dn, slice_sizes=(win_x, c),
            mode=jax.lax.GatherScatterMode.CLIP,
        )

    def fwd(flat, starts):
        return window_gather(flat, starts), starts

    def bwd(starts, g):
        idx = (starts[:, None] + jnp.arange(win_x, dtype=jnp.int32)[None, :]).reshape(-1)
        out = jnp.zeros((rows, c), jnp.float32)
        out = out.at[idx].add(g.reshape(-1, c).astype(jnp.float32))
        return out.astype(dtype), None

    window_gather.defvjp(fwd, bwd)
    return window_gather


def _gather_windows(flat: Array, starts: Array, win_x: int) -> Array:
    fn = _make_window_gather(flat.shape[0], flat.shape[1], win_x, str(flat.dtype))
    return fn(flat, starts)


def _pool_from_windows(windows: Array, wy: Array, wx: Array, out_dtype) -> Array:
    """(K, WY, WX, C) x (K, P, WY) x (K, P, WX) -> (K, P, P, C), f32 accum."""
    wdt = windows.dtype
    t1 = jax.lax.dot_general(
        wy.astype(wdt), windows,
        dimension_numbers=((((2,), (1,))), (((0,), (0,)))),
        preferred_element_type=jnp.float32,
    )  # (K, P, WX, C)
    out = jax.lax.dot_general(
        wx.astype(t1.dtype), t1,
        dimension_numbers=((((2,), (2,))), (((0,), (0,)))),
        preferred_element_type=jnp.float32,
    )  # (K, Px, Py, C)
    return jnp.transpose(out, (0, 2, 1, 3)).astype(out_dtype)


def _roi_geometry(
    boxes: Array,  # (K, 4) XYXY image coords
    lvl_idx: Array,  # (K,) level index (0-based into `strides`)
    strides: Sequence[int],
    p: int,
):
    """Per-RoI V2-aligned start/bin per axis at the assigned level."""
    inv_strides = jnp.array([1.0 / s for s in strides], jnp.float32)
    scale = inv_strides[lvl_idx]
    x1 = boxes[:, 0] * scale - 0.5
    y1 = boxes[:, 1] * scale - 0.5
    bin_w = (boxes[:, 2] * scale - 0.5 - x1) / p
    bin_h = (boxes[:, 3] * scale - 0.5 - y1) / p
    return y1, x1, bin_h, bin_w


def wholemap_roi_align(
    features: Sequence[Array],  # per level (H_l, W_l, C), unpadded
    boxes: Array,  # (B, 4)
    lvl_idx: Array,  # (B,) 0-based level index
    strides: Sequence[int],
    output_size: int,
    sampling_ratio: int,
) -> Array:
    """Exact pooling against full (unwindowed) level maps. O(B * H_l * W_l * C)
    per level — use only for the few out-of-window RoIs."""
    p = output_size
    y1, x1, bin_h, bin_w = _roi_geometry(boxes, lvl_idx, strides, p)
    zero = jnp.zeros(boxes.shape[0], jnp.int32)
    c = features[0].shape[-1]
    out = jnp.zeros((boxes.shape[0], p, p, c), jnp.float32)
    for li, f in enumerate(features):
        h_l, w_l = f.shape[0], f.shape[1]
        # static slot count covering any in-map span (+2 margin for spans
        # slightly beyond the map; samples there are zero-contribution)
        s_hi_y = max(sampling_ratio, -(-h_l // p) + 2)
        s_hi_x = max(sampling_ratio, -(-w_l // p) + 2)
        dim_h = jnp.full_like(zero, h_l)
        dim_w = jnp.full_like(zero, w_l)
        wy, _ = axis_weights(y1, bin_h, dim_h, zero, h_l, p, sampling_ratio, s_hi_y)
        wx, _ = axis_weights(x1, bin_w, dim_w, zero, w_l, p, sampling_ratio, s_hi_x)
        m = (lvl_idx == li).astype(jnp.float32)[:, None, None]
        # contract the LONGER spatial axis into the map first so the
        # (B, P, dim, C) intermediate carries the shorter one (same traffic
        # argument as wholemap_roi_align_grad: both dots run near HBM peak
        # on the intermediate, so its size is the cost)
        if h_l >= w_l:
            wy = wy * m
            t1 = jnp.einsum(
                "bph,hwc->bpwc", wy.astype(f.dtype), f,
                preferred_element_type=jnp.float32,
            ).astype(f.dtype)
            out = out + jnp.einsum(
                "bqw,bpwc->bpqc", wx.astype(f.dtype), t1,
                preferred_element_type=jnp.float32,
            )
        else:
            wx = wx * m
            t1 = jnp.einsum(
                "bqw,hwc->bqhc", wx.astype(f.dtype), f,
                preferred_element_type=jnp.float32,
            ).astype(f.dtype)
            out = out + jnp.einsum(
                "bph,bqhc->bpqc", wy.astype(f.dtype), t1,
                preferred_element_type=jnp.float32,
            )
    return out


def apply_oow_fallback(
    pooled: Array,  # (K, P, P, C) windowed result
    oow: Array,  # (K,) bool
    features: Sequence[Array],
    boxes: Array,
    lvl_idx: Array,
    strides: Sequence[int],
    output_size: int,
    sampling_ratio: int,
    capacity: int,
) -> Array:
    """Replace up to ``capacity`` out-of-window rows with exact whole-map
    pooling (shared by the XLA and Pallas paths)."""
    if capacity <= 0:
        return pooled
    k = boxes.shape[0]
    capacity = min(capacity, k)
    # first `capacity` oow row indices: top_k on the 0/1 mask (ties broken
    # toward lower indices) — a full argsort here cost a per-image sort pass
    _, idx = jax.lax.top_k(oow.astype(jnp.int32), capacity)
    fb = wholemap_roi_align(
        features, boxes[idx], lvl_idx[idx], strides, output_size, sampling_ratio
    )
    upd = jnp.where(oow[idx][:, None, None, None], fb.astype(pooled.dtype), pooled[idx])
    return pooled.at[idx].set(upd)


def pad_level(f: Array, win_y: int = WIN_Y, win_x: int = WIN_X) -> Array:
    """Pad one (..., H, W, C) level so a (win_y, win_x) window always fits
    and every X_ALIGN-aligned x-origin keeps the window in bounds."""
    pad_h = max(0, win_y - f.shape[-3])
    target_w = max(f.shape[-2], win_x)
    target_w = ((target_w + X_ALIGN - 1) // X_ALIGN) * X_ALIGN
    pad_w = target_w - f.shape[-2]
    if pad_h or pad_w:
        cfg = [(0, 0)] * (f.ndim - 3) + [(0, pad_h), (0, pad_w), (0, 0)]
        f = jnp.pad(f, cfg)
    return f


def build_window_weights(
    boxes: Array,  # (K, 4)
    lvl_idx: Array,  # (K,)
    strides: Sequence[int],
    heights: Array,  # (num_levels,) true level heights
    widths: Array,
    pad_heights: Array,  # (num_levels,) padded level heights
    pad_widths: Array,
    output_size: int,
    sampling_ratio: int,
    s_max: int,
):
    """Shared weight/origin construction for the XLA and Pallas window paths.

    Returns (y0, x0, wy, wx, oow): int32 window origins, (K, P, WIN) f32
    weights, and the per-RoI out-of-window flag.
    """
    p = output_size
    h_l = heights[lvl_idx]
    w_l = widths[lvl_idx]
    y1, x1, bin_h, bin_w = _roi_geometry(boxes, lvl_idx, strides, p)
    # first sample position (grid divisor >= 1 puts it within [start, start+bin])
    if sampling_ratio > 0:
        gy = gx = jnp.full(boxes.shape[:1], float(sampling_ratio), jnp.float32)
    else:
        gy = jnp.clip(jnp.ceil(bin_h), 1.0, float(s_max))
        gx = jnp.clip(jnp.ceil(bin_w), 1.0, float(s_max))
    y0 = window_origin(
        y1 + 0.5 / gy * bin_h, h_l, pad_heights[lvl_idx], WIN_Y, align=Y_ALIGN
    )
    x0 = window_origin(
        x1 + 0.5 / gx * bin_w, w_l, pad_widths[lvl_idx], WIN_X, align=X_ALIGN
    )
    wy, oow_y = axis_weights(y1, bin_h, h_l, y0, WIN_Y, p, sampling_ratio, s_max)
    wx, oow_x = axis_weights(x1, bin_w, w_l, x0, WIN_X, p, sampling_ratio, s_max)
    return y0, x0, wy, wx, oow_y | oow_x


def multilevel_roi_align(
    features: Sequence[Array],  # list of (H_l, W_l, C), one per level
    boxes: Array,  # (K, 4) XYXY in input-image coords
    strides: Sequence[int],  # stride per level, e.g. (4, 8, 16, 32)
    output_size: int = 7,
    sampling_ratio: int = 0,
    min_level: int = 2,
    canonical_box_size: float = 224.0,
    canonical_level: int = 4,
    levels: Optional[Array] = None,  # optional precomputed (K,) level per box
    s_max: int = 16,
    fallback_capacity: int = 32,
    box_chunk: Optional[int] = None,
) -> Array:
    """Multi-level RoIAlignV2 (XLA windowed-einsum path). Returns (K, P, P, C).

    ``sampling_ratio=0`` is the reference-default ADAPTIVE mode (exact).
    Degenerate/padded boxes produce well-defined zero outputs; callers mask
    downstream. ``box_chunk`` bounds the transient window memory
    (K * WIN_Y * WIN_X * C) by evaluating boxes in chunks under ``lax.map``.
    """
    num_levels = len(features)
    p = output_size
    c = features[0].shape[-1]
    k = boxes.shape[0]

    feats = [pad_level(f) for f in features]
    heights = jnp.array([f.shape[0] for f in features], jnp.int32)
    widths = jnp.array([f.shape[1] for f in features], jnp.int32)
    pad_hs = jnp.array([f.shape[0] for f in feats], jnp.int32)
    pad_ws = jnp.array([f.shape[1] for f in feats], jnp.int32)
    sizes = [f.shape[0] * f.shape[1] for f in feats]
    offsets = jnp.array([sum(sizes[:i]) for i in range(num_levels)], jnp.int32)

    if levels is None:
        levels = roi_level_assignment(
            boxes, min_level, min_level + num_levels - 1,
            canonical_box_size, canonical_level,
        )
    lvl_idx = levels - min_level

    y0, x0, wy, wx, oow = build_window_weights(
        boxes, lvl_idx, strides, heights, widths, pad_hs, pad_ws,
        p, sampling_ratio, s_max,
    )

    flat = jnp.concatenate([f.reshape(-1, c) for f in feats], axis=0)
    # flat start row of each window row r: base + (y0 + r) * padW + x0
    base = offsets[lvl_idx] + y0 * pad_ws[lvl_idx] + x0  # (K,)
    row_starts = base[:, None] + jnp.arange(WIN_Y, dtype=jnp.int32)[None, :] * (
        pad_ws[lvl_idx][:, None]
    )  # (K, WIN_Y)

    def pool_chunk(args):
        starts_i, wy_i, wx_i = args
        n_i = starts_i.shape[0]
        win = _gather_windows(flat, starts_i.reshape(-1), WIN_X)
        win = win.reshape(n_i, WIN_Y, WIN_X, c)
        return _pool_from_windows(win, wy_i, wx_i, features[0].dtype)

    if box_chunk is None:
        box_chunk = k if k <= 64 else 32
    if box_chunk >= k:
        pooled = pool_chunk((row_starts, wy, wx))
    else:
        n_pad = (-k) % box_chunk
        starts_p = jnp.pad(row_starts, ((0, n_pad), (0, 0)))
        wy_p = jnp.pad(wy, ((0, n_pad), (0, 0), (0, 0)))
        wx_p = jnp.pad(wx, ((0, n_pad), (0, 0), (0, 0)))
        n_chunks = (k + n_pad) // box_chunk
        pooled = jax.lax.map(
            pool_chunk,
            (
                starts_p.reshape(n_chunks, box_chunk, WIN_Y),
                wy_p.reshape(n_chunks, box_chunk, p, WIN_Y),
                wx_p.reshape(n_chunks, box_chunk, p, WIN_X),
            ),
        ).reshape(-1, p, p, c)[:k]

    return apply_oow_fallback(
        pooled, oow, features, boxes, lvl_idx, strides, p, sampling_ratio,
        fallback_capacity,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8, 9, 10))
def multilevel_roi_align_train(
    features,  # list of (H_l, W_l, C)
    boxes,  # (K, 4)
    strides: Tuple[int, ...],
    output_size: int = 7,
    sampling_ratio: int = 0,
    min_level: int = 2,
    canonical_box_size: float = 224.0,
    canonical_level: int = 4,
    s_max: int = 16,
    fallback_capacity: int = 32,
    box_chunk: Optional[int] = None,
) -> Array:
    """``multilevel_roi_align`` with a SCATTER-FREE training backward.

    The native backward of the windowed path is a scatter-add over window
    rows — measured ~390 ms of a 640 ms train step at batch 8 on v5e (TPU
    scatters run far below HBM bandwidth). This custom VJP instead computes

        dF_l = sum_k 1[lvl_k = l] * WyG_k^T @ dOut_k @ WxG_k

    with WHOLE-MAP weight matrices, evaluated as two chunked MXU matmuls per
    level with an f32 accumulator — no scatter anywhere. It is the exact
    gradient of exact adaptive RoIAlign (the forward's rare beyond-capacity
    window-clamped RoIs differ infinitesimally; proposals are stop-gradient
    upstream so no box cotangent exists).
    """
    return multilevel_roi_align(
        features, boxes, list(strides), output_size, sampling_ratio,
        min_level, canonical_box_size, canonical_level, None, s_max,
        fallback_capacity, box_chunk,
    )


def _train_fwd(features, boxes, strides, output_size, sampling_ratio,
               min_level, canonical_box_size, canonical_level, s_max,
               fallback_capacity, box_chunk):
    out = multilevel_roi_align_train(
        features, boxes, strides, output_size, sampling_ratio, min_level,
        canonical_box_size, canonical_level, s_max, fallback_capacity,
        box_chunk,
    )
    return out, (features, boxes)


def wholemap_roi_align_grad(features, boxes, g, strides, output_size,
                            sampling_ratio, min_level, canonical_box_size,
                            canonical_level, box_chunk=None):
    """d(pooled)/d(features) cotangent as chunked matmuls — the scatter-free
    RoIAlign backward shared by the XLA and Pallas training paths.
    features: list of (H_l, W_l, C); boxes (K, 4); g (K, P, P, C).
    Returns per-level dF with the features' dtypes.

    Layout-free formulation: the second contraction runs over the COMBINED
    (roi, bin) dims via dot_general's multi-dim contraction, emitting (H, W, C)
    directly — no transposes or dtype round-trips on the K*P*W*C intermediate
    (those cost ~4x the matmul time in the first version). Chunks are a small
    static Python loop, so no while-loop accumulator round-trips either.
    """
    p = output_size
    k = boxes.shape[0]
    num_levels = len(features)
    levels = roi_level_assignment(
        boxes, min_level, min_level + num_levels - 1,
        canonical_box_size, canonical_level,
    )
    lvl_idx = levels - min_level
    y1, x1, bin_h, bin_w = _roi_geometry(boxes, lvl_idx, strides, p)

    # The (ch, W_l, P, C) intermediate ``u`` is pure HBM traffic and each
    # chunk's accumulator step round-trips the full f32 (H, W, C) map, so the
    # chunk size trades transient memory against accumulator traffic. The
    # budget admits K=512 x the P2 map in ONE chunk (u = 235 MB bf16 per
    # image, 1.9 GB under a batch-8 vmap) so NO level pays an f32 accumulator
    # round-trip; shapes beyond it (e.g. C=512 middle fusion at P2) chunk.
    U_ELEM_BUDGET = 512 * 256 * 7 * 256

    def padded(a, n_pad, fill=0.0):
        cfg = [(0, n_pad)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, cfg, constant_values=fill)

    dfs = []
    for li, f in enumerate(features):
        h, w, c = f.shape
        s_hi_y = max(sampling_ratio, -(-h // p) + 2)
        s_hi_x = max(sampling_ratio, -(-w // p) + 2)
        dt = f.dtype

        ch = min(k, box_chunk or max(1, U_ELEM_BUDGET // (w * p * c)))
        n_pad = (-k) % ch
        n_chunks = (k + n_pad) // ch
        g_p = padded(g, n_pad).reshape(n_chunks, ch, p, p, -1)
        y1_p = padded(y1, n_pad).reshape(n_chunks, ch)
        x1_p = padded(x1, n_pad).reshape(n_chunks, ch)
        bh_p = padded(bin_h, n_pad).reshape(n_chunks, ch)
        bw_p = padded(bin_w, n_pad).reshape(n_chunks, ch)
        lvl_p = padded(lvl_idx, n_pad, fill=-1).reshape(n_chunks, ch)
        zero = jnp.zeros((ch,), jnp.int32)

        # Both dots run at ~80% of HBM peak on the ``u`` intermediate (write
        # then read), so u's size IS the cost: contract the LONGER spatial
        # axis first so u carries the shorter one. FLIR maps are landscape
        # (H=200 < W=256 at P2), so y-first shrinks u 22% — measured 26.4 ->
        # 22.6 ms on the batch-8 micro-bench (dev/micro_bwd.py distribution).
        # The (w, h, c) partial is transposed once after the chunk loop.
        yfirst = h <= w
        acc = None
        for i in range(n_chunks):
            gc = g_p[i]
            wyg, _ = axis_weights(
                y1_p[i], bh_p[i], jnp.full((ch,), h, jnp.int32), zero, h, p,
                sampling_ratio, s_hi_y,
            )
            wxg, _ = axis_weights(
                x1_p[i], bw_p[i], jnp.full((ch,), w, jnp.int32), zero, w, p,
                sampling_ratio, s_hi_x,
            )
            mask = (lvl_p[i] == li).astype(jnp.float32)
            if yfirst:
                # u[k, y, q, c] = sum_p wyg[k, p, y] g[k, p, q, c]
                wyg = wyg * mask[:, None, None]
                u = jax.lax.dot_general(
                    wyg.astype(dt), gc.astype(dt),
                    dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=dt,
                )  # (ch, h, p, c)
                # dFt[x, y, c] += sum_{k, q} wxg[k, q, x] u[k, y, q, c]
                part = jax.lax.dot_general(
                    wxg.astype(dt), u,
                    dimension_numbers=(((0, 1), (0, 2)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (w, h, c)
            else:
                # u[k, w, p, c] = sum_q wxg[k, q, w] g[k, p, q, c]
                wxg = wxg * mask[:, None, None]
                u = jax.lax.dot_general(
                    wxg.astype(dt), gc.astype(dt),
                    dimension_numbers=(((1,), (2,)), ((0,), (0,))),
                    preferred_element_type=dt,
                )  # (ch, w, p, c)
                # dF[y, x, c] += sum_{k, p} wyg[k, p, y] u[k, x, p, c]
                part = jax.lax.dot_general(
                    wyg.astype(dt), u,
                    dimension_numbers=(((0, 1), (0, 2)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (h, w, c)
            acc = part if acc is None else acc + part
        if yfirst:
            acc = jnp.transpose(acc, (1, 0, 2))
        dfs.append(acc.astype(f.dtype))

    if isinstance(features, (list, tuple)):
        dfs = type(features)(dfs)
    return dfs


def _train_bwd(strides, output_size, sampling_ratio, min_level,
               canonical_box_size, canonical_level, s_max, fallback_capacity,
               box_chunk, res, g):
    features, boxes = res
    dfs = wholemap_roi_align_grad(
        features, boxes, g, strides, output_size, sampling_ratio, min_level,
        canonical_box_size, canonical_level, box_chunk,
    )
    return dfs, jnp.zeros_like(boxes)


multilevel_roi_align_train.defvjp(_train_fwd, _train_bwd)


def single_level_roi_align(
    feature: Array,  # (H, W, C)
    boxes: Array,  # (K, 4) in input-image coords
    stride: int,
    output_size: int = 7,
    sampling_ratio: int = 0,
) -> Array:
    """RoIAlignV2 on one feature map (reference ``layers/roi_align.py:50``)."""
    return multilevel_roi_align(
        [feature],
        boxes,
        [stride],
        output_size=output_size,
        sampling_ratio=sampling_ratio,
        min_level=0,
        levels=jnp.zeros((boxes.shape[0],), jnp.int32),
    )
