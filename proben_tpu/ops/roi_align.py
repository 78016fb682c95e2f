"""RoIAlign (V2 / `aligned=True`) as pure-XLA gathers over a flattened FPN pyramid.

TPU-native replacement for the reference CUDA kernel
(`detectron2/layers/csrc/ROIAlign/ROIAlign_cuda.cu`) and the multi-level
`ROIPooler` scatter/gather (`detectron2/modeling/poolers.py:84-235`). Instead
of per-level dynamic partitioning of boxes (ragged), all FPN levels are
flattened and concatenated into one (sum_l H_l*W_l, C) array; every box
computes gather indices offset by its assigned level's base. One vectorized
pass, static shapes, exact per-level semantics, and autodiff gives the
scatter-add backward for free.

Semantics follow ROIAlignV2:
  * coordinates scaled by 1/stride then shifted by -0.5 (half-pixel alignment)
  * fixed sampling_ratio S (the reference default is adaptive `ratio=0`;
    we use a static S=2 as is standard for TPU ports — documented deviation)
  * sample points outside [-1, H] x [-1, W] contribute exactly 0
  * in-range points are clamped to [0, H-1] x [0, W-1] before bilinear interp
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


import functools


@functools.lru_cache(maxsize=None)
def _make_pair_gather(rows: int, c: int, dtype_name: str):
    """custom-vjp'd (rows, C) x (N,) -> (N, 2, C) adjacent-row-pair gather,
    specialized per static operand shape/dtype."""
    dtype = jnp.dtype(dtype_name)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,)
    )

    @jax.custom_vjp
    def pair_gather(padded, starts):
        return jax.lax.gather(
            padded, starts[:, None], dn, slice_sizes=(2, c),
            mode=jax.lax.GatherScatterMode.CLIP,
        )

    def fwd(padded, starts):
        return pair_gather(padded, starts), starts

    def bwd(starts, g):
        out = jnp.zeros((rows, c), jnp.float32)
        out = out.at[starts].add(g[:, 0].astype(jnp.float32))
        out = out.at[starts + 1].add(g[:, 1].astype(jnp.float32))
        return out.astype(dtype), None

    pair_gather.defvjp(fwd, bwd)
    return pair_gather


def _pair_gather(padded: Array, starts: Array) -> Array:
    fn = _make_pair_gather(padded.shape[0], padded.shape[1], str(padded.dtype))
    return fn(padded, starts)


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
    return jnp.clip(lvl, min_level, max_level).astype(jnp.int32)


def _bilinear_gather(
    flat_features: Array,  # (L, C)
    y: Array,  # (K, Ny) sample y coords in feature space
    x: Array,  # (K, Nx) sample x coords
    height: Array,  # (K,) per-box level height
    width: Array,  # (K,) per-box level width
    base_offset: Array,  # (K,) per-box flat offset of its level
) -> Array:
    """Bilinear interpolation at the outer product of y and x sample coords.

    Returns (K, Ny, Nx, C). Points outside [-1, dim] yield 0 (ROIAlign spec).
    """
    # validity BEFORE clamping
    valid_y = (y >= -1.0) & (y <= height[:, None])  # (K, Ny)
    valid_x = (x >= -1.0) & (x <= width[:, None])  # (K, Nx)

    yc = jnp.clip(y, 0.0, height[:, None].astype(y.dtype) - 1.0)
    xc = jnp.clip(x, 0.0, width[:, None].astype(x.dtype) - 1.0)

    y0 = jnp.floor(yc)
    x0 = jnp.floor(xc)
    ly = yc - y0  # (K, Ny)
    lx = xc - x0  # (K, Nx)
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    # high index clamped like the CUDA kernel (y_low >= H-1 -> y_high=y_low, ly=0)
    y1i = jnp.minimum(y0i + 1, height[:, None] - 1)
    ly = jnp.where(y0i + 1 > height[:, None] - 1, 0.0, ly)
    lx = jnp.where(x0i + 1 > width[:, None] - 1, 0.0, lx)
    hy, hx = 1.0 - ly, 1.0 - lx

    w = width[:, None, None]  # (K,1,1) row stride within level
    off = base_offset[:, None, None]

    c = flat_features.shape[-1]
    l = flat_features.shape[0]
    k, ny, nx = y.shape[0], y.shape[1], x.shape[1]

    # In the W-major flattened layout the two x-corners of a sample are
    # ADJACENT rows, so one (2, C) strided gather fetches both — half the
    # gather traffic of 4 single-row fetches (this is the hottest op of the
    # whole detector; see the repo's profiling notes). The x0+1 row may stray
    # across a border only when its weight lx was already forced to 0.
    # one zero pad row so a pair starting at the last real row stays in
    # bounds without shifting the slice (clipping would corrupt the first
    # element's value)
    padded = jnp.concatenate(
        [flat_features, jnp.zeros((1, c), flat_features.dtype)], axis=0
    )

    # _pair_gather carries a custom VJP: XLA lowers the gather's native
    # transpose to a SERIAL one-row-per-iteration scatter on TPU (measured
    # 1.6 s/step in training); the explicit dual scatter-add is ~25x faster.
    def gather_pairs(row_start):  # (K, Ny, Nx) int32 -> (K, Ny, Nx, 2, C)
        starts = jnp.clip(row_start.reshape(-1), 0, l - 1)
        return _pair_gather(padded, starts).reshape(k, ny, nx, 2, c)

    wx_pair_hi = hx[:, None, :]  # weight of x0 column
    wx_pair_lo = lx[:, None, :]  # weight of x0+1 column

    out = jnp.zeros((k, ny, nx, c), flat_features.dtype)
    for yi, wy in ((y0i, hy), (y1i, ly)):
        rows = off + yi[:, :, None] * w + x0i[:, None, :]
        pair = gather_pairs(rows)
        mixed = (
            pair[..., 0, :] * wx_pair_hi[..., None].astype(flat_features.dtype)
            + pair[..., 1, :] * wx_pair_lo[..., None].astype(flat_features.dtype)
        )
        out = out + mixed * wy[:, :, None, None].astype(flat_features.dtype)

    valid = (valid_y[:, :, None] & valid_x[:, None, :])[..., None]
    return jnp.where(valid, out, 0.0)


def multilevel_roi_align(
    features: Sequence[Array],  # list of (H_l, W_l, C), one per level
    boxes: Array,  # (K, 4) XYXY in input-image coords
    strides: Sequence[int],  # stride per level, e.g. (4, 8, 16, 32)
    output_size: int = 7,
    sampling_ratio: int = 2,
    min_level: int = 2,
    canonical_box_size: float = 224.0,
    canonical_level: int = 4,
    levels: Array = None,  # optional precomputed (K,) level per box
) -> Array:
    """Multi-level RoIAlignV2. Returns (K, P, P, C).

    Degenerate/padded boxes produce well-defined (possibly zero) outputs;
    callers mask downstream.
    """
    num_levels = len(features)
    c = features[0].shape[-1]
    heights = jnp.array([f.shape[0] for f in features], jnp.int32)
    widths = jnp.array([f.shape[1] for f in features], jnp.int32)
    sizes = [f.shape[0] * f.shape[1] for f in features]
    offsets = jnp.array([sum(sizes[:i]) for i in range(num_levels)], jnp.int32)
    inv_strides = jnp.array([1.0 / s for s in strides], jnp.float32)

    flat = jnp.concatenate([f.reshape(-1, c) for f in features], axis=0)

    if levels is None:
        levels = roi_level_assignment(
            boxes,
            min_level,
            min_level + num_levels - 1,
            canonical_box_size,
            canonical_level,
        )
    lvl_idx = levels - min_level  # (K,) in [0, num_levels)
    box_h = heights[lvl_idx]
    box_w = widths[lvl_idx]
    box_off = offsets[lvl_idx]
    scale = inv_strides[lvl_idx]  # (K,)

    # ROIAlignV2: half-pixel aligned coordinates
    x1 = boxes[:, 0] * scale - 0.5
    y1 = boxes[:, 1] * scale - 0.5
    x2 = boxes[:, 2] * scale - 0.5
    y2 = boxes[:, 3] * scale - 0.5
    roi_w = x2 - x1  # note: V2 does NOT clamp to >=1
    roi_h = y2 - y1

    p, s = output_size, sampling_ratio
    bin_w = roi_w / p
    bin_h = roi_h / p

    # sample coordinates: for bin q and sample i: start + (q + (i+.5)/S) * bin
    grid = (
        jnp.arange(p, dtype=jnp.float32)[:, None]
        + (jnp.arange(s, dtype=jnp.float32)[None, :] + 0.5) / s
    ).reshape(-1)  # (P*S,)
    ys = y1[:, None] + grid[None, :] * bin_h[:, None]  # (K, P*S)
    xs = x1[:, None] + grid[None, :] * bin_w[:, None]  # (K, P*S)

    samples = _bilinear_gather(
        flat, ys, xs, box_h, box_w, box_off
    )  # (K, P*S, P*S, C)
    k = boxes.shape[0]
    samples = samples.reshape(k, p, s, p, s, c)
    return jnp.mean(samples, axis=(2, 4))  # (K, P, P, C)


def single_level_roi_align(
    feature: Array,  # (H, W, C)
    boxes: Array,  # (K, 4) in input-image coords
    stride: int,
    output_size: int = 7,
    sampling_ratio: int = 2,
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
