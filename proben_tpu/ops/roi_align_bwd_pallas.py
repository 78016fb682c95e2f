"""Fused Pallas TPU kernel for the RoIAlign training backward.

TPU-native replacement for the reference CUDA backward
(`detectron2/layers/csrc/ROIAlign/ROIAlign_cuda.cu:247-340`, an atomicAdd
scatter). The shared matmul backward (ops/roi_align.wholemap_roi_align_grad)
already avoids scatters, but both of its dots run at HBM peak on the
(K, H, P, C) intermediate ``u`` — ~19 ms of a 132 ms batch-8 train step
(docs/PERF.md round 3). This kernel keeps ``u`` in VMEM tile-by-tile:

  dF[y, x, c] = sum_k wyg[k, p, y] * wxg[k, q, x] * g[k, p, q, c]

  * all 4 FPN level maps are stacked into ONE per-image canvas along y
    (levels at fixed row offsets), so a single y-sorted pass covers every
    level with no per-level re-walk of the RoI set;
  * RoIs are sorted by canvas window origin y0 and grouped into blocks of
    ``BS``; the canvas is cut into ``TY``-row tiles; each (tile, block) pair
    whose y-ranges intersect becomes one VISIT. Sorted y0 makes each tile's
    visiting blocks a contiguous range, so visits are enumerated tile-major
    and the f32 accumulator tile stays resident in VMEM across its visits;
  * per visit, two MXU dots with the contraction over (block, bin) jointly
    (K_dim = BS*7 — real MXU utilization, unlike the per-RoI P=7 dots):
        u[(k, ty), (q, c)]  = blkdiag(wyg_tile) @ g_block
        acc[w, (ty, c)]    += wxg_cat @ u'       (u' = (k,q)-major relayout)
  * the gradient WEIGHTS are the forward kernel's own window weights
    (ops/roi_align.build_window_weights), windowed at the same (y0, x0)
    origins — so this is the exact VJP of the Pallas windowed forward. Rows
    the forward re-pooled whole-map (the capacity-bounded out-of-window
    fallback) are masked out here and their exact whole-map gradient is
    added by the caller through the shared einsum path, mirroring the
    forward's tier structure one-for-one (rows beyond capacity keep their
    window-clamped weights in BOTH directions).

Output: one (B, Wmax, Hcanvas, C) f32 canvas (W-major — the second dot's
natural output layout); per-level dF maps are sliced + transposed out by the
host wrapper. HBM traffic is one canvas write + g/weight reads — the u
round-trip is gone.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .roi_align import (
    WIN_X,
    WIN_Y,
    build_window_weights,
    pad_level,
    roi_level_assignment,
    wholemap_roi_align,
)

Array = jnp.ndarray


def _canvas_geometry(features: Sequence[Array]):
    """Per-level canvas row offsets (padded heights), canvas H (tile-padded
    later) and canvas W (max padded width)."""
    pad_hs = [max(f.shape[-3], WIN_Y) for f in features]
    pad_ws = [pad_level(f).shape[-2] for f in features]
    offs = [sum(pad_hs[:i]) for i in range(len(features))]
    return offs, sum(pad_hs), max(pad_ws)


def _bwd_kernel(
    bs,  # RoIs per block
    ty,  # canvas rows per tile
    # scalar prefetch
    jarr,  # (VT,) absolute block index per visit
    barr,  # (VT,) image index per visit
    tarr,  # (VT,) tile index per visit
    first,  # (VT,) 1 = first visit of this (image, tile): zero the acc
    last,  # (VT,) 1 = last visit: flush acc -> out block
    active,  # (VT,) 1 = real visit (0 = dummy/padding: no compute)
    # inputs (blocked)
    wyg_ref,  # (1, TY, BS*P) tile-relative y weights for this visit
    wxg_ref,  # (1, Wmax, BS*Q) full-width x weights for this block
    g_ref,  # (1, BS*P, Q*C) cotangent rows for this block
    # output
    out_ref,  # (1, Wmax, TY, C) f32 canvas tile
    # scratch
    acc_ref,  # (Wmax, TY*C) f32 accumulator
):
    v = pl.program_id(0)
    p = wyg_ref.shape[2] // bs
    q = wxg_ref.shape[2] // bs
    c = out_ref.shape[3]
    wmax = out_ref.shape[1]

    @pl.when(first[v] == 1)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(active[v] == 1)
    def _():
        wyg = wyg_ref[0]  # (TY, BS*P) f32
        g = g_ref[0]  # (BS*P, Q*C)
        # block-diagonal (BS*TY, BS*P): row block k holds wyg rows for RoI k
        rows = jax.lax.broadcasted_iota(jnp.int32, (bs * ty, bs * p), 0) // ty
        cols = jax.lax.broadcasted_iota(jnp.int32, (bs * ty, bs * p), 1) // p
        tiled = jnp.broadcast_to(wyg[None], (bs, ty, bs * p)).reshape(
            bs * ty, bs * p
        )
        bd = jnp.where(rows == cols, tiled, 0.0).astype(g.dtype)
        u = jax.lax.dot_general(
            bd, g, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(g.dtype)  # (BS*TY, Q*C)
        # relayout (k, ty | q, c) -> (k, q | ty, c) for the joint (k, q)
        # contraction of the second dot
        u2 = (
            u.reshape(bs, ty, q, c)
            .transpose(0, 2, 1, 3)
            .reshape(bs * q, ty * c)
        )
        wxg = wxg_ref[0].astype(g.dtype)  # (Wmax, BS*Q)
        acc_ref[...] += jax.lax.dot_general(
            wxg, u2, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(last[v] == 1)
    def _():
        out_ref[0] = acc_ref[...].reshape(wmax, ty, c).astype(out_ref.dtype)


def wholemap_grad_pallas(
    features: Sequence[Array],  # per level (B, H_l, W_l, C)
    boxes: Array,  # (B, K, 4) XYXY image coords
    g: Array,  # (B, K, P, P, C) pooled cotangent
    strides: Sequence[int],
    output_size: int = 7,
    sampling_ratio: int = 0,
    min_level: int = 2,
    canonical_box_size: float = 224.0,
    canonical_level: int = 4,
    s_max: int = 16,
    fallback_capacity: int = 32,
    bs: int = 16,
    # ty=24 at bench shapes (Wmax=256, C=256) overflows VMEM by ~2.3 MB
    # (f32 acc + double-buffered out tiles); 16 fits with headroom
    ty: int = 16,
    interpret: Optional[bool] = None,
) -> List[Array]:
    """Per-level feature cotangents [(B, H_l, W_l, C)] — the exact VJP of the
    Pallas windowed train forward (multilevel_roi_align_pallas with the same
    fallback_capacity)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert len(features) == 4, "kernel is specialized to 4 FPN levels"
    b, k, _ = boxes.shape
    c = features[0].shape[-1]
    p = output_size
    bs = min(bs, k)
    while k % bs:
        bs -= 1
    nb = k // bs

    # C>256 (middle-fusion concat): split channels exactly like the forward
    if c > 256:
        split = c // 2
        halves = [
            wholemap_grad_pallas(
                [f[..., lo:hi] for f in features], boxes, g[..., lo:hi],
                list(strides), output_size, sampling_ratio, min_level,
                canonical_box_size, canonical_level, s_max,
                fallback_capacity, bs, ty, interpret,
            )
            for lo, hi in ((0, split), (split, c))
        ]
        return [
            jnp.concatenate([h0, h1], axis=-1)
            for h0, h1 in zip(halves[0], halves[1])
        ]

    offs, hc_raw, wmax = _canvas_geometry(features)
    t_tiles = -(-hc_raw // ty)
    hc = t_tiles * ty
    heights = jnp.array([f.shape[1] for f in features], jnp.int32)
    widths = jnp.array([f.shape[2] for f in features], jnp.int32)
    pad_hs = jnp.array([max(f.shape[1], WIN_Y) for f in features], jnp.int32)
    pad_ws = jnp.array([pad_level(f).shape[-2] for f in features], jnp.int32)
    offs_arr = jnp.array(offs, jnp.int32)

    flat_boxes = boxes.reshape(b * k, 4)
    levels = roi_level_assignment(
        flat_boxes, min_level, min_level + 3, canonical_box_size,
        canonical_level,
    )
    lvl_idx = levels - min_level
    y0, x0, wy, wx, oow = build_window_weights(
        flat_boxes, lvl_idx, strides, heights, widths, pad_hs, pad_ws,
        p, sampling_ratio, s_max,
    )

    # rows the forward re-pooled whole-map: same per-image top-k selection
    # as ops/roi_align.apply_oow_fallback — their windowed weights are
    # zeroed here; the caller adds their whole-map grad separately
    oow_bk = oow.reshape(b, k)
    if fallback_capacity > 0:
        cap = min(fallback_capacity, k)
        _, fb_idx = jax.lax.top_k(oow_bk.astype(jnp.int32), cap)  # (B, cap)
        replaced = (
            jnp.zeros((b, k), bool)
            .at[jnp.arange(b)[:, None], fb_idx]
            .set(jnp.take_along_axis(oow_bk, fb_idx, axis=1))
        )
        # the forward only replaces rows when SOME row in the batch is oow
        # (lax.cond gate) — replicate so fwd/bwd tiers always agree
        replaced = replaced & jnp.any(oow_bk)
        wy = wy * (~replaced.reshape(-1))[:, None, None]
        wx = wx * (~replaced.reshape(-1))[:, None, None]
    else:
        replaced = jnp.zeros((b, k), bool)

    y0c = offs_arr[lvl_idx] + y0  # (B*K,) canvas window origin rows

    # ---- per-image y-sort + block/visit construction ----
    img = jnp.repeat(jnp.arange(b, dtype=jnp.int32), k)
    order = jnp.argsort(img * jnp.int32(hc + WIN_Y) + y0c)  # stable, img-major
    y0s = y0c[order].reshape(b, nb, bs)
    x0s = x0[order]
    wys = wy[order]  # (B*K, P, WIN_Y)
    wxs = wx[order]  # (B*K, Q, WIN_X)
    g_s = g.reshape(b * k, p, p, c)[order]

    # block tile ranges: ta = first y0 // TY, tb = (last y0 + WIN_Y - 1) // TY
    ta = y0s[:, :, 0] // ty  # (B, NB)
    tb = jnp.minimum((y0s[:, :, -1] + WIN_Y - 1) // ty, t_tiles - 1)

    # per (image, tile): contributing blocks are [lo_t, hi_t) (monotone ta/tb
    # make them contiguous); empty tiles get one dummy visit so every canvas
    # tile is zero-initialized
    tgrid = jnp.arange(t_tiles, dtype=jnp.int32)

    def per_image(ta_i, tb_i):
        lo = jnp.searchsorted(tb_i, tgrid, side="left").astype(jnp.int32)
        hi = jnp.searchsorted(ta_i, tgrid, side="right").astype(jnp.int32)
        n_t = jnp.maximum(hi - lo, 1)
        return lo, hi, n_t

    lo_bt, hi_bt, n_bt = jax.vmap(per_image)(ta, tb)  # (B, T)

    # static visit budget: sorted origins make block y-spreads disjoint, so
    # their tile-crossings sum to <= T; each block adds ceil(WIN_Y/TY) + 1
    # tiles of its own, plus <= T dummy visits for empty tiles
    v_max = nb * (-(-WIN_Y // ty) + 2) + 2 * t_tiles
    # enumerate visits tile-major per image: visit v of image i targets tile
    # t(v) = searchsorted(cum, v) and block j(v) = lo_t + (v - cum_{t-1})
    cum = jnp.cumsum(n_bt, axis=1)  # (B, T)
    vidx = jnp.arange(v_max, dtype=jnp.int32)
    t_of_v = jax.vmap(
        lambda cum_i: jnp.searchsorted(cum_i, vidx, side="right").astype(
            jnp.int32
        )
    )(cum)
    t_clip = jnp.minimum(t_of_v, t_tiles - 1)  # (B, V)
    n_at = jnp.take_along_axis(n_bt, t_clip, axis=1)
    cum_at = jnp.take_along_axis(cum, t_clip, axis=1)
    lo_at = jnp.take_along_axis(lo_bt, t_clip, axis=1)
    hi_at = jnp.take_along_axis(hi_bt, t_clip, axis=1)
    base = cum_at - n_at
    in_range = vidx[None, :] < cum[:, -1:]
    j_of_v = jnp.clip(lo_at + (vidx[None, :] - base), 0, nb - 1)
    is_first = in_range & (vidx[None, :] == base)
    is_last = in_range & (vidx[None, :] == cum_at - 1)
    # dummy visits (tile with no blocks, n_t clamped to 1): zero + flush only
    act = in_range & (hi_at > lo_at)

    barr = jnp.broadcast_to(
        jnp.arange(b, dtype=jnp.int32)[:, None], (b, v_max)
    ).reshape(-1)
    tarr = t_clip.reshape(-1)
    jarr = (jnp.arange(b, dtype=jnp.int32)[:, None] * nb + j_of_v).reshape(-1)
    first = is_first.reshape(-1).astype(jnp.int32)
    last = is_last.reshape(-1).astype(jnp.int32)
    active = act.reshape(-1).astype(jnp.int32)

    # ---- per-visit tile-relative y weights ----
    # wyg_visit[v, ty_row, (k, p)] = wys[block(v)*BS + k, p, tile_row - y0_k]
    # gathered from the window-relative weights (pad window cols so the
    # gather never reads out of range; out-of-window rows read zeros)
    q = p
    wys_pad = jnp.pad(wys, ((0, 0), (0, 0), (ty, ty)))  # (B*K, P, WIN_Y+2TY)
    roi_of_visit = (
        jarr[:, None] * bs + jnp.arange(bs, dtype=jnp.int32)[None, :]
    )  # (VT, BS) sorted-roi index
    y0_rois = (y0c[order])[roi_of_visit]  # (VT, BS)
    row_idx = (
        tarr[:, None, None] * ty
        + jnp.arange(ty, dtype=jnp.int32)[None, None, :]
        - y0_rois[:, :, None]
        + ty
    )  # (VT, BS, TY) index into padded window cols
    row_idx = jnp.clip(row_idx, 0, WIN_Y + 2 * ty - 1)
    vtbs = roi_of_visit.size
    wy_vis = jnp.take_along_axis(
        wys_pad[roi_of_visit.reshape(-1)],  # (VT*BS, P, WIN+2TY)
        jnp.broadcast_to(
            row_idx.reshape(vtbs, 1, ty), (vtbs, p, ty)
        ).astype(jnp.int32),
        axis=2,
    ).reshape(-1, bs, p, ty)  # (VT, BS, P, TY)
    wyg_vis = jnp.transpose(wy_vis, (0, 3, 1, 2)).reshape(
        -1, ty, bs * p
    )  # (VT, TY, BS*P)

    # ---- per-block full-width x weights (Wmax, BS*Q) ----
    colw = jnp.arange(wmax, dtype=jnp.int32)
    rel = colw[None, None, :] - x0s[:, None, None]  # (B*K, 1, Wmax)
    relc = jnp.clip(rel, 0, WIN_X - 1)
    wx_full = jnp.where(
        (rel >= 0) & (rel < WIN_X),
        jnp.take_along_axis(wxs, jnp.broadcast_to(relc, (b * k, q, wmax)), axis=2),
        0.0,
    )  # (B*K, Q, Wmax)
    wxg_cat = jnp.transpose(
        wx_full.reshape(b * nb, bs * q, wmax), (0, 2, 1)
    )  # (B*NB, Wmax, BS*Q)

    # ---- cotangent blocks ----
    g_blk = g_s.reshape(b * nb, bs * p, q * c)

    vt = b * v_max
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(vt,),
        in_specs=[
            pl.BlockSpec(
                (1, ty, bs * p), lambda v, jr, br, tr, *_: (v, 0, 0)
            ),
            pl.BlockSpec(
                (1, wmax, bs * q), lambda v, jr, br, tr, *_: (jr[v], 0, 0)
            ),
            pl.BlockSpec(
                (1, bs * p, q * c), lambda v, jr, br, tr, *_: (jr[v], 0, 0)
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, wmax, ty, c), lambda v, jr, br, tr, *_: (br[v], 0, tr[v], 0)
        ),
        scratch_shapes=[pltpu.VMEM((wmax, ty * c), jnp.float32)],
    )

    canvas = pl.pallas_call(
        functools.partial(_bwd_kernel, bs, ty),
        grid_spec=grid_spec,
        # canvas in the features' dtype (f32 accumulation lives in the VMEM
        # scratch; each tile is flushed exactly once — same precision as the
        # einsum path's f32-accumulate-then-cast)
        out_shape=jax.ShapeDtypeStruct((b, wmax, hc, c), features[0].dtype),
        interpret=interpret,
    )(jarr, barr, tarr, first, last, active, wyg_vis, wxg_cat, g_blk)

    # ---- slice levels back out (+ exact whole-map grad for replaced rows) ----
    dfs = []
    for li, f in enumerate(features):
        h_l, w_l = f.shape[1], f.shape[2]
        sl = canvas[:, :w_l, offs[li] : offs[li] + h_l, :]
        dfs.append(jnp.transpose(sl, (0, 2, 1, 3)).astype(f.dtype))

    if fallback_capacity > 0:
        def add_fb(dfs_in):
            def per_image(feats_i, boxes_i, g_i, rep_i, dfs_i):
                cap = min(fallback_capacity, k)
                _, idx = jax.lax.top_k(rep_i.astype(jnp.int32), cap)
                gi = g_i[idx] * rep_i[idx][:, None, None, None]
                lvls = roi_level_assignment(
                    boxes_i[idx], min_level, min_level + 3,
                    canonical_box_size, canonical_level,
                ) - min_level
                grads = _fb_wholemap_grad(
                    feats_i, boxes_i[idx], lvls, gi, strides, p,
                    sampling_ratio,
                )
                return [d + gg.astype(d.dtype) for d, gg in zip(dfs_i, grads)]

            return jax.vmap(per_image)(
                list(features), boxes, g, replaced, dfs_in
            )

        dfs = jax.lax.cond(
            jnp.any(replaced), add_fb, lambda d: d, dfs
        )

    return list(dfs)


def _fb_wholemap_grad(features, boxes, lvl_idx, g, strides, p, sampling_ratio):
    """Exact whole-map gradient for a small set of RoIs on one image —
    the per-level transpose of ops/roi_align.wholemap_roi_align (same
    axis_weights, contracted against the cotangent instead of the map)."""
    from .roi_align import _roi_geometry, axis_weights

    y1, x1, bin_h, bin_w = _roi_geometry(boxes, lvl_idx, strides, p)
    zero = jnp.zeros(boxes.shape[0], jnp.int32)
    dfs = []
    for li, f in enumerate(features):
        h_l, w_l, _ = f.shape
        s_hi_y = max(sampling_ratio, -(-h_l // p) + 2)
        s_hi_x = max(sampling_ratio, -(-w_l // p) + 2)
        dim_h = jnp.full_like(zero, h_l)
        dim_w = jnp.full_like(zero, w_l)
        wy, _ = axis_weights(y1, bin_h, dim_h, zero, h_l, p, sampling_ratio, s_hi_y)
        wx, _ = axis_weights(x1, bin_w, dim_w, zero, w_l, p, sampling_ratio, s_hi_x)
        m = (lvl_idx == li).astype(jnp.float32)[:, None, None]
        wy = (wy * m).astype(f.dtype)
        # u[k, h, q, c] = sum_p wy[k, p, h] g[k, p, q, c]
        u = jax.lax.dot_general(
            wy, g.astype(f.dtype),
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=f.dtype,
        )
        # dF[h, w, c] = sum_{k, q} wx[k, q, w] u[k, h, q, c]
        df = jax.lax.dot_general(
            wx.astype(f.dtype), u,
            dimension_numbers=(((0, 1), (0, 2)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (w, h, c)
        dfs.append(jnp.transpose(df, (1, 0, 2)))
    return dfs
