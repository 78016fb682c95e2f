"""Fused Pallas stem: 7x7/stride-2 conv + folded-BN affine + ReLU +
3x3/stride-2 max-pool in ONE kernel pass.

TPU-native replacement for the reference BasicStem
(``detectron2/modeling/backbone/resnet.py:356-383``: conv1 7x7/s2 ->
FrozenBN -> relu -> max_pool2d 3x3/s2 pad 1). The XLA lowering of this
sequence costs ~3.9 ms/batch at the b8 bench shapes (wpair conv 2.1 +
conv-input retile copy 1.3 + reduce_window pool 0.6 — round-5 trace,
docs/PERF.md): with C_in=3 the conv is tap-streaming-bound, the
intermediate (N, H/2, W/2, 64) tensor (210 MB at b8) makes a full HBM
round trip, and the pool reads it all back. This kernel keeps the whole
pipeline in VMEM, and the pooled block is the only HBM write (52 MB at
b8, a 5x write reduction).

Exactness: the conv is a pure regrouping of the 7x7/s2 taps (same family
as layers.conv2d_stem_s2d; every product x[2i+ky-3, 2j+kx-3, c]*w[ky,kx]
appears exactly once, zero-padded taps carry exact zeros); bf16 inputs,
f32 MXU accumulation, affine/relu/pool on the bf16-cast conv output
exactly like the XLA composition. Accumulation ORDER differs from XLA's
conv (one big dot vs tap loop), so bf16 outputs can differ by 1 ulp —
the same latitude the shipped stem impls (wpair/pack24/direct) already
have relative to each other.

Layout walk (per grid step = one image x 4 pool rows):
  input   x4t (N, H*4C, W/4) bf16 in HBM — the image with width QUADS
          folded into channels then transposed, DMA'd as one contiguous
          (23*4C, W/4) slab (23 input rows cover 9 stem rows cover 4
          pool rows + the 3x3 pool halo)
  shift   ys = lane-shift of the slab by -1/0/+1 quads, zero-filled edges
  im2col  per stem row di, EVEN stem columns h[2q] read orig columns
          4q-3..4q+3 = quads q-1..q -> P_e (2*7*4C, W/4) from ys[-1,0];
          ODD columns h[2q+1] read 4q-1..4q+5 = quads q-1..q+1 ->
          P_o (3*7*4C, W/4) from ys[-1,0,+1]. Pure contiguous row slices
          (the (ky, c4) bands are adjacent) — no strided access anywhere,
          which Mosaic's vector unit cannot do cheaply.
  matmul  (64, K) x (K, W/4) -> f32 -> bf16, affine + relu, for e and o
  pool    width pass mj[q] = max(o[q-1], e[q], o[q]) (lane shift + max);
          row pass max over stem-row triples -> (4, 64, W/4) block write
The (N, PR, 64, W/4) output is transposed to NHWC by the caller (XLA
fuses it into the consumer conv's input read).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

# block geometry: 4 pool rows = 9 stem rows (one halo row above) = 23 input
# rows. Input rows for stem row s are 2s-3 .. 2s+3 (pad 3); stem rows for
# pool row p are 2p-1 .. 2p+1 (pad 1). The slab holds 24 rows — one unused
# margin row at the top — so the top block's DMA lands at sublane offset
# 6*4C (= 24C, always a multiple of the 8-sublane tile; the natural 5-row
# margin gives offset 20C, which Mosaic rejects for odd C).
POOL_ROWS = 4
STEM_ROWS = 2 * POOL_ROWS + 1  # 9
IN_ROWS = 24  # rows 16b-6 .. 16b+17; row 16b-6 is never read


def _lane_shift(x: Array, s: int) -> Array:
    """y[..., j] = x[..., j + s], zero-filled at the edges (static s)."""
    if s == 0:
        return x
    z = jnp.zeros(x.shape[:-1] + (abs(s),), x.dtype)
    if s > 0:
        return jnp.concatenate([x[..., s:], z], axis=-1)
    return jnp.concatenate([z, x[..., :s]], axis=-1)


def _kernel(
    nb: int,  # row blocks per image (static)
    c4: int,  # packed channels = 4*C_in (static)
    # inputs
    x4t_ref,  # (N, H*4C, W/4) bf16, ANY (manual DMA)
    wke_ref,  # (64, 2*7*4C) bf16 even-column weights, VMEM
    wko_ref,  # (64, 3*7*4C) bf16 odd-column weights, VMEM
    sc_ref,  # (64, 1) bf16 affine scale, VMEM
    bi_ref,  # (64, 1) bf16 affine bias, VMEM
    # output
    out_ref,  # (1, POOL_ROWS, 64, W/4) bf16 block
    # scratch
    slab_ref,  # (3, IN_ROWS*4C, W/4) bf16
    sem,
):
    n = pl.program_id(0)
    b = pl.program_id(1)
    t = n * nb + b
    total = pl.num_programs(0) * nb
    wq = slab_ref.shape[-1]

    def start_dma(tt):
        """DMA the input slab for linear step ``tt`` into slot tt % 3.

        Three static extent classes (the DMA semaphore counts bytes, so the
        wait must reconstruct the same extent): top block b=0 misses 5 input
        rows above the image, bottom block b=nb-1 misses 2 below, interior
        blocks copy all 23. nb >= 2 is guaranteed by the host gate.
        """
        nn = tt // nb
        bb = tt % nb
        slot = tt % 3

        @pl.when(bb == 0)
        def _():
            pltpu.make_async_copy(
                x4t_ref.at[nn, pl.ds(0, 18 * c4), :],
                slab_ref.at[slot, pl.ds(6 * c4, 18 * c4), :],
                sem.at[slot],
            ).start()

        # (16b-6)*4C = 8*C*(8b-3): always sublane-tile aligned, but Mosaic
        # needs the proof hint for the dynamic slice
        src0 = pl.multiple_of((16 * bb - 6) * c4, 8)

        @pl.when(bb == nb - 1)
        def _():
            pltpu.make_async_copy(
                x4t_ref.at[nn, pl.ds(src0, 22 * c4), :],
                slab_ref.at[slot, pl.ds(0, 22 * c4), :],
                sem.at[slot],
            ).start()

        @pl.when((bb > 0) & (bb < nb - 1))
        def _():
            pltpu.make_async_copy(
                x4t_ref.at[nn, pl.ds(src0, IN_ROWS * c4), :],
                slab_ref.at[slot, pl.ds(0, IN_ROWS * c4), :],
                sem.at[slot],
            ).start()

    def wait_dma(tt):
        bb = tt % nb
        slot = tt % 3
        for cond, off, cnt in (
            (bb == 0, 6 * c4, 18 * c4),
            (bb == nb - 1, 0, 22 * c4),
            ((bb > 0) & (bb < nb - 1), 0, IN_ROWS * c4),
        ):

            @pl.when(cond)
            def _(off=off, cnt=cnt):
                dst = slab_ref.at[tt % 3, pl.ds(off, cnt), :]
                pltpu.make_async_copy(dst, dst, sem.at[slot]).wait()

    @pl.when(t == 0)
    def _():
        start_dma(0)

        @pl.when(total > 1)
        def _():
            start_dma(1)

    wait_dma(t)
    slot = t % 3

    # zero the halo rows outside the image (slots are reused, so stale data
    # from a previous block must be cleared; interior blocks overwrite all)
    @pl.when(b == 0)
    def _():
        slab_ref[slot, : 6 * c4, :] = jnp.zeros((6 * c4, wq), slab_ref.dtype)

    @pl.when(b == nb - 1)
    def _():
        slab_ref[slot, 22 * c4 :, :] = jnp.zeros((2 * c4, wq), slab_ref.dtype)

    slab = slab_ref[slot]  # (23*4C, W/4)
    # lane-shifted views: ys[a][r, q] = slab[r, q + a - 1], zeros off-edge
    ys = [_lane_shift(slab, a - 1) for a in range(3)]

    wke = wke_ref[...]
    wko = wko_ref[...]
    sc = sc_ref[...]
    bi = bi_ref[...]

    def stem_row(di, wk, shifts):
        # stem row s = 8b - 1 + di reads slab rows (2di + ky + 1)*4C + cc
        # for ky 0..6 (the +1 skips the alignment margin row) — one
        # contiguous 7*4C-row band per quad shift
        p = jnp.concatenate(
            [ys[a][(2 * di + 1) * c4 : (2 * di + 8) * c4, :] for a in shifts],
            axis=0,
        )
        acc = jax.lax.dot_general(
            wk, p, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (64, W/4) f32
        h = acc.astype(jnp.bfloat16) * sc + bi
        return jnp.maximum(h, 0)

    mjs = []
    for di in range(STEM_ROWS):
        e = stem_row(di, wke, (0, 1))  # h[2q]:   quads q-1, q
        o = stem_row(di, wko, (0, 1, 2))  # h[2q+1]: quads q-1, q, q+1
        # width pool pass: mj[q] = max(h[2q-1], h[2q], h[2q+1])
        #               = max(o[q-1], e[q], o[q]); edge zeros are exact
        # because post-relu values are >= 0
        mjs.append(jnp.maximum(jnp.maximum(e, o), _lane_shift(o, -1)))

    # stem row 8b-1 does not exist for the first block (it is the pool's
    # top padding): post-relu values are >= 0, so 0 is the exact pad
    mjs[0] = jnp.where(b == 0, jnp.bfloat16(0), mjs[0])

    for dp in range(POOL_ROWS):
        out_ref[0, dp] = jnp.maximum(
            jnp.maximum(mjs[2 * dp], mjs[2 * dp + 1]), mjs[2 * dp + 2]
        )

    # prefetch the slab two steps ahead (slot t % 3 is read now, t+1 is in
    # flight, t+2's slot is free; grid steps run serially)
    @pl.when(t + 2 < total)
    def _():
        start_dma(t + 2)


def _pack_weights(w: Array, c: int, o: int, kx_of, na: int) -> Array:
    """(7, 7, C, O) -> (O, na*7*4C) rows ordered (a, ky, m, c), where the
    original x tap for slot (a, m) is ``kx_of(a, m)`` (out-of-kernel slots
    carry exact zeros)."""
    cols = []
    for a in range(na):
        for ky in range(7):
            for m in range(4):
                kx = kx_of(a, m)
                if 0 <= kx < 7:
                    cols.append(w[ky, kx])  # (C, O)
                else:
                    cols.append(jnp.zeros((c, o), w.dtype))
    return jnp.stack(cols).reshape(na * 7 * 4 * c, o).T  # (O, K)


def stem_supported(h: int, w: int, c: int, o: int, dtype) -> bool:
    """Shape gate: the kernel handles the canonical detector inputs; odd
    sizes fall back to the XLA wpair path (layers.conv2d_stem_s2d)."""
    return (
        h % 16 == 0
        and h >= 32
        and w % 256 == 0
        and c <= 8
        and o == 64
        and dtype == jnp.bfloat16
    )


def _xla_stem_composition(x, w, scale, bias):
    """The equivalent XLA graph (layers.py wpair stem + affine + relu +
    max_pool) — the VJP recompute target for the fused kernel."""
    from ..models.layers import affine, conv2d_stem_s2d, max_pool

    h = conv2d_stem_s2d(x, {"w": w}, dtype=jnp.bfloat16, impl="wpair")
    h = jnp.maximum(affine(h, {"scale": scale, "bias": bias}), 0)
    return max_pool(h, 3, 2, padding=1)


def _stem_pool_impl(
    x: Array,  # (N, H, W, C) — cast to bf16 inside
    w: Array,  # (7, 7, C, 64) conv weights (f32 params)
    scale: Array,  # (64,) folded-BN scale
    bias: Array,  # (64,) folded-BN bias (+ scale*conv_bias if conv has one)
    interpret: Optional[bool] = None,
) -> Array:
    n, h, wd, c = x.shape
    o = w.shape[3]
    assert stem_supported(h, wd, c, o, jnp.bfloat16), (h, wd, c, o)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    wq = wd // 4
    h2 = h // 2
    nb = h2 // (2 * POOL_ROWS)
    pr = h2 // 2
    c4 = 4 * c

    x4t = (
        x.astype(jnp.bfloat16)
        .reshape(n, h, wq, c4)
        .swapaxes(2, 3)
        .reshape(n, h * c4, wq)
    )
    # even stem columns h[2q]: orig col 4(q+a-1)+m, tap kx = 4a+m-1
    wke = _pack_weights(w, c, o, lambda a, m: 4 * a + m - 1, 2)
    # odd stem columns h[2q+1]: orig col 4(q+a-1)+m, tap kx = 4a+m-3
    wko = _pack_weights(w, c, o, lambda a, m: 4 * a + m - 3, 3)
    wke = wke.astype(jnp.bfloat16)
    wko = wko.astype(jnp.bfloat16)
    sc = scale.astype(jnp.bfloat16).reshape(o, 1)
    bi = bias.astype(jnp.bfloat16).reshape(o, 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((o, 56 * c), lambda nn, bb: (0, 0)),
            pl.BlockSpec((o, 84 * c), lambda nn, bb: (0, 0)),
            pl.BlockSpec((o, 1), lambda nn, bb: (0, 0)),
            pl.BlockSpec((o, 1), lambda nn, bb: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, POOL_ROWS, o, wq), lambda nn, bb: (nn, bb, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((3, IN_ROWS * c4, wq), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, nb, c4),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, pr, o, wq), jnp.bfloat16),
        interpret=interpret,
    )(x4t, wke, wko, sc, bi)
    # (N, PR, 64, W/4) -> NHWC; XLA fuses this into the consumer's read
    return jnp.transpose(out, (0, 1, 3, 2))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def stem_pool_pallas(x, w, scale, bias, interpret=None):
    """Fused stem: returns the pooled (N, H//4, W//4, 64) bf16 tensor.

    Differentiable: the custom VJP recomputes gradients through the XLA
    composition (the shipped configs freeze the stem, so this path only
    runs for FREEZE_AT=0 experiments). The recomputed forward can differ
    from the kernel's by bf16 accumulation-order ulps, so relu/pool
    gradient masks may route ties differently — the same latitude the
    stem impls already have relative to each other.
    """
    return _stem_pool_impl(x, w, scale, bias, interpret)


def _stem_fwd(x, w, scale, bias, interpret):
    return _stem_pool_impl(x, w, scale, bias, interpret), (x, w, scale, bias)


def _stem_bwd(interpret, res, g):
    _, vjp = jax.vjp(_xla_stem_composition, *res)
    return tuple(vjp(g))


stem_pool_pallas.defvjp(_stem_fwd, _stem_bwd)
