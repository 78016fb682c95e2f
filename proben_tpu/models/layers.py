"""Primitive NN layers: NHWC convs, folded frozen BatchNorm, pooling, linear.

TPU-native replacement for ``detectron2/layers/wrappers.py`` and
``batch_norm.py``. Design notes:

  * NHWC layout everywhere — the native TPU conv layout (the reference is
    NCHW CUDA). Weights are HWIO.
  * FrozenBatchNorm2d (``batch_norm.py:14``) is a per-channel affine with
    constants folded from (weight, bias, running_mean, running_var) at
    checkpoint-import time — at runtime it's just scale*x + bias, which XLA
    fuses into the preceding conv.
  * Params are plain nested dicts of jnp arrays (pytrees), applied by pure
    functions; ``dtype`` selects the compute precision (bf16 for MXU speed,
    params stay f32).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


# ---------------------------------------------------------------------------
# initializers (weight_init.c2_msra_fill / normal fills of the reference)
# ---------------------------------------------------------------------------


def msra_conv_init(key, kh, kw, cin, cout, dtype=jnp.float32) -> Array:
    """He/MSRA fan-out normal init (caffe2 msra fill)."""
    fan_out = kh * kw * cout
    std = math.sqrt(2.0 / fan_out)
    return jax.random.normal(key, (kh, kw, cin, cout), dtype) * std


def normal_init(key, shape, std=0.01, dtype=jnp.float32) -> Array:
    return jax.random.normal(key, shape, dtype) * std


def init_conv(
    key, kh, kw, cin, cout, bias: bool = True, init_std: Optional[float] = None
):
    kw_, kb_ = jax.random.split(key)
    if init_std is None:
        w = msra_conv_init(kw_, kh, kw, cin, cout)
    else:
        w = normal_init(kw_, (kh, kw, cin, cout), init_std)
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((cout,), jnp.float32)
    return p


def init_affine(cout: int):
    """Folded FrozenBN: identity until a checkpoint overwrites it."""
    return {"scale": jnp.ones((cout,), jnp.float32), "bias": jnp.zeros((cout,), jnp.float32)}


def init_linear(key, cin, cout, init_std: Optional[float] = None, bias: bool = True):
    kw_, _ = jax.random.split(key)
    if init_std is None:
        # caffe2 XavierFill: uniform(-a, a), a = sqrt(3/fan_in)
        a = math.sqrt(3.0 / cin)
        w = jax.random.uniform(kw_, (cin, cout), jnp.float32, -a, a)
    else:
        w = normal_init(kw_, (cin, cout), init_std)
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((cout,), jnp.float32)
    return p


def fold_batchnorm(weight, bias, running_mean, running_var, eps=1e-5):
    """Fold BN statistics into (scale, bias) affine constants."""
    weight = np.asarray(weight, np.float64)
    bias = np.asarray(bias, np.float64)
    mean = np.asarray(running_mean, np.float64)
    var = np.asarray(running_var, np.float64)
    scale = weight / np.sqrt(var + eps)
    return {
        "scale": jnp.asarray(scale, jnp.float32),
        "bias": jnp.asarray(bias - mean * scale, jnp.float32),
    }


# ---------------------------------------------------------------------------
# apply functions
# ---------------------------------------------------------------------------


def conv2d(
    x: Array,  # (N, H, W, Cin) or (H, W, Cin)
    params,
    stride: int = 1,
    padding="SAME",
    dtype=None,
) -> Array:
    """2-D convolution, NHWC x HWIO -> NHWC. ``padding`` is an int (symmetric
    explicit pad, torch-style), "SAME", or "VALID"."""
    w = params["w"]
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    if dtype is not None:
        x = x.astype(dtype)
        w = w.astype(dtype)
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    # NOTE: no preferred_element_type here — the MXU accumulates in f32
    # internally for bf16 convs, and an explicit f32 preference breaks the
    # conv VJP with mixed-dtype operands under bf16 training.
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in params:
        out = out + params["b"].astype(out.dtype)
    return out[0] if squeeze else out


# pack24 stem weight-placement tables (see conv2d_stem_s2d): for main-conv
# tap (hp, wq), packed-channel block b = 4*s + 2*hr + wr and output phase p,
# the contributing original tap is (ky, kx) = (2*hp + hr - 1,
# 4*wq + 2*s + wr - 1 - 2*p), zero where out of the 7x7 kernel.
_P24_KY = np.full((4, 3, 8, 2), 0, np.int32)
_P24_KX = np.full((4, 3, 8, 2), 0, np.int32)
_P24_VALID = np.zeros((4, 3, 8, 2), bool)
for _hp in range(4):
    for _wq in range(3):
        for _b in range(8):
            _s, _hr, _wr = _b >> 2, (_b >> 1) & 1, _b & 1
            for _p in range(2):
                _ky = 2 * _hp + _hr - 1
                _kx = 4 * _wq + 2 * _s + _wr - 1 - 2 * _p
                if 0 <= _ky < 7 and 0 <= _kx < 7:
                    _P24_KY[_hp, _wq, _b, _p] = _ky
                    _P24_KX[_hp, _wq, _b, _p] = _kx
                    _P24_VALID[_hp, _wq, _b, _p] = True


def _pack24_weights(w: Array) -> Array:
    """(7, 7, C, O) -> (4, 3, 8C, 2O) weights for the 2x4-packed stem.
    Pure placement (gather + zero mask): exact in any dtype, and its VJP is
    the exact scatter-add back onto the 7x7 kernel."""
    c, o = w.shape[2], w.shape[3]
    sel = w[_P24_KY, _P24_KX]  # (4, 3, 8, 2, C, O)
    sel = jnp.where(_P24_VALID[..., None, None], sel, 0)
    return jnp.transpose(sel, (0, 1, 2, 4, 3, 5)).reshape(4, 3, 8 * c, 2 * o)


def conv2d_stem_s2d(x: Array, params, dtype=None, impl: str = "wpair") -> Array:
    """The 7x7/stride-2 stem conv (reference ``resnet.py`` BasicStem) computed
    as an exact 12-tap conv on 2x4 (H-pair x W-quad) space-to-depth input.

    Why: with C_in=3 the MXU sees tiny input-channel utilization and the raw
    stem measured ~6.9 ms/step at batch 8. XLA's small-C conv cost follows a
    measured law of ~0.165 ms per spatial kernel position PLUS an input
    spatial-position streaming floor (dev/micro_conv.py, dev/stem_decompose
    .py, docs/PERF.md round 4) — so the win is packing BOTH dims: H-pairs
    and W-quads into channels (C -> 8C), shrinking the kernel to 4x3 taps
    and the input to a quarter of the spatial positions. The H interleave is
    a real transpose, but XLA fuses it into the conv's input read: the whole
    packed stem measured 1.48 ms vs 4.67 for the previous width-pair 7x4
    form (which this replaces; it had kept H unpacked to avoid exactly this
    transpose — measured fused, that fear was wrong at this shape).

    Exactness: pure regrouping. Output (i, w'=2Q+p) sums x[2i-3+ky, 4Q+2p-3+kx]
    * w[ky, kx]; with input row-pairs (hr) and quad slots (s, wr) folded into
    channels, each product appears exactly once in the packed form with
    weight placed at (hp, wq, 4s+2hr+wr, p) per the tables above; pad taps
    beyond the 7x7 kernel carry exact zeros. Padding (2,1)x(1,1) in packed
    units brackets the original pixel padding of 3.
    """
    w = params["w"]  # (7, 7, C, O)
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h, wd, c = x.shape
    o = w.shape[3]
    if dtype is not None:
        w = w.astype(dtype)
    # impl is threaded from ModelConfig.stem_impl (MODEL.STEM_IMPL) — a
    # visible, checkpointable switch instead of a trace-time env read:
    # "wpair" (width-pair 7x4, default), "pack24" (2x4 space-to-depth),
    # "direct" (plain 7x7/s2 conv). Unsupported shapes fall through.
    if (w.shape[0] == 7 and w.shape[1] == 7 and wd % 4 == 0 and h % 2 == 0
            and impl == "pack24"):
        # 2x4 pack: (n, h, wd, c) -> (n, h/2, wd/4, 8c), channel
        # (s, hr, wr, cc). Convert FIRST (fuses with the f32 normalize
        # producer), then interleave H-pairs as two strided row slices +
        # stack — measured to fuse into the conv input read (1.44 ms total
        # standalone) where the equivalent 6D transpose materialized ~3.2 ms
        # of copies in-graph (round-4 trace, dev/stem_pack_xla.py)
        xc = x.reshape(n, h, wd // 2, 2 * c)
        if dtype is not None:
            xc = xc.astype(dtype)
        st = jnp.stack([xc[:, 0::2], xc[:, 1::2]], axis=3)
        x2 = st.reshape(n, h // 2, wd // 4, 8 * c)
        out = jax.lax.conv_general_dilated(
            x2,
            _pack24_weights(w),
            window_strides=(1, 1),
            padding=[(2, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        out = out.reshape(n, h // 2, wd // 2, o)
    elif (w.shape[0] == 7 and w.shape[1] == 7 and wd % 2 == 0
          and impl != "direct"):
        # width-pair fallback (odd-H or W%4 inputs): exact 7x4/(2,1) form —
        # pad the kernel's x taps to 8 at the front (one zero column,
        # shifting effective x padding 3 -> 4), split tap dx = 2a + r, fold
        # r into channels
        w8 = jnp.pad(w, ((0, 0), (1, 0), (0, 0), (0, 0)))  # (7, 8, C, O)
        w2 = w8.reshape(7, 4, 2 * c, o)
        x2 = x.reshape(n, h, wd // 2, 2 * c)  # free: (W-pair, C) adjacent
        if dtype is not None:
            x2 = x2.astype(dtype)
        out = jax.lax.conv_general_dilated(
            x2,
            w2,
            window_strides=(2, 1),
            padding=[(3, 3), (2, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    else:
        return conv2d(x[0] if squeeze else x, params, stride=2, padding=3, dtype=dtype)
    if "b" in params:
        out = out + params["b"].astype(out.dtype)
    return out[0] if squeeze else out


def affine(x: Array, params) -> Array:
    """Per-channel scale + bias (folded FrozenBN)."""
    return x * params["scale"].astype(x.dtype) + params["bias"].astype(x.dtype)


def linear(x: Array, params) -> Array:
    out = jnp.dot(x, params["w"].astype(x.dtype), preferred_element_type=jnp.float32)
    out = out.astype(x.dtype)
    if "b" in params:
        out = out + params["b"].astype(out.dtype)
    return out


def max_pool(x: Array, window: int, stride: int, padding: int = 0) -> Array:
    """Max pooling, NHWC (or HWC). torch-style symmetric explicit padding."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    pads = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    out = jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=pads,
    )
    return out[0] if squeeze else out


def upsample_nearest_2x(x: Array) -> Array:
    """Nearest-neighbor 2x upsample, NHWC or HWC (FPN top-down path).

    One broadcast_in_dim + reshape instead of two jnp.repeat passes: repeat
    materializes the (..., 2H, W, C) intermediate, doubling the write
    traffic of the largest top-down levels (~0.3 ms/batch at batch 8)."""
    h_axis = x.ndim - 3
    shape = x.shape
    expanded = jnp.broadcast_to(
        x[..., :, None, :, None, :],
        shape[:h_axis] + (shape[h_axis], 2, shape[h_axis + 1], 2, shape[-1]),
    )
    return expanded.reshape(
        shape[:h_axis] + (2 * shape[h_axis], 2 * shape[h_axis + 1], shape[-1])
    )
