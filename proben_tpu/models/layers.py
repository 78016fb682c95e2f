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


def conv2d_stem_s2d(x: Array, params, dtype=None) -> Array:
    """The 7x7/stride-2 stem conv (reference ``resnet.py`` BasicStem) computed
    as an exact 7x4/(2,1) conv on WIDTH-ONLY 2x space-to-depth input.

    Why: with C_in=3 the MXU sees tiny input-channel utilization and the stem
    measured ~4 ms/step at batch 8 (largest single conv in the trace).
    Packing pixel PAIRS along W into channels (C_in -> 2*C_in) doubles the
    contraction depth — and because (W-pair, channel) are ADJACENT in NHWC
    memory, the packing is a FREE reshape. The earlier 2x2 (H and W) packing
    reached 4*C_in but its H interleave is a real transpose that lowered to
    ~2 ms/step of layout copies (and blocked the upstream f32 normalize +
    bf16 convert from fusing); width-only wins end to end.

    Exactness: pad the kernel's x taps to 8 at the front (one zero column,
    shifting effective x padding 3 -> 4), split tap index dx = 2a + r, and
    fold r into channels — the same products are summed, just regrouped.
    """
    w = params["w"]  # (7, 7, C, O)
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h, wd, c = x.shape
    if w.shape[0] != 7 or w.shape[1] != 7 or wd % 2:
        return conv2d(x[0] if squeeze else x, params, stride=2, padding=3, dtype=dtype)
    if dtype is not None:
        w = w.astype(dtype)
    o = w.shape[3]
    w8 = jnp.pad(w, ((0, 0), (1, 0), (0, 0), (0, 0)))  # (7, 8, C, O)
    w2 = w8.reshape(7, 4, 2 * c, o)  # x-tap fold (a, (r, c)) — layout-exact
    x2 = x.reshape(n, h, wd // 2, 2 * c)  # free: (W-pair, C) adjacent in NHWC
    if dtype is not None:
        # the convert (and the f32 normalize upstream) fuse into one
        # elementwise kernel — no layout copy exists in this stem at all
        x2 = x2.astype(dtype)
    out = jax.lax.conv_general_dilated(
        x2,
        w2,
        window_strides=(2, 1),
        padding=[(3, 3), (2, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
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
