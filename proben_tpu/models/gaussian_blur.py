"""Separable Gaussian blur (reference ``modeling/meta_arch/gaussian_blur.py:86,152``
— the MODEL.BLUR_RGB middle-fusion ablation that smooths the RGB stream's
feature maps before fusion)."""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def gaussian_kernel_1d(size: int, sigma: float) -> Array:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    k = jnp.exp(-(x ** 2) / (2.0 * sigma ** 2))
    return k / jnp.sum(k)


def gaussian_blur(
    x: Array,  # (N, H, W, C) or (H, W, C)
    kernel_size: Tuple[int, int] = (5, 5),
    sigma: Tuple[float, float] = (3.0, 3.0),
) -> Array:
    """Depthwise separable Gaussian blur (same-padding)."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    c = x.shape[-1]
    kh, kw = kernel_size
    ky = gaussian_kernel_1d(kh, sigma[0]).reshape(kh, 1, 1, 1)
    kx = gaussian_kernel_1d(kw, sigma[1]).reshape(1, kw, 1, 1)

    def depthwise(img, kern, pad):
        kern = jnp.tile(kern, (1, 1, 1, c)).astype(img.dtype)
        return jax.lax.conv_general_dilated(
            img, kern,
            window_strides=(1, 1),
            padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )

    out = depthwise(x, ky, [(kh // 2, kh // 2), (0, 0)])
    out = depthwise(out, kx, [(0, 0), (kw // 2, kw // 2)])
    return out[0] if squeeze else out
