"""Feature Pyramid Network, NHWC.

Rebuild of reference ``detectron2/modeling/backbone/fpn.py:17,166,203``:
lateral 1x1 convs + top-down nearest 2x upsample + output 3x3 convs, plus the
``LastLevelMaxPool`` p6 used by RPN. Convs have biases and no norm (the
FPN.NORM="" default of every ProbEn config).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp

from .layers import conv2d, init_conv, max_pool

Array = jnp.ndarray

FPN_LEVELS = ("p2", "p3", "p4", "p5", "p6")
FPN_STRIDES = {"p2": 4, "p3": 8, "p4": 16, "p5": 32, "p6": 64}


def init_fpn(key, in_channels: Sequence[int] = (256, 512, 1024, 2048), out_channels: int = 256) -> Dict:
    n = len(in_channels)
    keys = jax.random.split(key, 2 * n)
    return {
        "lateral": [
            init_conv(keys[i], 1, 1, cin, out_channels, bias=True)
            for i, cin in enumerate(in_channels)
        ],
        "output": [
            init_conv(keys[n + i], 3, 3, out_channels, out_channels, bias=True)
            for i in range(n)
        ],
    }


def apply_fpn(
    params,
    bottom_up: Dict[str, Array],  # res2..res5, NHWC
    in_features: Sequence[str] = ("res2", "res3", "res4", "res5"),
    top_block_maxpool: bool = True,
    dtype=None,
) -> Dict[str, Array]:
    """Returns {"p2": ..., ..., "p6": ...} (p6 only if top_block_maxpool).

    Lateral/output convs are applied in the reference's top-down order so the
    numerics match exactly (xavier-init biases included).
    """
    feats = [bottom_up[f] for f in in_features]
    n = len(feats)
    laterals = [
        conv2d(feats[i], params["lateral"][i], stride=1, padding=0, dtype=dtype)
        for i in range(n)
    ]
    # top-down pathway
    merged = [None] * n
    merged[n - 1] = laterals[n - 1]
    for i in range(n - 2, -1, -1):
        h_axis = merged[i + 1].ndim - 3
        up = jnp.repeat(jnp.repeat(merged[i + 1], 2, h_axis), 2, h_axis + 1)
        # crop in case the lower level has odd size (static shapes make this a slice)
        th, tw = laterals[i].shape[h_axis], laterals[i].shape[h_axis + 1]
        up = jax.lax.slice_in_dim(jax.lax.slice_in_dim(up, 0, th, axis=h_axis), 0, tw, axis=h_axis + 1)
        merged[i] = laterals[i] + up

    out = {
        f"p{i + 2}": conv2d(merged[i], params["output"][i], stride=1, padding=1, dtype=dtype)
        for i in range(n)
    }
    if top_block_maxpool:
        out["p6"] = max_pool(out[f"p{n + 1}"], 1, 2, padding=0)
    return out
