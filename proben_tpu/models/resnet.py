"""ResNet-50/101 backbone with FrozenBN, NHWC, parameterizable stem channels.

TPU-first rebuild of the reference ``detectron2/modeling/backbone/resnet.py``
(BasicStem :360, BottleneckBlock :120, build_resnet_backbone :474). Key parity
points:
  * caffe-style bottleneck: stride lives in the 1x1 conv (STRIDE_IN_1X1=True)
  * stem = 7x7/2 conv(64) + BN + relu + 3x3/2 maxpool
  * stem in_channels comes from config — 4 for BGRT early fusion
    (reference ``resnet.py:483-487``)
  * FREEZE_AT freezing is applied as an optimizer mask + stop_gradient
    (see ``freeze_mask``), not module mutation
  * FrozenBN is a folded affine (see layers.fold_batchnorm)

Params are nested dicts: {"stem": {...}, "res2": [block, ...], ...}; each
block: {"conv1": {...}, "norm1": {...}, ..., "shortcut": {...}?}.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.stem_pallas import stem_pool_pallas, stem_supported
from .layers import affine, conv2d, conv2d_stem_s2d, init_affine, init_conv, max_pool

Array = jnp.ndarray

STAGE_BLOCKS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}
STAGE_NAMES = ("res2", "res3", "res4", "res5")
# output channels and strides of each stage (bottleneck variants)
STAGE_OUT_CHANNELS = (256, 512, 1024, 2048)
STAGE_STRIDES = {"stem": 4, "res2": 4, "res3": 8, "res4": 16, "res5": 32}


def init_resnet(
    key,
    depth: int = 50,
    in_channels: int = 3,
    stem_out_channels: int = 64,
    bottleneck_width: int = 64,
) -> Dict:
    """Random-init ResNet params (checkpoints overwrite these)."""
    assert depth in (50, 101, 152), f"only bottleneck ResNets supported, got {depth}"
    blocks_per_stage = STAGE_BLOCKS[depth]
    keys = jax.random.split(key, 64)
    kit = iter(range(64))

    params: Dict = {
        "stem": {
            "conv1": init_conv(keys[next(kit)], 7, 7, in_channels, stem_out_channels, bias=False),
            "norm1": init_affine(stem_out_channels),
        }
    }
    in_ch = stem_out_channels
    width = bottleneck_width
    for stage_idx, (name, n_blocks, out_ch) in enumerate(
        zip(STAGE_NAMES, blocks_per_stage, STAGE_OUT_CHANNELS)
    ):
        blocks = []
        for b in range(n_blocks):
            kb = jax.random.fold_in(keys[next(kit)], b)
            k1, k2, k3, k4 = jax.random.split(kb, 4)
            block = {
                "conv1": init_conv(k1, 1, 1, in_ch, width, bias=False),
                "norm1": init_affine(width),
                "conv2": init_conv(k2, 3, 3, width, width, bias=False),
                "norm2": init_affine(width),
                "conv3": init_conv(k3, 1, 1, width, out_ch, bias=False),
                # zero-gamma: residual branches start as identity so random-init
                # training is stable without live BN statistics (checkpoints
                # overwrite this; the reference always trains from pretrained)
                "norm3": {
                    "scale": jnp.zeros((out_ch,), jnp.float32),
                    "bias": jnp.zeros((out_ch,), jnp.float32),
                },
            }
            if b == 0:
                block["shortcut"] = init_conv(k4, 1, 1, in_ch, out_ch, bias=False)
                block["shortcut_norm"] = init_affine(out_ch)
            blocks.append(block)
            in_ch = out_ch
        params[name] = blocks
        width *= 2
    return params


def _bottleneck(params, x: Array, stride: int, dtype=None) -> Array:
    """Caffe-style bottleneck: stride in conv1 (1x1)."""
    out = conv2d(x, params["conv1"], stride=stride, padding=0, dtype=dtype)
    out = jax.nn.relu(affine(out, params["norm1"]))
    out = conv2d(out, params["conv2"], stride=1, padding=1, dtype=dtype)
    out = jax.nn.relu(affine(out, params["norm2"]))
    out = conv2d(out, params["conv3"], stride=1, padding=0, dtype=dtype)
    out = affine(out, params["norm3"])
    if "shortcut" in params:
        sc = conv2d(x, params["shortcut"], stride=stride, padding=0, dtype=dtype)
        sc = affine(sc, params["shortcut_norm"])
    else:
        sc = x
    return jax.nn.relu(out + sc)


def apply_resnet(
    params,
    x: Array,  # (N, H, W, C) normalized input
    out_features: Sequence[str] = STAGE_NAMES,
    freeze_at: int = 0,
    dtype=None,
    remat: bool = False,
    stem_impl: str = "pallas",
) -> Dict[str, Array]:
    """Run the backbone. ``freeze_at`` semantics mirror the reference
    (1 = freeze stem, 2 = +res2, ...): frozen sections run under
    stop_gradient so backward skips them entirely. ``remat`` checkpoints
    each residual block (recompute activations in backward) — trades ~30%
    step time for the memory to fit large training batches."""
    out: Dict[str, Array] = {}
    conv1 = params["stem"]["conv1"]
    norm1 = params["stem"]["norm1"]
    if (
        stem_impl == "pallas"
        and dtype == jnp.bfloat16
        and conv1["w"].shape[:2] == (7, 7)
        and stem_supported(x.shape[-3], x.shape[-2], x.shape[-1],
                           conv1["w"].shape[3], dtype)
    ):
        # fused conv+affine+relu+maxpool (ops/stem_pallas.py); an optional
        # conv bias folds into the affine: scale*(conv+b)+bias
        bias = norm1["bias"]
        if "b" in conv1:
            bias = bias + norm1["scale"] * conv1["b"]
        h = stem_pool_pallas(x, conv1["w"], norm1["scale"], bias)
        if freeze_at >= 1:
            h = jax.lax.stop_gradient(h)
    else:
        impl = "wpair" if stem_impl == "pallas" else stem_impl
        h = conv2d_stem_s2d(x, conv1, dtype=dtype, impl=impl)
        h = jax.nn.relu(affine(h, norm1))
        h = max_pool(h, 3, 2, padding=1)
        if freeze_at >= 1:
            h = jax.lax.stop_gradient(h)
    if "stem" in out_features:
        out["stem"] = h

    block_fn = _bottleneck
    if remat:
        block_fn = jax.checkpoint(_bottleneck, static_argnums=(2, 3))

    stage_strides = (1, 2, 2, 2)
    for i, name in enumerate(STAGE_NAMES):
        for b, block in enumerate(params[name]):
            h = block_fn(block, h, stage_strides[i] if b == 0 else 1, dtype)
        if freeze_at >= i + 2:
            h = jax.lax.stop_gradient(h)
        if name in out_features:
            out[name] = h
    return out


def freeze_mask(params, freeze_at: int):
    """Pytree of bools (True = trainable) implementing FREEZE_AT for the
    optimizer (reference ``resnet.py:488-495,563-565``)."""

    def mask_subtree(subtree, trainable):
        return jax.tree_util.tree_map(lambda _: trainable, subtree)

    out = {}
    out["stem"] = mask_subtree(params["stem"], freeze_at < 1)
    for i, name in enumerate(STAGE_NAMES):
        if name in params:
            out[name] = mask_subtree(params[name], freeze_at < i + 2)
    return out


def output_shape(depth: int = 50) -> Dict[str, Tuple[int, int]]:
    """(channels, stride) per stage, the ShapeSpec equivalent."""
    return {
        name: (ch, STAGE_STRIDES[name])
        for name, ch in zip(STAGE_NAMES, STAGE_OUT_CHANNELS)
    }
