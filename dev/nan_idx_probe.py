"""What do the window origin / class / level indices become for NaN boxes
ON THE TPU (XLA int-cast semantics differ from CPU)?"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from proben_tpu.ops.roi_align import roi_level_assignment, build_window_weights
from proben_tpu.ops.roi_align_pallas import window_size_classes, DMA_SIZES
from bench import enable_compile_cache

enable_compile_cache()

strides = [4, 8, 16, 32]
heights = jnp.asarray([200, 100, 50, 25], jnp.int32)
widths = jnp.asarray([256, 128, 64, 32], jnp.int32)
pad_hs = jnp.asarray([200, 104, 64, 64], jnp.int32)
pad_ws = jnp.asarray([256, 128, 64, 64], jnp.int32)


def probe(boxes):
    levels = roi_level_assignment(boxes, 2, 5, 224.0, 4)
    lvl = levels - 2
    y0, x0, wy, wx, oow = build_window_weights(
        boxes, lvl, strides, heights, widths, pad_hs, pad_ws, 7, 0, 16
    )
    cls = window_size_classes(wy, wx)
    return lvl, y0, x0, cls, oow


rng = np.random.RandomState(0)
xy = rng.rand(8, 2).astype(np.float32) * 600
wh = rng.rand(8, 2).astype(np.float32) * 150 + 8
boxes = np.concatenate([xy, xy + wh], -1)
boxes[1] = np.nan
boxes[3] = np.inf
boxes[5] = -np.inf
boxes[6] = [100.0, np.nan, 200.0, 150.0]

out = jax.jit(probe)(jnp.asarray(boxes))
lvl, y0, x0, cls, oow = [np.asarray(o) for o in out]
print("DMA_SIZES:", DMA_SIZES)
for i in range(8):
    print(f"box {boxes[i]} -> lvl {lvl[i]} y0 {y0[i]} x0 {x0[i]} "
          f"cls {cls[i]} oow {oow[i]}", flush=True)
