"""Localize the compiled-mode mismatch in wholemap_grad_pallas: small shapes,
compiled on TPU, vs the einsum reference. Env PROBEN_BWD_NO_TRANSPOSE=1 swaps
the in-kernel u relayout for a correct-by-construction per-(k,q) slice loop.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from proben_tpu.ops.roi_align import wholemap_roi_align_grad
from proben_tpu.ops.roi_align_bwd_pallas import wholemap_grad_pallas

B, K, P, C = 1, 64, 7, 256
SHAPES = [(64, 64), (32, 32), (16, 16), (8, 8)]
STRIDES = (4, 8, 16, 32)
rng = np.random.RandomState(0)
feats = [
    jnp.asarray(rng.rand(B, h, w, C).astype(np.float32), jnp.bfloat16)
    for h, w in SHAPES
]
xy = rng.rand(B, K, 2) * 150
wh = rng.rand(B, K, 2) * 80 + 8
boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1).astype(np.float32))
g = jnp.asarray(rng.rand(B, K, P, P, C).astype(np.float32), jnp.bfloat16)

ref = jax.jit(
    lambda f, bx, gg: jax.vmap(
        lambda fi, bi, gi: wholemap_roi_align_grad(
            list(fi), bi, gi, STRIDES, P, 0, 2, 224.0, 4
        )
    )(list(f), bx, gg)
)(feats, boxes, g)

out = jax.jit(
    lambda f, bx, gg: wholemap_grad_pallas(
        list(f), bx, gg, STRIDES, P, 0, 2, 224.0, 4,
        bs=int(os.environ.get("BS", "8")), ty=int(os.environ.get("TY", "16")),
    )
)(feats, boxes, g)

for li in range(4):
    r = np.asarray(ref[li], np.float32)[0]
    o = np.asarray(out[li], np.float32)[0]
    err = np.abs(r - o)
    print(f"level {li}: max err {err.max():.4f} (ref max {np.abs(r).max():.2f})")
    if err.max() > 0.05 * (np.abs(r).max() + 1e-9):
        ys, xs, cs = np.nonzero(err > 0.5 * err.max())
        print(f"  bad rows y: {sorted(set(ys))[:20]}")
        print(f"  bad cols x: {sorted(set(xs))[:20]}")
        print(f"  bad chans c: {sorted(set(cs))[:12]}")
