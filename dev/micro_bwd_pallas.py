"""TPU micro-bench: fused Pallas RoIAlign backward vs the einsum backward at
batch-8 bench shapes. Usage: python dev/micro_bwd_pallas.py [bs=16] [ty=24]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

_cache = os.path.expanduser("~/.cache/proben_tpu_xla_tpu")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from proben_tpu.ops.roi_align import wholemap_roi_align_grad
from proben_tpu.ops.roi_align_bwd_pallas import wholemap_grad_pallas

BS = int(sys.argv[1]) if len(sys.argv) > 1 else 16
TY = int(sys.argv[2]) if len(sys.argv) > 2 else 24

B, K, P, C = 8, 512, 7, 256
rng = np.random.RandomState(0)
feats_shapes = [(200, 256), (100, 128), (50, 64), (25, 32)]
feats = [
    jnp.asarray(rng.rand(B, h, w, C).astype(np.float32), jnp.bfloat16)
    for h, w in feats_shapes
]
sizes = rng.rand(B, K, 2) * 400 + 16
xy = rng.rand(B, K, 2) * 300
boxes = jnp.asarray(np.concatenate([xy, xy + sizes], -1).astype(np.float32))
g = jnp.asarray(rng.rand(B, K, P, P, C).astype(np.float32), jnp.bfloat16)


def timeit(name, fn):
    out = fn(feats, boxes, g)
    np.asarray(out[0])
    t0 = time.time()
    outs = [fn(feats, boxes, g) for _ in range(8)]
    for o in outs:
        np.asarray(o[0][0, 0, 0, 0])
    dt = (time.time() - t0) / 8 * 1000
    print(f"{name}: {dt:.1f} ms", flush=True)
    return out


def run_einsum(feats, boxes, g):
    def per_image(f, b, gg):
        return wholemap_roi_align_grad(
            list(f), b, gg, (4, 8, 16, 32), 7, 0, 2, 224.0, 4
        )
    return jax.vmap(per_image)(list(feats), boxes, g)


def run_pallas(feats, boxes, g):
    return wholemap_grad_pallas(
        list(feats), boxes, g, (4, 8, 16, 32), 7, 0, 2, 224.0, 4,
        bs=BS, ty=TY,
    )


ref = timeit("einsum bwd", jax.jit(run_einsum))
out = timeit(f"pallas bwd (bs={BS}, ty={TY})", jax.jit(run_pallas))

for li in range(4):
    r = np.asarray(ref[li], np.float32)
    o = np.asarray(out[li], np.float32)
    err = np.abs(r - o).max()
    print(f"level {li}: max abs err {err:.3e} (ref max {np.abs(r).max():.2f})")
