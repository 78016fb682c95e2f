"""Compiled-TPU correctness check of the fused Pallas stem at bench scale
(the interpret-mode tests cannot catch DMA pipelining races)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from proben_tpu.models.layers import affine, conv2d_stem_s2d, max_pool
from proben_tpu.ops.stem_pallas import stem_pool_pallas
from bench import enable_compile_cache

enable_compile_cache()

rng = np.random.RandomState(0)
for shape in [(2, 800, 1024, 3), (8, 800, 1024, 3)]:
    n, h, wd, c = shape
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    w = jnp.asarray((rng.randn(7, 7, c, 64) * 0.1).astype(np.float32))
    scale = jnp.asarray((1 + 0.3 * rng.randn(64)).astype(np.float32))
    bias = jnp.asarray((0.3 * rng.randn(64)).astype(np.float32))

    def ref_fn(x, w, scale, bias):
        hh = conv2d_stem_s2d(x, {"w": w}, dtype=jnp.bfloat16, impl="wpair")
        hh = jnp.maximum(affine(hh, {"scale": scale, "bias": bias}), 0)
        return max_pool(hh, 3, 2, padding=1)

    ref = np.asarray(jax.jit(ref_fn)(x, w, scale, bias), np.float32)
    got = np.asarray(
        jax.jit(lambda *a: stem_pool_pallas(*a))(x, w, scale, bias), np.float32
    )
    d = np.abs(got - ref)
    bad = (d > 0.05 * np.abs(ref) + 0.05).mean()
    print(f"{shape}: max abs diff {d.max():.4f}, frac bad {bad:.5f}", flush=True)
    # where do mismatches cluster (row index) if any?
    if bad > 0:
        rows = np.where((d > 0.05 * np.abs(ref) + 0.05).any(axis=(0, 2, 3)))[0]
        print(f"  bad pool rows: {rows[:20]} ... total {len(rows)}", flush=True)
print("done")
