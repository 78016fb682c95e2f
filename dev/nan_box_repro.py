"""Does a non-finite box crash the Pallas pooling kernel on the TPU?

Context: dev/export_bench_ckpt.py runs crash the TPU worker at ~iter 20+
(where training goes NaN) ONLY with ROI_ALIGN_IMPL=pallas; the gather path
survives the same NaN trajectory. Production kernels must degrade (garbage
output is fine mid-divergence; the NaN guard handles it) — not kill the
chip."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from proben_tpu.ops.roi_align_pallas import multilevel_roi_align_pallas
from bench import enable_compile_cache

enable_compile_cache()

rng = np.random.RandomState(0)
B, K, C = 2, 512, 256
feats = [
    jnp.asarray(rng.randn(B, 200, 256, C).astype(np.float32), jnp.bfloat16),
    jnp.asarray(rng.randn(B, 100, 128, C).astype(np.float32), jnp.bfloat16),
    jnp.asarray(rng.randn(B, 50, 64, C).astype(np.float32), jnp.bfloat16),
    jnp.asarray(rng.randn(B, 25, 32, C).astype(np.float32), jnp.bfloat16),
]

xy = rng.rand(B, K, 2).astype(np.float32) * 600
wh = rng.rand(B, K, 2).astype(np.float32) * 150 + 8
boxes = np.concatenate([xy, xy + wh], -1)

fn = jax.jit(
    lambda f, b: multilevel_roi_align_pallas(f, b, [4, 8, 16, 32])
)

for label, bad in [
    ("finite", None),
    ("nan-few", ("nan", 7)),
    ("inf-few", ("inf", 13)),
    ("all-nan", ("nan", K)),
]:
    bx = boxes.copy()
    if bad is not None:
        kind, cnt = bad
        val = np.nan if kind == "nan" else np.inf
        bx[:, :cnt, :] = val
    out = fn(feats, jnp.asarray(bx))
    arr = np.asarray(out, np.float32)
    print(f"{label}: out finite frac {np.isfinite(arr).mean():.4f}", flush=True)
print("survived all cases")
