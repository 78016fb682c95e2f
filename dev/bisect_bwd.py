"""Bisect the compiled-mode wholemap_grad_pallas mismatch: start from the
known-good small config and flip one axis at a time toward the failing bench
config. Reference einsum backward runs on CPU (f32) to avoid TPU compiles.
"""
import os
import sys

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

STRIDES = (4, 8, 16, 32)
P = 7
# the einsum reference is whole-map for ALL rows; the kernel only matches it
# when every oow row is within fallback capacity (beyond-capacity rows keep
# window-clamped grads BY DESIGN, mirroring the forward). Default far above
# the diag_bwd_host.py oow counts so the comparison is apples-to-apples.
CAPACITY = int(os.environ.get("CAPACITY", "128"))
CPU = jax.devices("cpu")[0]

SMALL_MAPS = [(64, 64), (32, 32), (16, 16), (8, 8)]
BENCH_MAPS = [(200, 256), (100, 128), (50, 64), (25, 32)]

CONFIGS = [
    # (name, B, K, maps, xy_scale, wh_scale, bs, ty)
    ("base-small(bs8)", 1, 64, SMALL_MAPS, 150, 80, 8, 16),
    ("bs16", 1, 64, SMALL_MAPS, 150, 80, 16, 16),
    ("bench-maps", 1, 64, BENCH_MAPS, 300, 416, 16, 16),
    ("K512", 1, 512, BENCH_MAPS, 300, 416, 16, 16),
    ("B8", 8, 512, BENCH_MAPS, 300, 416, 16, 16),
]
if len(sys.argv) > 1:
    CONFIGS = [c for c in CONFIGS if c[0] in sys.argv[1:]]

for name, B, K, maps, xs, ws, bs, ty in CONFIGS:
    rng = np.random.RandomState(0)
    C = 256
    feats = [
        jnp.asarray(rng.rand(B, h, w, C).astype(np.float32), jnp.bfloat16)
        for h, w in maps
    ]
    xy = rng.rand(B, K, 2) * xs
    wh = rng.rand(B, K, 2) * (ws - 8) + 8
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1).astype(np.float32))
    g = jnp.asarray(rng.rand(B, K, P, P, C).astype(np.float32), jnp.bfloat16)

    import time as _time

    t0 = _time.time()
    print(f"{name}: computing CPU einsum reference...", flush=True)
    with jax.default_device(CPU):
        fc = [jax.device_put(np.asarray(f), CPU) for f in feats]
        bc = jax.device_put(np.asarray(boxes), CPU)
        gc = jax.device_put(np.asarray(g), CPU)
        ref = jax.jit(
            lambda f, bx, gg: jax.vmap(
                lambda fi, bi, gi: wholemap_roi_align_grad(
                    list(fi), bi, gi, STRIDES, P, 0, 2, 224.0, 4
                )
            )(list(f), bx, gg)
        )(fc, bc, gc)
        ref = [np.asarray(r, np.float32) for r in ref]

    print(f"{name}: ref done ({_time.time() - t0:.0f}s); compiling pallas on TPU...",
          flush=True)
    t0 = _time.time()
    out = jax.jit(
        lambda f, bx, gg: wholemap_grad_pallas(
            list(f), bx, gg, STRIDES, P, 0, 2, 224.0, 4,
            fallback_capacity=CAPACITY, bs=bs, ty=ty
        )
    )(feats, boxes, g)
    out = [np.asarray(o, np.float32) for o in out]
    print(f"{name}: pallas done ({_time.time() - t0:.0f}s)", flush=True)

    worst = 0.0
    msgs = []
    for li in range(4):
        err = np.abs(ref[li] - out[li])
        rel = err.max() / (np.abs(ref[li]).max() + 1e-9)
        worst = max(worst, rel)
        if rel > 0.03:
            bi, ys, xs_, cs = np.nonzero(err > 0.5 * err.max())
            msgs.append(
                f"    L{li} rel {rel:.3f} imgs {sorted(set(bi))[:6]} "
                f"rows {sorted(set(ys))[:12]} cols {sorted(set(xs_))[:8]}"
            )
    status = "PASS" if worst <= 0.03 else "FAIL"
    print(f"{name}: {status} (worst rel {worst:.4f})", flush=True)
    for m in msgs:
        print(m, flush=True)
    if status == "FAIL":
        break
