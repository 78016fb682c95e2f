"""Decompose the pack24 stem cost: which stage broke the tap law?"""
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

rng = np.random.RandomState(0)
B = 8


def bench(name, fn, *args, iters=32):
    def body(x0, _):
        out = fn(x0, *args[1:])
        s = jnp.sum(out.astype(jnp.float32))
        return x0 + s.astype(x0.dtype) * 1e-20, s

    def run(*a):
        _, ys = jax.lax.scan(body, a[0], None, length=iters)
        return jnp.sum(ys.astype(jnp.float32))

    f = jax.jit(run)
    np.asarray(f(*args))
    t0 = time.time()
    outs = [f(*args) for _ in range(4)]
    for o in outs:
        np.asarray(o)
    print(f"{name:55s} {(time.time()-t0)/(4*iters)*1000:7.2f} ms", flush=True)


def conv(x, w, stride, pad):
    return jax.lax.conv_general_dilated(
        x, w, stride, pad, dimension_numbers=("NHWC", "HWIO", "NHWC"))


# stage A: H-pair delta conv (2,1,6,12) stride (2,1) on (8,800,512,6)
x6 = jnp.asarray(rng.rand(B, 800, 512, 6), jnp.bfloat16)
eye = np.eye(6, dtype=np.float32)
wd = np.stack([np.concatenate([eye, eye * 0], 1),
               np.concatenate([eye * 0, eye], 1)])[:, None]
wd = jnp.asarray(wd, jnp.bfloat16)  # (2,1,6,12)
bench("A: delta (2,1,6,12)/(2,1) on (8,800,512,6)", conv, x6, wd,
      (2, 1), [(0, 0), (0, 0)])

# stage A': combined 2x2 delta (2,2,6,24) stride (2,2)
wd2 = np.zeros((2, 2, 6, 24), np.float32)
for hr in range(2):
    for s in range(2):
        for ic in range(6):
            wd2[hr, s, ic, s * 12 + hr * 6 + ic] = 1.0
wd2 = jnp.asarray(wd2, jnp.bfloat16)
bench("A': delta (2,2,6,24)/(2,2) on (8,800,512,6)", conv, x6, wd2,
      (2, 2), [(0, 0), (0, 0)])

# stage B: main conv (4,3,24,128) stride 1 on (8,400,256,24)
x24 = jnp.asarray(rng.rand(B, 400, 256, 24), jnp.bfloat16)
wm = jnp.asarray(rng.rand(4, 3, 24, 128) * 0.01, jnp.bfloat16)
bench("B: main (4,3,24,128)/1 on (8,400,256,24)", conv, x24, wm,
      (1, 1), [(2, 1), (1, 1)])

# B with O=64 for the law: (4,3,24,64)
wm64 = jnp.asarray(rng.rand(4, 3, 24, 64) * 0.01, jnp.bfloat16)
bench("B64: main (4,3,24,64)/1 on (8,400,256,24)", conv, x24, wm64,
      (1, 1), [(2, 1), (1, 1)])

# law re-checks: same tap count, varying C/O
xq = jnp.asarray(rng.rand(B, 800, 256, 12), jnp.bfloat16)
wq = jnp.asarray(rng.rand(7, 2, 12, 128) * 0.01, jnp.bfloat16)
bench("law: (7,2,12,128)/(2,1) on (8,800,256,12) [14 taps]", conv, xq, wq,
      (2, 1), [(3, 3), (1, 1)])
