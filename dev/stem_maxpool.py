"""Maxpool 3x3/2 reformulations: reduce_window measured 1.86 ms at the stem
output shape — ~9x its bandwidth floor. Try separable and slice forms."""
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
x = jnp.asarray(rng.rand(B, 400, 512, 64), jnp.bfloat16)


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
    print(f"{name:58s} {(time.time()-t0)/(4*iters)*1000:7.2f} ms", flush=True)


def rw(x, wdims, wstrides, pads):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, wdims, wstrides, pads)


bench("reduce_window 3x3/2 (shipped)", rw, x, (1, 3, 3, 1), (1, 2, 2, 1),
      [(0, 0), (1, 1), (1, 1), (0, 0)])

bench("separable: (3,1)/(2,1) then (1,3)/(1,2)",
      lambda x: rw(rw(x, (1, 3, 1, 1), (1, 2, 1, 1),
                      [(0, 0), (1, 1), (0, 0), (0, 0)]),
                   (1, 1, 3, 1), (1, 1, 2, 1),
                   [(0, 0), (0, 0), (1, 1), (0, 0)]), x)

bench("separable: (1,3)/(1,2) then (3,1)/(2,1)",
      lambda x: rw(rw(x, (1, 1, 3, 1), (1, 1, 2, 1),
                      [(0, 0), (0, 0), (1, 1), (0, 0)]),
                   (1, 3, 1, 1), (1, 2, 1, 1),
                   [(0, 0), (1, 1), (0, 0), (0, 0)]), x)


def mp_wpair(x):
    """W-pass on the free W-pair view: out col w'=2q+p needs cols
    2w'-1..2w'+1 = pairs (q-? ) — cols 4q+2p-1..4q+2p+1. As pair view
    (n,h,256,128): per out col w' (512 of them)… stays ragged; instead do
    W-pass via 3 shifted strided slices max."""
    n, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)),
                 constant_values=-jnp.inf)
    a = jax.lax.slice(xp, (0, 0, 0, 0), (n, h, w, c), (1, 1, 2, 1))
    b = jax.lax.slice(xp, (0, 0, 1, 0), (n, h, w + 1, c), (1, 1, 2, 1))
    cc = jax.lax.slice(xp, (0, 0, 2, 0), (n, h, w + 2, c), (1, 1, 2, 1))
    t = jnp.maximum(jnp.maximum(a, b), cc)  # (n, h, 256, c)
    # H-pass: rows 2i-1..2i+1, stride 2
    tp = jnp.pad(t, ((0, 0), (1, 1), (0, 0), (0, 0)),
                 constant_values=-jnp.inf)
    d = jax.lax.slice(tp, (0, 0, 0, 0), (n, h, w // 2, c), (1, 2, 1, 1))
    e = jax.lax.slice(tp, (0, 1, 0, 0), (n, h + 1, w // 2, c), (1, 2, 1, 1))
    f = jax.lax.slice(tp, (0, 2, 0, 0), (n, h + 2, w // 2, c), (1, 2, 1, 1))
    return jnp.maximum(jnp.maximum(d, e), f)


bench("shifted strided slices (W then H)", mp_wpair, x)

# sanity: all agree
ref = rw(x, (1, 3, 3, 1), (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)])
s1 = rw(rw(x, (1, 3, 1, 1), (1, 2, 1, 1), [(0, 0), (1, 1), (0, 0), (0, 0)]),
        (1, 1, 3, 1), (1, 1, 2, 1), [(0, 0), (0, 0), (1, 1), (0, 0)])
s2 = mp_wpair(x)
print("sep match:", bool(jnp.all(ref == s1)), "slice match:",
      bool(jnp.all(ref == s2)), ref.shape, s1.shape, s2.shape, flush=True)
