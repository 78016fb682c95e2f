"""E2E candidates: 2x4 pack via XLA transpose + 12-tap main conv.
Also times the pure pack transpose alone."""
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
    print(f"{name:58s} {(time.time()-t0)/(4*iters)*1000:7.2f} ms", flush=True)


def conv(x, w, stride, pad):
    return jax.lax.conv_general_dilated(
        x, w, stride, pad, dimension_numbers=("NHWC", "HWIO", "NHWC"))


x6 = jnp.asarray(rng.rand(B, 800, 512, 6), jnp.bfloat16)  # W-pair view
wm = jnp.asarray(rng.rand(4, 3, 24, 128) * 0.01, jnp.bfloat16)


def pack24(x):
    n, h, w2, c = x.shape  # (8,800,512,6)
    # H-pair interleave: (n, 400, 2, 512, 6) -> (n, 400, 512, 2, 6)
    x = x.reshape(n, h // 2, 2, w2, c).transpose(0, 1, 3, 2, 4)
    # ch layout (hr, wr, cc); W-quad fold: pairs (s) major over (hr, wr, cc)
    return x.reshape(n, h // 2, w2 // 2, 4 * c)


bench("pack24 transpose alone", pack24, x6)
bench("pack24 + main (4,3,24,128)", lambda x, w: conv(pack24(x), w, (1, 1),
                                                      [(2, 1), (1, 1)]), x6, wm)

# variant: H-interleave via lax.dynamic_slice-free strided gather? Use
# jnp.stack of two strided slices on H (each (8,400,512,6)), stacked on a
# new minor-2 axis then reshaped — different lowering than transpose.
def pack24_slices(x):
    n, h, w2, c = x.shape
    e = x[:, 0::2]
    o = x[:, 1::2]
    st = jnp.stack([e, o], axis=3)  # (n, 400, 512, 2, 6)
    return st.reshape(n, h // 2, w2 // 2, 4 * c)


bench("pack24 via 2 strided H-slices + stack", pack24_slices, x6)
bench("pack24_slices + main conv", lambda x, w: conv(
    pack24_slices(x), w, (1, 1), [(2, 1), (1, 1)]), x6, wm)

# variant: fold the H-interleave into the WEIGHTS of a 2-row-tap conv at
# stride (2,1) on the UNPACKED input, but with full output channels:
# kernel (5, 3, 12, 128) on W-quad-only packed input (8, 800, 256, 12):
# H taps 2i-3..2i+3 need kernel H-span 7 at stride 2 -> kh=7 is the shipped
# form; instead kh=4 with H-PAIR folded needs the pack. Skip.

# variant: maxpool fused question — time the stem's following maxpool alone
xs = jnp.asarray(rng.rand(B, 400, 512, 64), jnp.bfloat16)


def mp(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])


bench("maxpool 3x3/2 on (8,400,512,64)", mp, xs)
