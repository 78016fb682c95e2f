"""Standalone timings for the hottest conv shapes in the inference trace —
what the same conv achieves outside the graph (roofline check).
Usage: python dev/micro_conv.py
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

rng = np.random.RandomState(0)


def bench(name, fn, *args, flops=0, iters=32):
    # the ~30 ms per-dispatch tunnel RTT floors any per-call timing of a
    # sub-ms kernel: iterate INSIDE one jit (scan with a data dependency so
    # XLA can't hoist the loop body), then time a handful of outer calls.
    def body(x0, _):
        out = fn(x0, *args[1:])
        # feed a FULL-output reduction back into the next input: keeps every
        # output element live (a single-element slice lets XLA DCE the conv
        # down to one pixel) and makes the body loop-carried (no hoisting)
        s = jnp.sum(out.astype(jnp.float32))
        x1 = x0 + s.astype(x0.dtype) * 1e-20
        return x1, s

    def run(*a):
        _, ys = jax.lax.scan(body, a[0], None, length=iters)
        return jnp.sum(ys.astype(jnp.float32))

    f = jax.jit(run)
    np.asarray(f(*args))  # compile+warm
    t0 = time.time()
    outs = [f(*args) for _ in range(4)]
    for o in outs:
        np.asarray(o)
    dt = (time.time() - t0) / (4 * iters)
    tf = flops / dt / 1e12 if flops else 0
    print(f"{name:55s} {dt*1000:7.2f} ms  {tf:6.1f} TFLOP/s ({100*tf/197:4.1f}% peak)",
          flush=True)


def conv(x, w, stride=1, padding="SAME"):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


B = 8
# p2-scale 3x3 256->256 (FPN output conv / RPN hidden conv): the two largest
# conv fusions in the trace (2.89 / 2.58 ms in-graph)
x = jnp.asarray(rng.rand(B, 200, 256, 256), jnp.bfloat16)
w = jnp.asarray(rng.rand(3, 3, 256, 256) * 0.01, jnp.bfloat16)
fl = 2 * B * 200 * 256 * 256 * 256 * 9
bench("3x3 256->256 @ (8,200,256) [p2 FPN/RPN]", conv, x, w, flops=fl)

# same at p3
x3 = jnp.asarray(rng.rand(B, 100, 128, 256), jnp.bfloat16)
bench("3x3 256->256 @ (8,100,128) [p3]", conv, x3, w, flops=fl // 4)

# res2 3x3 64->64 @ 200x256 (many small fusions)
x2 = jnp.asarray(rng.rand(B, 200, 256, 64), jnp.bfloat16)
w2 = jnp.asarray(rng.rand(3, 3, 64, 64) * 0.01, jnp.bfloat16)
bench("3x3 64->64 @ (8,200,256) [res2]", conv, x2, w2,
      flops=2 * B * 200 * 256 * 64 * 64 * 9)

# res3 1x1 512->128 + 3x3 128->128 + 1x1 128->512 @ 100x128
xr3 = jnp.asarray(rng.rand(B, 100, 128, 512), jnp.bfloat16)
wa = jnp.asarray(rng.rand(1, 1, 512, 128) * 0.01, jnp.bfloat16)
wb = jnp.asarray(rng.rand(3, 3, 128, 128) * 0.01, jnp.bfloat16)
wc = jnp.asarray(rng.rand(1, 1, 128, 512) * 0.01, jnp.bfloat16)


def block(x, wa, wb, wc):
    t = conv(x, wa)
    t = conv(t, wb)
    return conv(t, wc)


bench("res3 bottleneck (1x1+3x3+1x1) @ (8,100,128)", block, xr3, wa, wb, wc,
      flops=2 * B * 100 * 128 * (512 * 128 + 128 * 128 * 9 + 128 * 512))

# res4 bottleneck @ 50x64 C=1024
xr4 = jnp.asarray(rng.rand(B, 50, 64, 1024), jnp.bfloat16)
wa4 = jnp.asarray(rng.rand(1, 1, 1024, 256) * 0.01, jnp.bfloat16)
wb4 = jnp.asarray(rng.rand(3, 3, 256, 256) * 0.01, jnp.bfloat16)
wc4 = jnp.asarray(rng.rand(1, 1, 256, 1024) * 0.01, jnp.bfloat16)
bench("res4 bottleneck (1x1+3x3+1x1) @ (8,50,64)", block, xr4, wa4, wb4, wc4,
      flops=2 * B * 50 * 64 * (1024 * 256 + 256 * 256 * 9 + 256 * 1024))

# stem s2d conv as shipped: 7x4 (2,1) C=6 @ (8,800,512)
xs = jnp.asarray(rng.rand(B, 800, 512, 6), jnp.bfloat16)
ws = jnp.asarray(rng.rand(7, 4, 6, 64) * 0.01, jnp.bfloat16)


def conv_s(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (2, 1), [(3, 3), (2, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


bench("stem s2d stride-correct 7x4/(2,1) C=6", conv_s, xs, ws,
      flops=2 * B * 400 * 512 * 7 * 4 * 6 * 64)

# stem quad-s2d candidate: W-quad packing, C=12, output-depth 2x then free
# reshape: 7x2 kernel, stride (2,1), out 128 -> (…, 512, 64)
xq = jnp.asarray(rng.rand(B, 800, 256, 12), jnp.bfloat16)
wq = jnp.asarray(rng.rand(7, 2, 12, 128) * 0.01, jnp.bfloat16)


def conv_q(x, w):
    o = jax.lax.conv_general_dilated(
        x, w, (2, 1), [(3, 3), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    n, h, wd, c = o.shape
    return o.reshape(n, h, wd * 2, c // 2)


bench("stem quad-s2d 7x2/(2,1) C=12 out128+reshape", conv_q, xq, wq,
      flops=2 * B * 400 * 256 * 7 * 2 * 12 * 128)


# --- stem alternatives (round 4): can XLA beat its own 7x7/s2 C=3 codegen? ---

# raw C=3 7x7/2 (what the reference formulation costs, for scale)
xr = jnp.asarray(rng.rand(B, 800, 1024, 3), jnp.bfloat16)
wr = jnp.asarray(rng.rand(7, 7, 3, 64) * 0.01, jnp.bfloat16)
bench("stem raw 7x7/2 C=3", lambda x, w: jax.lax.conv_general_dilated(
    x, w, (2, 2), [(3, 3), (3, 3)],
    dimension_numbers=("NHWC", "HWIO", "NHWC")), xr, wr,
    flops=2 * B * 400 * 512 * 7 * 7 * 3 * 64)

# NCHW dimension numbers (different XLA codegen path for small C?)
xn = jnp.asarray(rng.rand(B, 3, 800, 1024), jnp.bfloat16)
wn = jnp.asarray(rng.rand(64, 3, 7, 7) * 0.01, jnp.bfloat16)
bench("stem raw 7x7/2 C=3 NCHW", lambda x, w: jax.lax.conv_general_dilated(
    x, w, (2, 2), [(3, 3), (3, 3)],
    dimension_numbers=("NCHW", "OIHW", "NCHW")), xn, wn,
    flops=2 * B * 400 * 512 * 7 * 7 * 3 * 64)

# explicit im2col: 49 strided slices -> concat C -> 1x1 conv (one big dot).
# K=147; patch tensor (B,400,512,147) bf16 = 275 MB (write+read ~0.7 ms at BW)
wi = jnp.asarray(rng.rand(7, 7, 3, 64).reshape(147, 64) * 0.01, jnp.bfloat16)
xp = jnp.pad(xr, ((0, 0), (3, 4), (3, 4), (0, 0)))


def stem_im2col(x, w):
    cols = []
    for ky in range(7):
        for kx in range(7):
            cols.append(jax.lax.slice(
                x, (0, ky, kx, 0), (B, ky + 800, kx + 1024, 3), (1, 2, 2, 1)))
    patches = jnp.concatenate(cols, axis=-1)  # (B, 400, 512, 147)
    return jax.lax.dot_general(
        patches, w, (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.bfloat16)


bench("stem im2col 49-slice concat + dot", stem_im2col, xp, wi,
      flops=2 * B * 400 * 512 * 147 * 64)
