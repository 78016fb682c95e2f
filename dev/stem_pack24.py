"""Prototype: 7x7/stride-2 stem conv as 2x4-packed 12-tap conv.

Tap law (dev/micro_conv.py, v5e): XLA small-C conv time ~ 0.165 ms per
spatial kernel position at bench shapes, independent of C (C << 128).
Shipped width-pair s2d = 7x4 = 28 taps (4.67 ms). This formulation:

  1. W-pair pack: (N, 800, 1024, 3) -> (N, 800, 512, 6) — free reshape.
  2. H-pair pack via a 2-tap DELTA conv, stride (2, 1): -> (N, 400, 512, 12)
     channels (hr, wr, c). A delta conv avoids the H-interleave transpose
     that cost ~2 ms as an XLA reshape/transpose (docs/PERF.md round 3).
  3. W-quad fold: (N, 400, 256, 24) — free reshape.
  4. Main conv (4, 3, 24, 128), stride 1, padding (H: 2 pair-taps left /
     1 right; W: 1 quad-tap each side), output phases in channels:
     (N, 400, 256, 128) -> free reshape -> (N, 400, 512, 64).

Predicted: 2 + 12 taps ~ 2.3 ms vs 4.67 shipped.

Weight layout (main conv) w24[hp, wq, (hr, wr, c), (p, o)]:
  output row i uses input rows 2i-3..2i+3 = H-pairs i-2..i+1 (hp taps 0..3
  with pad-left 2 pairs), row 2i-4+2*hp+hr, i.e. ky = 2*hp + hr - 4+3 …
  ky = 2*hp + hr - 1 in 0..6 (hp=0,hr=0 -> ky=-1: zero weight).
  output col w' = 2Q + p uses pixels 4Q+2p-3..4Q+2p+3 = quads Q-1..Q+1
  (wq taps 0..2, pad 1 each side), pixel 4*(Q-1+wq) + 2*wr + wc…
  kx = 4*wq + 2*wr + wc - 4 - (2p - 3) must land in 0..6 else zero.
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


def pack24_weights(w):
    """(7, 7, C, O) -> delta (2, 1, 2C, 4C) is implicit; returns main-conv
    weights (4, 3, 4C, 2O) for the packed formulation."""
    kh, kw, c, o = w.shape
    assert kh == 7 and kw == 7
    w24 = np.zeros((4, 3, 8 * c, 2 * o), w.dtype)
    for hp in range(4):
        for hr in range(2):
            ky = 2 * hp + hr - 1
            if not (0 <= ky < 7):
                continue
            for wq in range(3):
                # packed channel layout after the three packs (see
                # stem_pack24): ci = (4*s + 2*hr + wr)*c + cc where s = pair
                # index within the quad, wr = pixel within the pair. Input
                # quad Q-1+wq holds pixels 4*(Q-1+wq) + 2*s + wr; output col
                # w' = 2Q+p reads pixel 4Q+2p-3+kx, so
                # kx = 4*wq + 2*s + wr - 1 - 2*p.
                for s in range(2):
                    for wr in range(2):
                        for p in range(2):
                            kx = 4 * wq + 2 * s + wr - 1 - 2 * p
                            if 0 <= kx < 7:
                                ci = (4 * s + 2 * hr + wr) * c
                                w24[hp, wq, ci:ci + c, p * o:(p + 1) * o] += (
                                    w[ky, kx, :, :])
    return w24


def stem_pack24(x, w24, c_in):
    """x: (N, H, W, C) raw input. Returns (N, H//2, W//2, O)."""
    n, h, wd, c = x.shape
    # 1. W-pair: free
    x = x.reshape(n, h, wd // 2, 2 * c)
    # 2. H-pair via delta conv stride (2,1): out ch (hr, wrc)
    eye = jnp.eye(2 * c, dtype=x.dtype)
    wdelta = jnp.stack([jnp.concatenate([eye, eye * 0], 1),
                        jnp.concatenate([eye * 0, eye], 1)])[:, None]
    # wdelta: (2, 1, 2c, 4c): out ch block hr*2c + wrc
    x = jax.lax.conv_general_dilated(
        x, wdelta, (2, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # now (n, h//2, wd//2, 4c): ch = (hr, wr, c) as hr*2c + wr*c + cc
    # 3. W-quad fold: pairs (2Q, 2Q+1) -> ch (s, hr, wr, c)
    x = x.reshape(n, h // 2, wd // 4, 8 * c)
    # ch layout now: s*4c + hr*2c + wr*c + cc, i.e. ((s*2+wr? no: s, hr, wr)
    out = jax.lax.conv_general_dilated(
        x, w24, (1, 1), [(2, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # (n, h//2, wd//4, 2o) -> interleave phase into W
    o2 = out.shape[-1]
    return out.reshape(n, h // 2, wd // 2, o2 // 2)


def main():
    rng = np.random.RandomState(0)
    c_in = 3
    # exactness check at small shape, f32
    x = rng.rand(2, 32, 64, c_in).astype(np.float32)
    w = (rng.rand(7, 7, c_in, 64) * 0.1 - 0.05).astype(np.float32)

    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))

    w24 = pack24_weights(w)
    got = stem_pack24(jnp.asarray(x), jnp.asarray(w24), c_in)
    err = float(jnp.abs(ref - got).max() / jnp.abs(ref).max())
    print(f"exactness: shapes {ref.shape} vs {got.shape}, rel err {err:.2e}",
          flush=True)
    assert got.shape == ref.shape
    assert err < 1e-5, err

    # timing at bench shape, bf16
    B = 8
    xb = jnp.asarray(rng.rand(B, 800, 1024, c_in), jnp.bfloat16)
    w24b = jnp.asarray(w24, jnp.bfloat16)

    def run(x0, wt):
        def body(xc, _):
            out = stem_pack24(xc, wt, c_in)
            s = jnp.sum(out.astype(jnp.float32))
            return xc + s.astype(xc.dtype) * 1e-20, s
        _, ys = jax.lax.scan(body, x0, None, length=32)
        return jnp.sum(ys.astype(jnp.float32))

    f = jax.jit(run)
    np.asarray(f(xb, w24b))
    t0 = time.time()
    outs = [f(xb, w24b) for _ in range(4)]
    for o in outs:
        np.asarray(o)
    dt = (time.time() - t0) / (4 * 32)
    print(f"stem pack24 (delta + 12-tap):  {dt*1000:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
