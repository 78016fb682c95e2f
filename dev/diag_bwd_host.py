"""Host-side diagnostics for the failing bisect config: oow counts vs
fallback capacity, and true visit counts vs the kernel's static v_max."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from proben_tpu.ops.roi_align import (
    WIN_Y, build_window_weights, pad_level, roi_level_assignment,
)
from proben_tpu.ops.roi_align_bwd_pallas import _canvas_geometry

STRIDES = (4, 8, 16, 32)
P = 7
BENCH_MAPS = [(200, 256), (100, 128), (50, 64), (25, 32)]

for name, B, K, maps, xs, ws, bs, ty in [
    ("K512", 1, 512, BENCH_MAPS, 300, 416, 16, 16),
    ("B8", 8, 512, BENCH_MAPS, 300, 416, 16, 16),
    ("micro", 8, 512, BENCH_MAPS, 300, 400 + 16, 16, 16),
]:
    rng = np.random.RandomState(0)
    C = 4
    feats = [jnp.zeros((B, h, w, C)) for h, w in maps]
    xy = rng.rand(B, K, 2) * xs
    wh = rng.rand(B, K, 2) * (ws - 8) + 8
    if name == "micro":
        # micro_bwd_pallas.py draws sizes FIRST then xy
        rng = np.random.RandomState(0)
        wh = rng.rand(B, K, 2) * 400 + 16
        xy = rng.rand(B, K, 2) * 300
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)

    flat = jnp.asarray(boxes.reshape(B * K, 4))
    heights = jnp.array([f.shape[1] for f in feats], jnp.int32)
    widths = jnp.array([f.shape[2] for f in feats], jnp.int32)
    pad_hs = jnp.array([max(f.shape[1], WIN_Y) for f in feats], jnp.int32)
    pad_ws = jnp.array([pad_level(f).shape[-2] for f in feats], jnp.int32)
    levels = roi_level_assignment(flat, 2, 5, 224.0, 4)
    lvl_idx = levels - 2
    y0, x0, wy, wx, oow = build_window_weights(
        flat, lvl_idx, STRIDES, heights, widths, pad_hs, pad_ws, P, 0, 16
    )
    oow_bk = np.asarray(oow).reshape(B, K)
    offs, hc_raw, wmax = _canvas_geometry(feats)
    t_tiles = -(-hc_raw // ty)
    nb = K // bs
    v_max = nb * (-(-WIN_Y // ty) + 2) + 2 * t_tiles

    y0c = np.asarray(y0) + np.array(offs)[np.asarray(lvl_idx)]
    y0c = y0c.reshape(B, K)
    lvl_bk = np.asarray(lvl_idx).reshape(B, K)
    print(f"{name}: oow/img {oow_bk.sum(1)} (capacity 32)")
    print(f"  oow levels: {[sorted(set(lvl_bk[i][oow_bk[i]])) for i in range(min(B,3))]}")
    visits = []
    for i in range(B):
        ys = np.sort(y0c[i]).reshape(nb, bs)
        ta = ys[:, 0] // ty
        tb = np.minimum((ys[:, -1] + WIN_Y - 1) // ty, t_tiles - 1)
        total = 0
        for t in range(t_tiles):
            n = np.sum((ta <= t) & (tb >= t))
            total += max(n, 1)
        visits.append(total)
    print(f"  visits/img {visits} vs v_max {v_max} "
          f"{'OVERFLOW' if max(visits) > v_max else 'ok'}")
