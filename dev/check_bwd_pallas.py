"""Correctness check: wholemap_grad_pallas (interpret, CPU) vs the einsum
backward on identical inputs. f32 features, mixed in/out-of-window boxes."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=1"
).strip()
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from proben_tpu.ops.roi_align import wholemap_roi_align_grad
from proben_tpu.ops.roi_align_bwd_pallas import wholemap_grad_pallas

rng = np.random.RandomState(0)
B, K, P, C = 2, 16, 7, 32
SHAPES = [(50, 64), (25, 32), (13, 16), (7, 8)]
STRIDES = (4, 8, 16, 32)
feats = [jnp.asarray(rng.rand(B, h, w, C).astype(np.float32)) for h, w in SHAPES]

xy = rng.rand(B, K, 2) * 120
wh = rng.rand(B, K, 2) * 90 + 8
boxes_np = np.concatenate([xy, xy + wh], -1).astype(np.float32)
# one elongated sliver per image (out-of-window at its level)
boxes_np[:, 0] = [2, 2, 6, 190]
boxes = jnp.asarray(boxes_np)
g = jnp.asarray(rng.rand(B, K, P, P, C).astype(np.float32))

ref = jax.vmap(
    lambda f, bx, gg: wholemap_roi_align_grad(
        list(f), bx, gg, STRIDES, P, 0, 2, 224.0, 4
    )
)(list(feats), boxes, g)

out = wholemap_grad_pallas(
    feats, boxes, g, STRIDES, P, 0, 2, 224.0, 4, interpret=True, bs=4, ty=8
)

ok = True
for li, (r, o) in enumerate(zip(ref, out)):
    r, o = np.asarray(r), np.asarray(o)
    err = np.abs(r - o).max()
    rel = err / (np.abs(r).max() + 1e-9)
    print(f"level {li}: max abs err {err:.3e}  rel {rel:.3e}")
    if rel > 1e-5:
        ok = False
        bad = np.unravel_index(np.argmax(np.abs(r - o)), r.shape)
        print(f"  worst at {bad}: ref {r[bad]:.6f} vs pallas {o[bad]:.6f}")
print("PASS" if ok else "FAIL")
sys.exit(0 if ok else 1)
