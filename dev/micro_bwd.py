import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from proben_tpu.ops.roi_align import wholemap_roi_align_grad

B, K, P, C = 8, 512, 7, 256
rng = np.random.RandomState(0)
feats_shapes = [(200, 256), (100, 128), (50, 64), (25, 32)]
feats = [jnp.asarray(rng.rand(B, h, w, C).astype(np.float32), jnp.bfloat16) for h, w in feats_shapes]
# boxes spread over all levels
sizes = rng.rand(B, K, 2) * 400 + 16
xy = rng.rand(B, K, 2) * 300
boxes = jnp.asarray(np.concatenate([xy, xy + sizes], -1).astype(np.float32))
g = jnp.asarray(rng.rand(B, K, P, P, C).astype(np.float32), jnp.bfloat16)

for ch in (64, 128, 256, 512):
    def run(feats, boxes, g, ch=ch):
        def per_image(f, b, gg):
            return wholemap_roi_align_grad(list(f), b, gg, (4, 8, 16, 32), 7, 0, 2, 224.0, 4, box_chunk=ch)
        return jax.vmap(per_image)(list(feats), boxes, g)
    fn = jax.jit(run)
    out = fn(feats, boxes, g)
    np.asarray(out[0])
    t0 = time.time()
    outs = [fn(feats, boxes, g) for _ in range(8)]
    for o in outs: np.asarray(o[0][0,0,0,0])
    dt = (time.time() - t0) / 8 * 1000
    print(f"ch={ch}: {dt:.1f} ms")
