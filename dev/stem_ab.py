"""A/B the stem lowering end-to-end at the b8 flagship bench shapes.

Round-5 head regression hunt: `tpu_compile_smoke.py --bench-shapes` measured
155 ms/batch for the b8 flagship (expected ~53) — consistent with the Mosaic
producer-adjacency pooling cliff (+~100 ms) being LIVE despite the feats
optimization_barrier. The pack24 stem shipped in the round-4 snapshot was
never TPU-validated end-to-end; round 4's real 149.8 img/s b8 predates it.

Usage: python dev/stem_ab.py [pack24 wpair direct ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

import jax
import jax.numpy as jnp

from proben_tpu.models import build_config, init_rcnn, rcnn_inference
from bench import enable_compile_cache, host_init, structured_images

enable_compile_cache()

batch, iters = 8, 8
rng = np.random.RandomState(0)
impls = sys.argv[1:] or ["wpair", "pack24", "direct"]

sizes = jnp.asarray(np.tile([[800, 1000]], (batch, 1)).astype(np.int32))
base = structured_images(rng, 2, batch, 800, 1024, 3)
imgs = [jnp.asarray(a) for a in base]

for impl in impls:
    cfg = build_config(depth=101, input_format="BGR", num_classes=3,
                       compute_dtype="bfloat16", stem_impl=impl)
    params = host_init(lambda k: init_rcnn(k, cfg), jax.random.PRNGKey(0))
    fn = jax.jit(lambda p, im, sz, c=cfg: rcnn_inference(p, c, im, sz))
    t0 = time.time()
    np.asarray(fn(params, imgs[0], sizes).scores)
    print(f"  {impl}: compile+warm {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    outs = [fn(params, imgs[i % 2], sizes) for i in range(iters)]
    for o in outs:
        np.asarray(o.scores)
    ms = (time.time() - t0) * 1000 / iters
    print(f"  {impl}: {ms:.1f} ms/batch  ({batch * 1000 / ms:.1f} img/s)",
          flush=True)
