import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from proben_tpu.models import build_config, init_rcnn, rcnn_inference

cfg = build_config(depth=101, input_format="BGR", num_classes=3, compute_dtype="bfloat16")
params = init_rcnn(jax.random.PRNGKey(0), cfg)
rng = np.random.RandomState(0)
for batch in (1, 2, 4, 8, 16):
    sizes = jnp.asarray(np.tile([[800, 1000]], (batch, 1)).astype(np.int32))
    imgs = [jnp.asarray(rng.rand(batch, 800, 1024, 3).astype(np.float32) * 255)
            for _ in range(4)]
    fn = jax.jit(lambda p, im, sz: rcnn_inference(p, cfg, im, sz))
    np.asarray(fn(params, imgs[0], sizes).scores)
    iters = 16
    t0 = time.time()
    outs = [fn(params, imgs[i % 4], sizes) for i in range(iters)]
    for o in outs:
        np.asarray(o.scores)
    dt = time.time() - t0
    print(f"batch {batch:3d}: {batch*iters/dt:7.2f} img/s  ({dt/iters*1000:6.1f} ms/batch)")
