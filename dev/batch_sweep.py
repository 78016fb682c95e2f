import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
import bench as _bench
from proben_tpu.models import build_config, init_rcnn, rcnn_inference

_bench.enable_compile_cache()
cfg = build_config(depth=101, input_format="BGR", num_classes=3, compute_dtype="bfloat16", stem_impl=os.environ.get("SWEEP_STEM", "pallas"))
params = _bench.host_init(lambda k: init_rcnn(k, cfg), jax.random.PRNGKey(0))
params = _bench.calibrate_heads(params, bg_bias=6.0)
rng = np.random.RandomState(0)
batches = [int(b) for b in (sys.argv[1:] or ["8", "12", "16"])]
for batch in batches:
    sizes = jnp.asarray(np.tile([[800, 1000]], (batch, 1)).astype(np.int32))
    imgs = [jnp.asarray(a) for a in _bench.structured_images(rng, 2, batch, 800, 1024, 3)]
    fn = jax.jit(lambda p, im, sz: rcnn_inference(p, cfg, im, sz))
    out = _bench.retry_transient(lambda: fn(params, imgs[0], sizes))
    ndet = float(np.asarray(out.valid).sum(-1).mean())
    iters = max(8, 128 // batch)
    t0 = time.time()
    outs = [fn(params, imgs[i % 2], sizes) for i in range(iters)]
    for o in outs:
        np.asarray(o.scores)
    dt = time.time() - t0
    print(f"batch {batch:3d}: {batch*iters/dt:7.2f} img/s  ({dt/iters*1000:6.1f} ms/batch, "
          f"{ndet:.1f} dets/img)", flush=True)
