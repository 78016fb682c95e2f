import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
import bench
from proben_tpu.models import build_config, init_rcnn, rcnn_inference

batch = 4
cfg = build_config(depth=101, input_format="BGR", num_classes=3, compute_dtype="bfloat16")
base = init_rcnn(jax.random.PRNGKey(0), cfg)
rng = np.random.RandomState(0)
sizes = jnp.asarray(np.tile([[800, 1000]], (batch, 1)).astype(np.int32))
fn = jax.jit(lambda p, im, sz: rcnn_inference(p, cfg, im, sz))
img = jnp.asarray(bench.structured_images(rng, 1, batch, 800, 1024, 3)[0])
import copy
for bias in (5.0, 7.0, 9.0, 11.0):
    for scale in (30.0, 60.0):
        p = jax.tree_util.tree_map(lambda x: x, base)
        p["roi"]["output"] = dict(p["roi"]["output"])
        p["roi"]["output"]["cls_score"] = dict(p["roi"]["output"]["cls_score"])
        p = bench.calibrate_heads(p, bg_bias=bias, w_scale=scale)
        out = fn(p, img, sizes)
        n = float(np.asarray(out.valid).sum(-1).mean())
        print(f"bias={bias} scale={scale}: {n:.1f} dets/img")
