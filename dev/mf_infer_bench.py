"""Middle-fusion (BGRTTT dual-backbone) inference throughput on the TPU —
fills the docs/PERF.md row the round-2 verdict flagged (fusion models are
ProbEn's selling point; only training had a number). Pipelined measurement
per docs/PERF.md methodology."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

cache_dir = os.path.expanduser("~/.cache/proben_tpu_xla_tpu")
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from proben_tpu.config import get_cfg, model_config_from_cfg
from proben_tpu.models import init_rcnn, rcnn_inference

cfg = get_cfg()
cfg.merge_from_file("/root/repo/configs/FLIR-Detection/faster_rcnn_R_101_FLIR_middle_fusion.yaml")
if os.environ.get("MF_STEM"):
    cfg.MODEL.STEM_IMPL = os.environ["MF_STEM"]
mcfg = model_config_from_cfg(cfg)
params = jax.jit(lambda k: init_rcnn(k, mcfg))(jax.random.PRNGKey(0))
rng = np.random.RandomState(0)
c = {"BGR": 3, "BGRT": 4, "BGRTTT": 6}[cfg.INPUT.FORMAT]
h, w = cfg.INPUT.PAD_SHAPE
for batch in (4, 8):
    sizes = jnp.asarray(np.tile([[h, w - 24]], (batch, 1)).astype(np.int32))
    imgs = [jnp.asarray(rng.rand(batch, h, w, c).astype(np.float32) * 255)
            for _ in range(2)]
    fn = jax.jit(lambda p, im, sz: rcnn_inference(p, mcfg, im, sz))
    np.asarray(fn(params, imgs[0], sizes).scores)
    iters = 12
    t0 = time.time()
    outs = [fn(params, imgs[i % 2], sizes) for i in range(iters)]
    for o in outs:
        np.asarray(o.scores)
    dt = time.time() - t0
    print(f"middle-fusion batch {batch:3d}: {batch*iters/dt:7.2f} img/s "
          f"({dt/iters*1000:6.1f} ms/batch)", flush=True)
