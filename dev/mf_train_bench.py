"""Middle-fusion (BGRTTT dual-R101) training throughput at batch 8/4.

VERDICT round-3 item 4: the fusion model needs a train b8 number with the
cost ratio vs single-modality explained. Mirrors bench.bench_train but on
configs/FLIR-Detection/faster_rcnn_R_101_FLIR_middle_fusion.yaml.
Usage: python dev/mf_train_bench.py [batch ...]   (default 8 4)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

import bench as _bench
from proben_tpu.config import get_cfg, model_config_from_cfg, solver_config_from_cfg
from proben_tpu.engine import make_train_step
from proben_tpu.models import init_rcnn
from proben_tpu.models.resnet import freeze_mask
from proben_tpu.structures import GroundTruth

_bench.enable_compile_cache()
cfg = get_cfg()
cfg.merge_from_file("configs/FLIR-Detection/faster_rcnn_R_101_FLIR_middle_fusion.yaml")
mcfg = model_config_from_cfg(cfg)
scfg = solver_config_from_cfg(cfg)
h, w = cfg.INPUT.PAD_SHAPE
g = cfg.INPUT.MAX_GT
c = len(cfg.MODEL.PIXEL_MEAN)
print(f"mf train: pad {h}x{w}, C={c}", file=sys.stderr, flush=True)

params = _bench.retry_transient(_bench.host_init, lambda k: init_rcnn(k, mcfg),
                                jax.random.PRNGKey(0))
mask = jax.tree_util.tree_map(lambda _: True, params)
for key in ("backbone", "backbone_2"):
    if key in params:
        mask[key] = freeze_mask(params[key], cfg.MODEL.BACKBONE.FREEZE_AT)
init_state, step = make_train_step(mcfg, scfg, mask)
step = jax.jit(step)

rng = np.random.RandomState(0)
for batch in [int(b) for b in (sys.argv[1:] or ["8", "4"])]:
    xy = rng.rand(batch, g, 2) * (min(h, w) - 140)
    wh = rng.rand(batch, g, 2) * 100 + 24
    data = {
        "image": jnp.asarray(_bench.structured_images(rng, 1, batch, h, w, c)[0]),
        "image_size": jnp.asarray(np.tile([[h, w - 24]], (batch, 1)).astype(np.int32)),
        "gt": GroundTruth(
            boxes=jnp.asarray(np.concatenate([xy, xy + wh], -1).astype(np.float32)),
            classes=jnp.asarray(rng.randint(
                0, cfg.MODEL.ROI_HEADS.NUM_CLASSES, (batch, g)).astype(np.int32)),
            valid=jnp.asarray(np.ones((batch, g), bool)),
        ),
    }
    state = init_state(params, jax.random.PRNGKey(7))
    state, metrics = _bench.retry_transient(step, state, data)
    np.asarray(metrics["total_loss"])  # compile #1 (init-state placement)
    state, metrics = _bench.retry_transient(step, state, data)
    np.asarray(metrics["total_loss"])  # compile #2 (own output shardings)
    iters = 12
    t0 = time.time()
    for _ in range(iters):
        state, metrics = step(state, data)
    np.asarray(metrics["total_loss"])
    dt = time.time() - t0
    print(f"mf train batch {batch}: {batch*iters/dt:6.2f} img/s/chip "
          f"({dt/iters*1000:6.1f} ms/iter)", flush=True)
