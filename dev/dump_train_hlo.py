import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from proben_tpu.config import get_cfg, model_config_from_cfg, solver_config_from_cfg
from proben_tpu.engine import make_train_step
from proben_tpu.models import init_rcnn
from proben_tpu.structures import GroundTruth

cfg = get_cfg()
cfg.merge_from_file("/root/repo/configs/FLIR-Detection/faster_rcnn_R_101_FLIR.yaml")
mcfg = model_config_from_cfg(cfg); scfg = solver_config_from_cfg(cfg)
batch = 8
h, w = cfg.INPUT.PAD_SHAPE
g = cfg.INPUT.MAX_GT
rng = np.random.RandomState(0)
xy = rng.rand(batch, g, 2) * 300; wh = rng.rand(batch, g, 2) * 80 + 20
data = {
    "image": jnp.zeros((batch, h, w, 3), jnp.float32),
    "image_size": jnp.asarray(np.tile([[h, w - 24]], (batch, 1)).astype(np.int32)),
    "gt": GroundTruth(
        boxes=jnp.asarray(np.concatenate([xy, xy + wh], -1).astype(np.float32)),
        classes=jnp.zeros((batch, g), jnp.int32),
        valid=jnp.ones((batch, g), bool),
    ),
}
init_state, step = make_train_step(mcfg, scfg)
state = init_state(init_rcnn(jax.random.PRNGKey(0), mcfg), jax.random.PRNGKey(7))
comp = jax.jit(step).lower(state, data).compile()
txt = comp.as_text()
open("/tmp/train_hlo.txt", "w").write(txt)
print("bytes:", len(txt))
