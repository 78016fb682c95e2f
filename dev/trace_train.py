import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import glob, gzip, json, os, time
import numpy as np
import jax, jax.numpy as jnp

_cache = os.path.expanduser("~/.cache/proben_tpu_xla_tpu")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from proben_tpu.config import get_cfg, model_config_from_cfg, solver_config_from_cfg
from proben_tpu.engine import make_train_step
from proben_tpu.models import init_rcnn
from proben_tpu.structures import GroundTruth

cfg = get_cfg()
cfg.merge_from_file("/root/repo/configs/FLIR-Detection/faster_rcnn_R_101_FLIR.yaml")
mcfg = model_config_from_cfg(cfg)
scfg = solver_config_from_cfg(cfg)
batch = 8
h, w = cfg.INPUT.PAD_SHAPE
c = {"BGR": 3, "BGRT": 4, "BGRTTT": 6}[cfg.INPUT.FORMAT]
g = cfg.INPUT.MAX_GT
rng = np.random.RandomState(0)
xy = rng.rand(batch, g, 2) * (min(h, w) - 100)
wh = rng.rand(batch, g, 2) * 80 + 20
data = {
    "image": jnp.asarray(rng.rand(batch, h, w, c).astype(np.float32) * 255),
    "image_size": jnp.asarray(np.tile([[h, w - 24]], (batch, 1)).astype(np.int32)),
    "gt": GroundTruth(
        boxes=jnp.asarray(np.concatenate([xy, xy + wh], -1).astype(np.float32)),
        classes=jnp.asarray(rng.randint(0, cfg.MODEL.ROI_HEADS.NUM_CLASSES, (batch, g)).astype(np.int32)),
        valid=jnp.asarray(np.ones((batch, g), bool)),
    ),
}
# same FREEZE_AT mask DefaultTrainer/bench train with (frozen bwd is DCE'd)
from proben_tpu.models.resnet import freeze_mask

params = jax.jit(lambda k: init_rcnn(k, mcfg))(jax.random.PRNGKey(0))
mask = jax.tree_util.tree_map(lambda _: True, params)
mask["backbone"] = freeze_mask(params["backbone"], cfg.MODEL.BACKBONE.FREEZE_AT)
init_state, step = make_train_step(mcfg, scfg, mask)
import jax as _j
state = init_state(params, jax.random.PRNGKey(7))
step = _j.jit(step)
# two warmups: the second call compiles a SECOND program (the step's output
# placement differs from the eager init state's) — see bench.py bench_train
state, metrics = step(state, data)
np.asarray(metrics["total_loss"])
state, metrics = step(state, data)
np.asarray(metrics["total_loss"])
# pipelined throughput: dispatch N dependent steps, sync once at the end
N = 20
t0 = time.time()
for _ in range(N):
    state, metrics = step(state, data)
np.asarray(metrics["total_loss"])
dt = (time.time() - t0) / N
print(f"train: {dt:.3f} s/iter, {batch / dt:.2f} img/s")
os.makedirs("/tmp/ttrace", exist_ok=True)
with jax.profiler.trace("/tmp/ttrace"):
    for i in range(4):
        state, metrics = step(state, data)
    np.asarray(metrics["total_loss"])
f = sorted(glob.glob("/tmp/ttrace/**/*.trace.json.gz", recursive=True))[-1]
ev = json.load(gzip.open(f))["traceEvents"]
names = {}
for e in ev:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        names[e["pid"]] = e["args"].get("name", "")
dev_pids = {p for p, n in names.items() if "TPU" in n or "Device" in n or "/device" in n.lower()}
agg = {}
for e in ev:
    if e.get("ph") == "X" and e.get("pid") in dev_pids:
        agg[e["name"]] = agg.get(e["name"], 0.0) + e.get("dur", 0)
top = sorted(agg.items(), key=lambda kv: -kv[1])[:45]
tot = sum(agg.values())
print(f"total device us over 4 steps: {tot:.0f} ({tot/4/1000:.1f} ms/step)")
for n, d in top:
    print(f"{d/4/1000:9.2f} ms/step  {n[:110]}")
