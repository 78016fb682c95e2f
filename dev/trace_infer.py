import sys, os, glob, gzip, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

_cache = os.path.expanduser("~/.cache/proben_tpu_xla_tpu")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from proben_tpu.models import build_config, init_rcnn, rcnn_inference
import bench as _bench

batch = int(os.environ.get("TRACE_BATCH", "8"))
cfg = build_config(depth=101, input_format="BGR", num_classes=3, compute_dtype="bfloat16", stem_impl=os.environ.get("TRACE_STEM", "pallas"))
params = _bench.host_init(lambda k: init_rcnn(k, cfg), jax.random.PRNGKey(0))
# trained-like score realism (same calibration the bench applies)
params = _bench.calibrate_heads(params, bg_bias=6.0)
rng = np.random.RandomState(0)
sizes = jnp.asarray(np.tile([[800, 1000]], (batch, 1)).astype(np.int32))
fn = jax.jit(lambda p, im, sz: rcnn_inference(p, cfg, im, sz))
img = jnp.asarray(_bench.structured_images(rng, 1, batch, 800, 1024, 3)[0])
np.asarray(fn(params, img, sizes).scores)
os.makedirs("/tmp/itrace", exist_ok=True)
with jax.profiler.trace("/tmp/itrace"):
    for _ in range(8):
        out = fn(params, img, sizes)
    np.asarray(out.scores)
f = sorted(glob.glob("/tmp/itrace/**/*.trace.json.gz", recursive=True), key=os.path.getmtime)[-1]
ev = json.load(gzip.open(f))["traceEvents"]
names = {}
for e in ev:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        names[e["pid"]] = e["args"].get("name", "")
dev_pids = {p for p, n in names.items() if "TPU" in n or "Device" in n}
agg, cat, src = {}, {}, {}
for e in ev:
    if e.get("ph") == "X" and e.get("pid") in dev_pids:
        agg[e["name"]] = agg.get(e["name"], 0.0) + e.get("dur", 0)
        if e.get("args"):
            cat[e["name"]] = str(e["args"].get("hlo_category", ""))
            src[e["name"]] = str(e["args"].get("source", ""))
tot = sum(v for k, v in agg.items() if not k.startswith("jit_") and k not in ("0","1","2","3","4","5","6","7"))
print(f"device: {tot/8000:.1f} ms/batch")
for n, d in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
    print(f"{d/8000:8.2f} ms  [{cat.get(n,'')[:22]}] {n[:40]} {src.get(n,'')[-45:]}")
