import sys, os, time, glob, gzip, json, re
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

_cache = os.path.expanduser("~/.cache/proben_tpu_xla_tpu")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from proben_tpu.ops.roi_align import wholemap_roi_align_grad

B, K, P, C = 8, 512, 7, 256
rng = np.random.RandomState(0)
feats_shapes = [(200, 256), (100, 128), (50, 64), (25, 32)]
feats = [jnp.asarray(rng.rand(B, h, w, C).astype(np.float32), jnp.bfloat16) for h, w in feats_shapes]
sizes = rng.rand(B, K, 2) * 400 + 16
xy = rng.rand(B, K, 2) * 300
boxes = jnp.asarray(np.concatenate([xy, xy + sizes], -1).astype(np.float32))
g = jnp.asarray(rng.rand(B, K, P, P, C).astype(np.float32), jnp.bfloat16)

def run(feats, boxes, g):
    def per_image(f, b, gg):
        return wholemap_roi_align_grad(list(f), b, gg, (4, 8, 16, 32), 7, 0, 2, 224.0, 4, box_chunk=512)
    return jax.vmap(per_image)(list(feats), boxes, g)
fn = jax.jit(run)
out = fn(feats, boxes, g); np.asarray(out[0][0,0,0,0])
os.makedirs("/tmp/mtrace", exist_ok=True)
with jax.profiler.trace("/tmp/mtrace"):
    for _ in range(4):
        out = fn(feats, boxes, g)
    np.asarray(out[0][0,0,0,0])
f = sorted(glob.glob("/tmp/mtrace/**/*.trace.json.gz", recursive=True))[-1]
ev = json.load(gzip.open(f))["traceEvents"]
names = {}
for e in ev:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        names[e["pid"]] = e["args"].get("name", "")
dev_pids = {p for p, n in names.items() if "TPU" in n or "Device" in n}
agg = {}
for e in ev:
    if e.get("ph") == "X" and e.get("pid") in dev_pids:
        agg[e["name"]] = agg.get(e["name"], 0.0) + e.get("dur", 0)
for n, d in sorted(agg.items(), key=lambda kv: -kv[1])[:25]:
    print(f"{d/4000:9.2f} ms  {n[:90]}")
