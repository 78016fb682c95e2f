import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from proben_tpu.ops.roi_align_pallas import multilevel_roi_align_pallas
from proben_tpu.ops.roi_align import multilevel_roi_align

B, K, P, C = 8, 512, 7, 256
rng = np.random.RandomState(0)
shapes = [(200, 256), (100, 128), (50, 64), (25, 32)]
feats = [jnp.asarray(rng.rand(B, h, w, C).astype(np.float32), jnp.bfloat16) for h, w in shapes]
sizes = rng.rand(B, K, 2) * 400 + 16
xy = rng.rand(B, K, 2) * 300
boxes = jnp.asarray(np.concatenate([xy, xy + sizes], -1).astype(np.float32))

fn = jax.jit(lambda f, b: multilevel_roi_align_pallas(list(f), b, (4, 8, 16, 32)))
out = fn(feats, boxes)
ref_fn = jax.jit(lambda f, b: jax.vmap(
    lambda fi, bi: multilevel_roi_align([x for x in fi], bi, [4, 8, 16, 32])
)(list(f), b))
ref = ref_fn(feats, boxes)
d = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32))
rel = d.max() / max(1e-6, np.abs(np.asarray(ref, np.float32)).max())
print("max abs diff:", d.max(), "rel:", rel)
assert rel < 2e-2, "mismatch"

t0 = time.time()
outs = [fn(feats, boxes) for _ in range(16)]
for o in outs: np.asarray(o[0, 0, 0, 0])
dt = (time.time() - t0) / 16
print(f"pallas fwd: {dt*1000:.2f} ms for {B*K} RoIs = {dt/ (B*K) * 1e6:.2f} us/RoI")

import glob, gzip, json, os
os.makedirs("/tmp/ptrace", exist_ok=True)
with jax.profiler.trace("/tmp/ptrace"):
    for _ in range(4):
        out = fn(feats, boxes)
    np.asarray(out[0, 0, 0, 0])
f = sorted(glob.glob("/tmp/ptrace/**/*.trace.json.gz", recursive=True))[-1]
ev = json.load(gzip.open(f))["traceEvents"]
names = {}
for e in ev:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        names[e["pid"]] = e["args"].get("name", "")
dev_pids = {p for p, n in names.items() if "TPU" in n or "Device" in n}
agg = {}
for e in ev:
    if e.get("ph") == "X" and e.get("pid") in dev_pids:
        cat = "pallas" if "custom-call" in str(e.get("args", {}).get("hlo_category", "")) or e["name"].startswith("jit__unnamed") else e["name"]
        agg.setdefault(e["name"], [0, ""])
        agg[e["name"]][0] += e.get("dur", 0)
        if e.get("args"):
            agg[e["name"]][1] = str(e["args"].get("hlo_category", ""))
top = sorted(agg.items(), key=lambda kv: -kv[1][0])[:12]
for n, (d, cat) in top:
    print(f"{d/4000:9.2f} ms  [{cat}] {n[:70]}")
