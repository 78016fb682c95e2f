"""Per-fusion conv efficiency: join the captured trace (/tmp/itrace) with the
compiled HLO's convolution shapes to print GFLOP, measured ms and TFLOP/s per
conv fusion — pinpoints which convs run below roofline. Run trace_infer.py
first (same shapes/config), then: python dev/conv_mfu.py [/tmp/itrace] [8]
"""
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

_cache = os.path.expanduser("~/.cache/proben_tpu_xla_tpu")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from proben_tpu.models import build_config, init_rcnn, rcnn_inference
import bench as _bench

root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/itrace"
iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8
batch = int(os.environ.get("TRACE_BATCH", "8"))

cfg = build_config(depth=101, input_format="BGR", num_classes=3,
                   compute_dtype="bfloat16")
params = _bench.host_init(lambda k: init_rcnn(k, cfg), jax.random.PRNGKey(0))
rng = np.random.RandomState(0)
sizes = jnp.asarray(np.tile([[800, 1000]], (batch, 1)).astype(np.int32))
img = jnp.asarray(_bench.structured_images(rng, 1, batch, 800, 1024, 3)[0])
fn = jax.jit(lambda p, im, sz: rcnn_inference(p, cfg, im, sz))
hlo = fn.lower(params, img, sizes).compile().as_text()

# map: fusion computation name -> list of conv/dot shapes inside it
# HLO text: "%fused_computation.N { ... convolution(...) ... }" and the
# fusion instruction "%fusion.N = ... fusion(...), kind=kOutput, calls=%fused_computation.N"
comp_of_fusion = {}
for m in re.finditer(r"%?(fusion[.\w]*) = [^\n]*calls=%?([\w.-]+)", hlo):
    comp_of_fusion[m.group(1)] = m.group(2)

# FLOPs per computation: find convolution/dot lines and parse shapes
conv_re = re.compile(
    r"(\w[\w.-]*) = (\w+)\[([\d,]*)\][^\n]*? (convolution|dot)\("
)


def shape_elems(s):
    return int(np.prod([int(x) for x in s.split(",") if x])) if s else 1


# parse each computation block
comp_flops = {}
cur = None
for line in hlo.splitlines():
    m = re.match(r"%?([\w.-]+) \{", line.strip())
    if line.strip().endswith("{") and ("fused_computation" in line or "ENTRY" in line or re.match(r"^%?[\w.-]+ \{", line.strip())):
        mm = re.match(r"^%?([\w.-]+)", line.strip())
        cur = mm.group(1) if mm else None
        continue
    if line.strip() == "}":
        cur = None
        continue
    if cur is None:
        continue
    mm = re.search(r"= \w+\[([\d,]*)\][^\n]*?\b(convolution|dot)\(", line)
    if mm:
        out_elems = shape_elems(mm.group(1))
        # contraction size: for convolution, parse window + input feature dim
        # from the rhs operand shape f.e. bf16[3,3,256,256]; approximate:
        # FLOPs = 2 * out_elems * K (K = contraction length). Get K from the
        # kernel operand shape product / out_features.
        ops = re.findall(r"\w+\[([\d,]*)\]", line)
        k = 0
        if mm.group(2) == "convolution" and len(ops) >= 3:
            kern = [int(x) for x in ops[2].split(",") if x]
            if len(kern) == 4:
                # HWIO: contraction = H*W*I (out features = last)
                k = kern[0] * kern[1] * kern[2]
        elif mm.group(2) == "dot" and len(ops) >= 3:
            lhs = [int(x) for x in ops[1].split(",") if x]
            rhs = [int(x) for x in ops[2].split(",") if x]
            if lhs and rhs:
                k = max(set(lhs) & set(rhs), default=lhs[-1])
        comp_flops.setdefault(cur, 0)
        comp_flops[cur] += 2 * out_elems * k

# trace durations per op name
f = sorted(glob.glob(f"{root}/**/*.trace.json.gz", recursive=True),
           key=os.path.getmtime)[-1]
ev = json.load(gzip.open(f))["traceEvents"]
names = {}
for e in ev:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        names[e["pid"]] = e["args"].get("name", "")
dev_pids = {p for p, n in names.items() if "TPU" in n or "Device" in n}
durs = {}
for e in ev:
    if e.get("ph") == "X" and e.get("pid") in dev_pids:
        durs.setdefault(e["name"], [0.0, e.get("args", {}).get("source", "")])
        durs[e["name"]][0] += e.get("dur", 0)

rows = []
for name, (dur_us, src) in durs.items():
    comp = comp_of_fusion.get(name) or comp_of_fusion.get(name.split("(")[0])
    gf = comp_flops.get(comp, comp_flops.get(name, 0)) / 1e9
    ms = dur_us / 1000 / iters
    if ms < 0.05:
        continue
    tflops = gf / (ms / 1000) / 1000 if ms else 0
    rows.append((ms, gf, tflops, name, src))

rows.sort(reverse=True)
print(f"{'ms':>7} {'GFLOP':>8} {'TFLOP/s':>8} {'MFU%':>5}  name / source")
for ms, gf, tf, name, src in rows[:35]:
    print(f"{ms:7.2f} {gf:8.1f} {tf:8.1f} {100*tf/197:5.1f}  {name}  {src}")
