"""Aggregate an already-captured jax.profiler trace (trace_infer/trace_train)
by HLO category and by source line — the full device-time accounting the
top-40 list in trace_infer.py truncates. Usage:

    python dev/trace_agg.py [/tmp/itrace] [n_iters=8]
"""
import glob
import gzip
import json
import os
import sys

root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/itrace"
iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8

f = sorted(glob.glob(f"{root}/**/*.trace.json.gz", recursive=True), key=os.path.getmtime)[-1]
ev = json.load(gzip.open(f))["traceEvents"]
names = {}
for e in ev:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        names[e["pid"]] = e["args"].get("name", "")
dev_pids = {p for p, n in names.items() if "TPU" in n or "Device" in n}

agg = {}  # name -> [dur, cat, src, count]
for e in ev:
    if e.get("ph") == "X" and e.get("pid") in dev_pids:
        n = e["name"]
        if n.startswith("jit_") or n in tuple(str(i) for i in range(10)):
            continue
        a = agg.setdefault(n, [0.0, "", "", 0])
        a[0] += e.get("dur", 0)
        a[3] += 1
        if e.get("args"):
            a[1] = str(e["args"].get("hlo_category", ""))
            a[2] = str(e["args"].get("source", ""))

tot = sum(v[0] for v in agg.values())
print(f"total device: {tot/1000/iters:.2f} ms/iter over {len(agg)} distinct ops")

by_cat = {}
for n, (d, c, s, k) in agg.items():
    by_cat[c] = by_cat.get(c, 0.0) + d
print("\n== by category ==")
for c, d in sorted(by_cat.items(), key=lambda kv: -kv[1]):
    print(f"{d/1000/iters:8.2f} ms  {c}")

by_src = {}
for n, (d, c, s, k) in agg.items():
    key = (c, s)
    by_src[key] = by_src.get(key, 0.0) + d
print("\n== by (category, source) top 30 ==")
for (c, s), d in sorted(by_src.items(), key=lambda kv: -kv[1])[:30]:
    print(f"{d/1000/iters:8.2f} ms  [{c[:24]}] {s[-60:]}")

print("\n== ops 0.05-0.5 ms (the tail), top 40 ==")
small = [(n, v) for n, v in agg.items() if 0.05 * 1000 * iters <= v[0] < 0.5 * 1000 * iters]
small.sort(key=lambda kv: -kv[1][0])
for n, (d, c, s, k) in small[:40]:
    print(f"{d/1000/iters:8.3f} ms x{k:4d} [{c[:20]}] {n[:44]} {s[-44:]}")
tail_sum = sum(v[0] for _, v in small)
print(f"tail(0.05-0.5ms) total: {tail_sum/1000/iters:.2f} ms; "
      f"sub-0.05ms total: {(tot - sum(v[0] for v in agg.values() if v[0] >= 0.5*1000*iters) - tail_sum)/1000/iters:.2f} ms")
