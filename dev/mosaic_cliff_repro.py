"""Standalone repro of the Mosaic per-instance cliff (docs/PERF.md round 3d).

Phenomenon (as first seen in the production middle-fusion graph): the SAME
Pallas RoIAlign kernel (identical shapes, identical Mosaic module) runs at
~2-3 us/grid-step standalone but ~28 us/step in specific graph positions —
deterministic across recompiles, independent of grid size. The production
model routes around it by construction (models/rcnn.py::_pool_dual).

Run on the TPU: python dev/mosaic_cliff_repro.py [batch=8]

Measured output (v5e, 2026-08, 800x1024 FLIR map shapes, 8192 RoIs):
    single-call graph             : 3.75 us/step
    dual-call graph (input feats) : 3.75 / 3.75 us/step
    dual, conv-produced streams   : 28.04 / 28.03 us/step   <- THE CLIFF
    single, conv-produced         : 3.77 us/step
    dual, conv-produced + barrier : 3.77 / 3.77 us/step
The trigger needs BOTH (a) two kernel instances in one program and (b) each
consuming a conv-produced intermediate directly; an optimization_barrier
between producer and kernel fully restores speed, so the cause is
producer-adjacency in scheduling/fusion context, not operand layout, shapes,
or grid size. If "dual, conv-produced" times within ~2x of the single-call
baseline, the cliff is fixed upstream and _pool_dual can be simplified.
"""
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

_cache = os.path.expanduser("~/.cache/proben_tpu_xla_tpu")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from proben_tpu.ops.roi_align_pallas import multilevel_roi_align_pallas

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
K = 1024
C = 256
STRIDES = (4, 8, 16, 32)
SHAPES = [(200, 256), (100, 128), (50, 64), (25, 32)]  # 800x1024 FLIR levels
ITERS = 8

rng = np.random.RandomState(0)
streams = [
    [jnp.asarray(rng.rand(B, h, w, C).astype(np.float32), jnp.bfloat16)
     for (h, w) in SHAPES]
    for _ in range(2)
]
xy = rng.rand(B, K, 2) * 700
wh = rng.rand(B, K, 2) * 180 + 16
boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1).astype(np.float32))


def pool(feats):
    return multilevel_roi_align_pallas(feats, boxes, STRIDES, 7, 0)


single = jax.jit(lambda f: pool(f))
dual = jax.jit(
    lambda f0, f1: jnp.concatenate([pool(f0), pool(f1)], axis=-1)
)

# third variant: streams PRODUCED in-graph (1x1 conv per level) so the kernel
# operands are XLA intermediates (layout/defining-op context as in the real
# middle-fusion graph) rather than committed program inputs
wmix = jnp.asarray(rng.rand(1, 1, C, C).astype(np.float32) * 0.05, jnp.bfloat16)


def mix(feats):
    return [
        jax.lax.conv_general_dilated(
            f, wmix, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        for f in feats
    ]


dual_produced = jax.jit(
    lambda f0, f1: jnp.concatenate([pool(mix(f0)), pool(mix(f1))], axis=-1)
)

# same but with an optimization barrier between producer and kernel:
# discriminates operand-layout causes (barrier keeps the intermediate, stays
# slow) from fusion/scheduling causes (barrier decouples, goes fast)
single_produced = jax.jit(lambda f: pool(mix(f)))
dual_produced_barrier = jax.jit(
    lambda f0, f1: jnp.concatenate(
        [pool(jax.lax.optimization_barrier(mix(f0))),
         pool(jax.lax.optimization_barrier(mix(f1)))], axis=-1
    )
)

np.asarray(single(streams[0]))  # compile + warmup
np.asarray(dual(streams[0], streams[1]))
np.asarray(dual_produced(streams[0], streams[1]))
np.asarray(single_produced(streams[0]))
np.asarray(dual_produced_barrier(streams[0], streams[1]))


def timed_custom_calls(run):
    trace_dir = "/tmp/cliff_trace"
    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        for _ in range(ITERS):
            out = run()
        np.asarray(out)
    f = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True),
               key=os.path.getmtime)[-1]
    ev = json.load(gzip.open(f))["traceEvents"]
    names = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in names.items() if "TPU" in n or "Device" in n}
    calls = {}
    for e in ev:
        if (
            e.get("ph") == "X"
            and e.get("pid") in dev_pids
            and e.get("args", {}).get("hlo_category") == "custom-call"
        ):
            calls.setdefault(e["name"], [0.0, 0])
            calls[e["name"]][0] += e.get("dur", 0)
            calls[e["name"]][1] += 1
    return calls


n_steps = (B * K + 1) // 2  # r=2 RoIs per grid step at C=256
print(f"batch {B}, {B * K} RoIs, {n_steps} grid steps/call, {ITERS} iters")
for label, run in (
    ("single-call graph", lambda: single(streams[0]).sum()),
    ("dual-call graph  ", lambda: dual(streams[0], streams[1]).sum()),
    ("dual, conv-produced streams",
     lambda: dual_produced(streams[0], streams[1]).sum()),
    ("single, conv-produced",
     lambda: single_produced(streams[0]).sum()),
    ("dual, conv-produced + barrier",
     lambda: dual_produced_barrier(streams[0], streams[1]).sum()),
):
    calls = timed_custom_calls(run)
    rows = [
        f"{name}: {dur / cnt / 1000:.2f} ms/iter = "
        f"{dur / cnt / n_steps:.2f} us/step"
        for name, (dur, cnt) in sorted(calls.items())
    ]
    print(f"{label}:")
    for r in rows:
        print(f"    {r}")
