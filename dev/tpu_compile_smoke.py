"""AOT-compile every shipped config's train step + inference on the TPU.

CI runs the CPU interpreter where Mosaic/VMEM constraints don't exist; this
catches compile-only faults like the middle-fusion C=512 VMEM overflow.

Full sweep ~10 min cold. `--changed-configs [REF]` restricts to configs whose
files changed vs the git ref (default HEAD~1) — ~3 min when one config moved.
A model/ops change affects EVERY config; run the full sweep for those.

`--bench-shapes` instead compiles AND EXECUTES one pipelined run of the b8
flagship and middle-fusion inference programs at the exact bench shapes
(800x1024 bf16 R101), asserting per-batch wall-time bounds. This is the
regression gate for the Mosaic producer-adjacency cliff (docs/PERF.md): the
cliff multiplies pooling time ~8x (13 -> 111 ms/batch measured), so a
refactor that silently drops the `_pool_dual` batch dispatch or the feats
optimization_barrier fails the bound. ~3 min warm-cache; run it whenever
models/ or ops/ changed (CLAUDE.md round-close item 3).
"""
import glob
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def changed_config_paths(ref):
    out = subprocess.run(
        ["git", "diff", "--name-only", ref, "--", "configs/"],
        capture_output=True, text=True, check=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ).stdout.split()
    changed = set(out)
    # a changed _BASE_ dirties every config that inherits from it
    if any("Base-" in p for p in changed):
        return None  # full sweep
    return changed


def bench_shapes_gate():
    """Execute one pipelined run of the two bench programs with wall-time
    bounds. Bounds are ~1.5x the round-4/5 measured ms/batch — loose enough
    for backend noise, far below the ~8x cliff mode they exist to catch."""
    import jax
    import jax.numpy as jnp

    from proben_tpu.models import build_config, init_rcnn, rcnn_inference

    # repo root is on sys.path (module top). Reuse bench.py's helpers AND its
    # persistent-cache setup so the gate's programs are the exact cache keys
    # the driver's bench run will hit.
    from bench import enable_compile_cache, host_init, structured_images

    enable_compile_cache()

    batch, iters = 8, 8
    rng = np.random.RandomState(0)
    failures = []
    # (name, input_format, ms/batch bound): flagship measured ~53 ms/batch,
    # middle fusion ~114; the pooling cliff alone adds ~90+ ms.
    for name, fmt, bound_ms in (("flagship_b8", "BGR", 90.0),
                                ("middle_fusion_b8", "BGRTTT", 180.0)):
        cfg = build_config(depth=101, input_format=fmt, num_classes=3,
                           compute_dtype="bfloat16")
        params = host_init(lambda k: init_rcnn(k, cfg), jax.random.PRNGKey(0))
        sizes = jnp.asarray(np.tile([[800, 1000]], (batch, 1)).astype(np.int32))
        base = structured_images(rng, 2, batch, 800, 1024, 3)
        if fmt == "BGRTTT":
            imgs = [jnp.asarray(np.concatenate([a, a[..., ::-1]], -1)) for a in base]
        else:
            imgs = [jnp.asarray(a) for a in base]
        fn = jax.jit(lambda p, im, sz: rcnn_inference(p, cfg, im, sz))
        t0 = time.time()
        np.asarray(fn(params, imgs[0], sizes).scores)  # compile + warm
        print(f"     {name}: compile+warm {time.time()-t0:.0f}s", flush=True)
        t0 = time.time()
        outs = [fn(params, imgs[i % 2], sizes) for i in range(iters)]
        for o in outs:
            np.asarray(o.scores)
        ms = (time.time() - t0) * 1000 / iters
        ok = ms <= bound_ms
        print(f"{'OK  ' if ok else 'FAIL'} {name}: {ms:.1f} ms/batch "
              f"(bound {bound_ms:.0f})", flush=True)
        if not ok:
            failures.append((name, ms, bound_ms))
    print(f"{len(failures)} failures")
    sys.exit(1 if failures else 0)


def main():
    import jax
    import jax.numpy as jnp

    from proben_tpu.config import (
        get_cfg,
        model_config_from_cfg,
        solver_config_from_cfg,
    )
    from proben_tpu.engine import make_train_step
    from proben_tpu.models import init_rcnn, rcnn_inference
    from proben_tpu.structures import GroundTruth

    if "--bench-shapes" in sys.argv:
        bench_shapes_gate()
        return

    only = None
    if "--changed-configs" in sys.argv:
        i = sys.argv.index("--changed-configs")
        ref = sys.argv[i + 1] if len(sys.argv) > i + 1 else "HEAD~1"
        only = changed_config_paths(ref)
        if only is not None and not only:
            print(f"no configs changed vs {ref}; nothing to smoke")
            return

    failures = []
    for path in sorted(glob.glob("configs/**/*.yaml", recursive=True)):
        name = os.path.relpath(path)
        if "Base-" in name:
            continue
        if only is not None and name not in only:
            continue
        cfg = get_cfg()
        cfg.merge_from_file(path)
        if cfg.MODEL.META_ARCHITECTURE != "GeneralizedRCNN":
            continue
        mcfg = model_config_from_cfg(cfg)
        scfg = solver_config_from_cfg(cfg)
        batch = 2
        h, w = cfg.INPUT.PAD_SHAPE
        c = {"BGR": 3, "BGRT": 4, "BGRTTT": 6}[cfg.INPUT.FORMAT]
        g = cfg.INPUT.MAX_GT
        rng = np.random.RandomState(0)
        xy = rng.rand(batch, g, 2) * (min(h, w) - 60)
        wh = rng.rand(batch, g, 2) * 40 + 10
        data = {
            "image": jnp.zeros((batch, h, w, c), jnp.float32),
            "image_size": jnp.asarray(np.tile([[h, w]], (batch, 1)).astype(np.int32)),
            "gt": GroundTruth(
                boxes=jnp.asarray(np.concatenate([xy, xy + wh], -1).astype(np.float32)),
                classes=jnp.zeros((batch, g), jnp.int32),
                valid=jnp.ones((batch, g), bool),
            ),
        }
        for mode in ("train", "infer"):
            t0 = time.time()
            try:
                if mode == "train":
                    init_state, step = make_train_step(mcfg, scfg)
                    state = init_state(
                        init_rcnn(jax.random.PRNGKey(0), mcfg), jax.random.PRNGKey(1)
                    )
                    jax.jit(step).lower(state, data).compile()
                else:
                    params = init_rcnn(jax.random.PRNGKey(0), mcfg)
                    jax.jit(
                        lambda p, im, sz: rcnn_inference(p, mcfg, im, sz)
                    ).lower(params, data["image"], data["image_size"]).compile()
                print(f"OK   {name} [{mode}] ({time.time()-t0:.0f}s)", flush=True)
            except Exception as e:
                failures.append((name, mode, str(e)[:200]))
                print(f"FAIL {name} [{mode}]: {str(e)[:200]}", flush=True)
    print(f"{len(failures)} failures")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
