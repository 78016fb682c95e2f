"""AOT-compile every shipped config's train step + inference on the TPU.

CI runs the CPU interpreter where Mosaic/VMEM constraints don't exist; this
catches compile-only faults like the middle-fusion C=512 VMEM overflow.

Full sweep ~10 min cold. `--changed-configs [REF]` restricts to configs whose
files changed vs the git ref (default HEAD~1) — ~3 min when one config moved.
A model/ops change affects EVERY config; run the full sweep for those.
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
