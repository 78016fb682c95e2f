"""Pinpoint the first non-finite training step of the export recipe.

dev/export_bench_ckpt.py (FLIR R101 recipe, synthetic 8-image set) diverges
to NaN at ~iter 20 (= SOLVER.WARMUP_ITERS) at round-5 head; round 3's run
converged 3.6 -> 0.16. This probe runs the same DefaultTrainer step loop,
printing raw (unsmoothed) losses per iter and halting at the first
non-finite step with grad/param diagnostics.
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np

from instant_train import make_synthetic_dataset  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from proben_tpu.config import get_cfg  # noqa: E402
from proben_tpu.data import register_coco_instances  # noqa: E402
from proben_tpu.engine import DefaultTrainer  # noqa: E402
from proben_tpu.utils.events import EventStorage  # noqa: E402

cfg = get_cfg()
cfg.merge_from_file("configs/FLIR-Detection/faster_rcnn_R_101_FLIR.yaml")
cfg.SOLVER.MAX_ITER = 60
cfg.SOLVER.IMS_PER_BATCH = 4
cfg.SOLVER.BASE_LR = 0.002
cfg.SOLVER.WARMUP_ITERS = 20
cfg.SOLVER.CHECKPOINT_PERIOD = 10 ** 9
cfg.TEST.EVAL_PERIOD = 0
cfg.OUTPUT_DIR = tempfile.mkdtemp()
if os.environ.get("EXPORT_ROI"):
    cfg.MODEL.ROI_ALIGN_IMPL = os.environ["EXPORT_ROI"]
if os.environ.get("EXPORT_LR"):
    cfg.SOLVER.BASE_LR = float(os.environ["EXPORT_LR"])

root = tempfile.mkdtemp()
jp, tdir = make_synthetic_dataset(root, n=8)
register_coco_instances("diverge_ds", {}, jp, tdir)
cfg.DATASETS.TRAIN = ("diverge_ds",)
cfg.DATASETS.TEST = ()

trainer = DefaultTrainer(cfg)
with EventStorage(0) as trainer.storage:
    for it in range(60):
        trainer.iter = trainer.storage.iter = it
        trainer.run_step()
        m = {k: float(v) for k, v in trainer._last_metrics.items()}
        line = " ".join(f"{k}={v:.4f}" for k, v in sorted(m.items()))
        print(f"iter {it:3d}: {line}", flush=True)
        if not all(np.isfinite(v) for k, v in m.items() if k != "loss_finite"):
            print(">>> first non-finite step", flush=True)
            leaves, _ = jax.tree_util.tree_flatten(trainer.state.params)
            bad = [
                i for i, l in enumerate(leaves)
                if not bool(jnp.isfinite(l).all())
            ]
            print(f"params non-finite leaves: {len(bad)}/{len(leaves)}",
                  flush=True)
            break
if hasattr(trainer.train_loader, "close"):
    trainer.train_loader.close()
