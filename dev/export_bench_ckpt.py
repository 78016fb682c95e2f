#!/usr/bin/env python
"""Train the FLAGSHIP bench model (R101-FPN FLIR config) briefly on the
synthetic set and save a BARE params pytree for ``bench.py --trained-ckpt``
— closes the 'bench measures calibrated random-init weights' realism caveat
(round-2 verdict item 7): trained score distributions exercise the score
threshold / NMS / top-k path with real sparsity patterns.

Usage:
    python dev/export_bench_ckpt.py --out /tmp/bench_ckpt [--iters 150]
    python bench.py --trained-ckpt /tmp/bench_ckpt
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", required=True)
    parser.add_argument("--iters", type=int, default=150)
    parser.add_argument("--batch", type=int, default=8)
    args = parser.parse_args()

    from dev.instant_train import make_synthetic_dataset

    from proben_tpu.checkpoint import save_pytree
    from proben_tpu.config import get_cfg
    from proben_tpu.data import register_coco_instances
    from proben_tpu.engine import DefaultTrainer

    cfg = get_cfg()
    cfg.merge_from_file("configs/FLIR-Detection/faster_rcnn_R_101_FLIR.yaml")
    cfg.SOLVER.MAX_ITER = args.iters
    cfg.SOLVER.IMS_PER_BATCH = args.batch
    # 0.001: the random-init-on-synthetic-data recipe is marginally stable
    # at 0.002 (round 5: loss_cls oscillates from iter 0 and explodes by
    # ~iter 25 — dev/diverge_probe.py; the real FLIR recipe finetunes
    # PRETRAINED weights). 0.001 converges smoothly (0.42 @ iter 60).
    cfg.SOLVER.BASE_LR = 0.001
    cfg.SOLVER.WARMUP_ITERS = 20
    cfg.SOLVER.CHECKPOINT_PERIOD = 10 ** 9  # no periodic saves
    cfg.TEST.EVAL_PERIOD = 0
    cfg.OUTPUT_DIR = tempfile.mkdtemp()
    if os.environ.get("EXPORT_STEM"):
        cfg.MODEL.STEM_IMPL = os.environ["EXPORT_STEM"]
    if os.environ.get("EXPORT_ROI"):
        cfg.MODEL.ROI_ALIGN_IMPL = os.environ["EXPORT_ROI"]

    root = tempfile.mkdtemp()
    jp, tdir = make_synthetic_dataset(root, n=8)
    register_coco_instances("bench_ckpt_ds", {}, jp, tdir)
    cfg.DATASETS.TRAIN = ("bench_ckpt_ds",)
    cfg.DATASETS.TEST = ()

    trainer = DefaultTrainer(cfg)
    trainer.train()
    save_pytree(args.out, trainer.params)
    print(f"saved trained params to {args.out}")


if __name__ == "__main__":
    main()
