#!/usr/bin/env python
"""Model-in-the-loop TRAINING accuracy regression.

Trains a tiny R50-FPN from scratch to overfit the synthetic set, then runs
REAL inference with the trained weights through the full model and asserts
``TEST.EXPECTED_RESULTS`` via ``verify_results`` — so a silent model
regression (e.g. a broken delta decode) fails this gate, unlike round 1's
ground-truth-echo flow. Mirrors the reference's training accuracy checks
(`dev/run_inference_tests.sh` + `configs/quick_schedules/*acc_test.yaml`,
`detectron2/evaluation/testing.py:27`).

Writes its final checkpoint to OUTPUT_DIR so dev/model_inference_acc_test.py
can reload it in a fresh process and pin the same AP from disk.
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-file", required=True)
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = parser.parse_args()

    from dev.instant_train import make_synthetic_dataset

    from proben_tpu.config import get_cfg
    from proben_tpu.data import register_coco_instances
    from proben_tpu.engine import DefaultTrainer
    from proben_tpu.evaluation import verify_results

    cfg = get_cfg()
    cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)

    root = tempfile.mkdtemp()
    jp, tdir = make_synthetic_dataset(root)
    register_coco_instances("training_acc_ds", {}, jp, tdir)
    cfg.DATASETS.TRAIN = ("training_acc_ds",)
    cfg.DATASETS.TEST = ("training_acc_ds",)

    trainer = DefaultTrainer(cfg)
    trainer.train()
    trainer.save_checkpoint()

    results = DefaultTrainer.test(cfg, trainer.params)
    print("results:", {k: round(v, 3) for k, v in results.get("bbox", {}).items()})
    ok = verify_results(cfg, results)
    print(f"{args.config_file}: {'OK' if ok else 'FAILED'}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
