#!/usr/bin/env python
"""Model-in-the-loop INFERENCE accuracy regression.

Loads the checkpoint written by dev/training_acc_test.py from OUTPUT_DIR in a
FRESH process and pins its AP through the real model + evaluator — the
reference's ``*_inference_acc_test.yaml`` semantics (load weights, eval,
``verify_results``), with the trained tiny model standing in for zoo weights.
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
    register_coco_instances("inference_acc_ds", {}, jp, tdir)
    cfg.DATASETS.TRAIN = ("inference_acc_ds",)
    cfg.DATASETS.TEST = ("inference_acc_ds",)

    trainer = DefaultTrainer(cfg)  # fresh random init
    trainer.resume_or_load(resume=True)  # restore from OUTPUT_DIR
    assert trainer.start_iter > 0, (
        f"no checkpoint found in {cfg.OUTPUT_DIR} — run dev/training_acc_test.py first"
    )

    results = DefaultTrainer.test(cfg, trainer.params)
    print("results:", {k: round(v, 3) for k, v in results.get("bbox", {}).items()})
    ok = verify_results(cfg, results)
    print(f"{args.config_file}: {'OK' if ok else 'FAILED'}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
