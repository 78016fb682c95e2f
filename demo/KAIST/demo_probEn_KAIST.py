#!/usr/bin/env python
"""ProbEn multi-model ensemble on KAIST: per-model inference -> fusion ->
LAMR (the BASELINE 3-model KAIST pipeline; extends the reference's single
model demo_LAMR_KAIST with the demo_probEn fusion stage).

Usage:
  python demo/KAIST/demo_probEn_KAIST.py --data_root /path/to/KAIST/test \
      --split test-all-20.txt --annotation KAIST_annotation.json \
      --models thermal_only=t.pth early_fusion=e.pth middle_fusion=m.pth \
      --score_fusion probEn --box_fusion v-avg
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from proben_tpu.apps.flir import load_params
from proben_tpu.apps.kaist import build_kaist_cfg, predict_split, run_kaist_proben
from proben_tpu.utils.logger import setup_logger


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_root", required=True)
    parser.add_argument("--split", required=True)
    parser.add_argument("--annotation", required=True)
    parser.add_argument("--models", nargs="+", required=True,
                        help="method=checkpoint pairs")
    parser.add_argument("--score_fusion", default="probEn",
                        choices=["avg", "max", "probEn"])
    parser.add_argument("--box_fusion", default="v-avg",
                        choices=["avg", "s-avg", "v-avg", "argmax"])
    args = parser.parse_args()
    setup_logger()

    per_model = []
    for spec in args.models:
        method, _, path = spec.partition("=")
        cfg = build_kaist_cfg(method)
        params = load_params(cfg, path)
        per_model.append(
            predict_split(method, args.data_root, args.split, params, cfg=cfg)
        )
    out = run_kaist_proben(
        per_model, args.annotation, args.score_fusion, args.box_fusion
    )
    print(out)


if __name__ == "__main__":
    main()
