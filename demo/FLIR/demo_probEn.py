#!/usr/bin/env python
"""ProbEn late fusion of saved prediction JSONs + FLIR mAP (mirrors reference
``demo/FLIR/demo_probEn.py``).

Usage:
  python demo/FLIR/demo_probEn.py --dataset_path /path/to/FLIR/val \
      --prediction_path out/ --score_fusion probEn --box_fusion v-avg
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from proben_tpu.apps.flir import run_proben
from proben_tpu.utils.logger import setup_logger
from proben_tpu.utils.opt import config_parser


def main():
    args = config_parser()
    setup_logger()
    results = run_proben(
        dataset_path=args.dataset_path,
        prediction_path=args.prediction_path,
        score_fusion=args.score_fusion,
        box_fusion=args.box_fusion,
        out_folder=args.outfolder,
        dataset_name=args.dataset_name,
    )
    print(results)


if __name__ == "__main__":
    main()
