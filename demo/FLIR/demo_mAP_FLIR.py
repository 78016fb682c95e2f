#!/usr/bin/env python
"""Single-model FLIR mAP evaluation (mirrors reference ``demo/FLIR/demo_mAP_FLIR.py``)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from proben_tpu.apps.flir import evaluate_map
from proben_tpu.utils.logger import setup_logger
from proben_tpu.utils.opt import config_parser


def main():
    args = config_parser()
    setup_logger()
    results = evaluate_map(
        method=args.fusion_method,
        dataset_path=args.dataset_path,
        model_path=args.model_path,
        out_folder=args.outfolder,
        dataset_name=args.dataset_name,
    )
    print(results)


if __name__ == "__main__":
    main()
