#!/usr/bin/env python
"""Save per-image predictions for one fusion method (mirrors reference
``demo/FLIR/demo_FLIR_save_predictions.py``; same output JSON schema).

Usage:
  python demo/FLIR/demo_FLIR_save_predictions.py \
      --dataset_path /path/to/FLIR/val --fusion_method thermal_only \
      --model_path trained_models/thermal_only.pth --outfolder out/
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from proben_tpu.apps.flir import save_predictions
from proben_tpu.utils.logger import setup_logger
from proben_tpu.utils.opt import config_parser


def main():
    args = config_parser()
    setup_logger()
    save_predictions(
        method=args.fusion_method,
        dataset_path=args.dataset_path,
        model_path=args.model_path,
        out_folder=args.outfolder,
        dataset_name=args.dataset_name,
    )


if __name__ == "__main__":
    main()
