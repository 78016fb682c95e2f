#!/usr/bin/env python
"""KAIST inference + LAMR evaluation (mirrors reference
``demo/KAIST/demo_LAMR_KAIST.py`` — including the det-txt and variance-npz
outputs; the LAMR evaluator the reference lacks is built in
``proben_tpu/evaluation/kaist.py``).

Usage:
  python demo/KAIST/demo_LAMR_KAIST.py --data_root /path/to/KAIST/test \
      --split /path/to/test-all-20.txt --annotation KAIST_annotation.json \
      --fusion_method thermal_only --model_path model.pth --outfolder out/
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from proben_tpu.apps.kaist import (
    build_kaist_cfg,
    evaluate_lamr,
    predict_split,
    results_to_lamr_dets,
)
from proben_tpu.apps.flir import load_params
from proben_tpu.evaluation.kaist import KAISTEvaluator
from proben_tpu.utils.logger import setup_logger


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_root", required=True)
    parser.add_argument("--split", required=True)
    parser.add_argument("--annotation", required=True)
    parser.add_argument(
        "--fusion_method",
        default="thermal_only",
        choices=["rgb_only", "thermal_only", "early_fusion", "middle_fusion"],
    )
    parser.add_argument("--model_path", default="")
    parser.add_argument("--outfolder", default="out")
    args = parser.parse_args()
    setup_logger()

    cfg = build_kaist_cfg(args.fusion_method)
    params = load_params(cfg, args.model_path)
    os.makedirs(args.outfolder, exist_ok=True)
    out_txt = os.path.join(args.outfolder, f"KAIST_{args.fusion_method}_dets.txt")
    var_npz = os.path.join(args.outfolder, f"KAIST_{args.fusion_method}_vars.npz")
    results = predict_split(
        args.fusion_method, args.data_root, args.split, params, cfg=cfg,
        out_txt=out_txt, var_npz=var_npz,
    )
    evaluator = KAISTEvaluator(args.annotation)
    dets = results_to_lamr_dets(results, evaluator.image_ids)
    out = evaluator.evaluate_all_conditions(dets)
    print(out)


if __name__ == "__main__":
    main()
