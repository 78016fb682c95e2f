#!/usr/bin/env python
"""Overlay predictions on thermal and RGB images (mirrors reference
``demo/FLIR/demo_draw_FLIR.py``)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import cv2
import numpy as np

from proben_tpu.apps.flir import build_flir_cfg, load_params, register_flir
from proben_tpu.config import mapper_config_from_cfg, model_config_from_cfg
from proben_tpu.data import DatasetCatalog, DatasetMapper, MetadataCatalog, build_test_loader
from proben_tpu.data.detection_utils import derive_rgb_path
from proben_tpu.engine import Predictor
from proben_tpu.utils.logger import setup_logger
from proben_tpu.utils.visualizer import Visualizer


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_path", required=True)
    parser.add_argument("--fusion_method", default="thermal_only",
                        choices=["rgb_only", "thermal_only", "early_fusion", "middle_fusion"])
    parser.add_argument("--model_path", default="")
    parser.add_argument("--outfolder", default="out_draw")
    parser.add_argument("--max_images", type=int, default=20)
    args = parser.parse_args()
    setup_logger()

    cfg = build_flir_cfg(args.fusion_method)
    register_flir("FLIR_draw", args.dataset_path)
    dicts = DatasetCatalog.get("FLIR_draw")[: args.max_images]
    meta = MetadataCatalog.get("FLIR_draw")
    params = load_params(cfg, args.model_path)
    predictor = Predictor(params, model_config_from_cfg(cfg))
    mapper = DatasetMapper(mapper_config_from_cfg(cfg), is_train=False)

    os.makedirs(args.outfolder, exist_ok=True)
    for batch in build_test_loader(dicts, mapper, batch_size=1):
        rec = predictor.predict_batch(batch)[0]
        thermal_path = batch["file_name"][0]
        thermal = cv2.imread(thermal_path)
        Visualizer(thermal, meta).draw_instance_predictions(rec).save(
            os.path.join(args.outfolder, "thermal_" + os.path.basename(thermal_path))
        )
        try:
            rgb = cv2.imread(derive_rgb_path(thermal_path))
            if rgb is not None:
                h, w = thermal.shape[:2]
                rgb = cv2.resize(rgb, (w, h))
                Visualizer(rgb, meta).draw_instance_predictions(rec).save(
                    os.path.join(args.outfolder, "rgb_" + os.path.basename(thermal_path))
                )
        except ValueError:
            pass
    print(f"wrote visualizations to {args.outfolder}")


if __name__ == "__main__":
    main()
