"""Evaluator dispatch by dataset metadata (the reference's per-project
``build_evaluator`` pattern, e.g. `tools/train_net.py:62-95`): pick the
dataset's evaluator from ``MetadataCatalog.get(name).evaluator_type``.

Every returned evaluator speaks the ``reset/process(image_id, boxes_xyxy,
scores, classes)/evaluate`` protocol of ``inference_on_dataset``.
"""

from __future__ import annotations

from typing import Optional

from ..structures.boxes import BoxMode

__all__ = ["build_evaluator"]


def _voc_evaluator(name):
    from ..data import DatasetCatalog, MetadataCatalog
    from .pascal_voc import PascalVOCDetectionEvaluator

    meta = MetadataCatalog.get(name)
    ev = PascalVOCDetectionEvaluator(
        meta.thing_classes, use_07_metric=meta.get("year") == 2007
    )
    for d in DatasetCatalog.get(name):
        boxes, classes, difficult = [], [], []
        for ann in d.get("annotations", []):
            b = list(ann["bbox"])
            if ann.get("bbox_mode", BoxMode.XYXY_ABS) == BoxMode.XYWH_ABS:
                b = [b[0], b[1], b[0] + b[2], b[1] + b[3]]
            boxes.append(b)
            classes.append(ann["category_id"])
            difficult.append(ann.get("difficult", 0))
        if boxes:
            ev.add_ground_truth(d["image_id"], boxes, classes, difficult)
    return ev


def build_evaluator(dataset_name: str, output_dir: Optional[str] = None):
    from ..data import MetadataCatalog

    meta = MetadataCatalog.get(dataset_name)
    etype = meta.get("evaluator_type", "flir")
    if etype == "flir":
        from .flir import FLIREvaluator

        return FLIREvaluator(meta.json_file, output_dir=output_dir)
    if etype == "coco":
        from .coco_io import COCODataset
        from .flir import FLIREvaluator

        # generic COCO bbox evaluation: the FLIR evaluator core without the
        # FLIR class filter/remap (valid_classes are CONTIGUOUS model class
        # indices — process() unmaps them to dataset ids afterwards)
        coco = COCODataset(meta.json_file)
        return FLIREvaluator(
            coco,
            output_dir=output_dir,
            valid_classes=range(len(coco.cats)),
            class_remap={},
        )
    if etype == "lvis":
        from .lvis import LVISEvaluator

        return LVISEvaluator(meta.json_file, output_dir=output_dir)
    if etype == "pascal_voc":
        return _voc_evaluator(dataset_name)
    if etype == "kaist":
        from .kaist import KAISTEvaluator

        return KAISTEvaluator(meta.json_file)
    raise ValueError(
        f"no evaluator registered for evaluator_type={etype!r} "
        f"(dataset {dataset_name!r}); pass one explicitly"
    )
