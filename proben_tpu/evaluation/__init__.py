from .coco_io import COCODataset
from .cocoeval import COCOEvaluator, EvalParams, bbox_iou_xywh
from .evaluator import inference_on_dataset
from .flir import FLIREvaluator
from .kaist import KAISTEvaluator
from .pascal_voc import PascalVOCDetectionEvaluator
from .testing import print_csv_format, verify_results

__all__ = [
    "COCODataset",
    "COCOEvaluator",
    "EvalParams",
    "FLIREvaluator",
    "KAISTEvaluator",
    "PascalVOCDetectionEvaluator",
    "bbox_iou_xywh",
    "inference_on_dataset",
    "print_csv_format",
    "verify_results",
]
