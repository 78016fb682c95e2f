from .box_transform import SCALE_CLAMP, apply_deltas, get_deltas
from .matcher import match
from .nms import batched_nms_mask, nms_mask, nms_topk
from .roi_align import (
    multilevel_roi_align,
    roi_level_assignment,
    single_level_roi_align,
)
from .sampling import sample_topk_indices, subsample_labels
from .topk import topk

__all__ = [
    "SCALE_CLAMP",
    "apply_deltas",
    "get_deltas",
    "match",
    "batched_nms_mask",
    "nms_mask",
    "nms_topk",
    "multilevel_roi_align",
    "roi_level_assignment",
    "single_level_roi_align",
    "sample_topk_indices",
    "topk",
    "subsample_labels",
]
