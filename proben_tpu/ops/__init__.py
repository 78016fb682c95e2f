from .box_transform import SCALE_CLAMP, apply_deltas, get_deltas
from .nms import batched_nms_mask, nms_mask, nms_topk

__all__ = [
    "SCALE_CLAMP",
    "apply_deltas",
    "get_deltas",
    "batched_nms_mask",
    "nms_mask",
    "nms_topk",
]
