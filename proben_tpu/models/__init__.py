from .fast_rcnn import FastRCNNConfig
from .rcnn import (
    ModelConfig,
    build_config,
    init_rcnn,
    postprocess_boxes,
    rcnn_inference,
    rcnn_inference_given_boxes,
    rcnn_train_losses,
)
from .roi_heads import ROIHeadsConfig
from .rpn import RPNConfig

__all__ = [
    "FastRCNNConfig",
    "ModelConfig",
    "ROIHeadsConfig",
    "RPNConfig",
    "build_config",
    "init_rcnn",
    "postprocess_boxes",
    "rcnn_inference",
    "rcnn_inference_given_boxes",
    "rcnn_train_losses",
]
