from .proben_jax import fuse_detections_jax
from .proben_numpy import (
    bayesian_score_fusion,
    cluster_nms,
    fuse_detections,
    fuse_multi_model,
)

__all__ = [
    "fuse_detections_jax",
    "bayesian_score_fusion",
    "cluster_nms",
    "fuse_detections",
    "fuse_multi_model",
]
