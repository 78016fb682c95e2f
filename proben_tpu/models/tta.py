"""Test-time augmentation for detection
(reference ``detectron2/modeling/test_time_augmentation.py:70``
GeneralizedRCNNWithTTA: multi-scale + horizontal-flip inference merging).

Host-orchestrated: each augmentation runs the jitted inference program once
(programs are cached per input shape), detections are mapped back to the
original frame and merged with class-batched NMS. This follows the standard
multi-scale-union-then-NMS merge; the reference's extra "rescore merged boxes
with the box head" refinement is intentionally omitted (documented
simplification)."""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from ..fusion.proben_numpy import _plain_batched_nms


class DetectionTTA:
    def __init__(
        self,
        predictor,  # engine.Predictor
        mapper_cfg,  # data.MapperConfig — pad_shape must fit max scale
        scales: Sequence[int] = (400, 500, 600, 700, 800),
        max_size: int = 1333,
        flip: bool = True,
        nms_thresh: float = 0.5,
        topk: int = 100,
    ):
        self.predictor = predictor
        self.mapper_cfg = mapper_cfg
        self.scales = scales
        self.max_size = max_size
        self.flip = flip
        self.nms_thresh = nms_thresh
        self.topk = topk

    def _augmented_batches(self, image: np.ndarray):
        """Yields (batch_dict, undo_flip) per augmentation for one image."""
        import jax.numpy as jnp

        from ..data.transforms import TestResize, hflip_image

        h, w = image.shape[:2]
        ph, pw = self.mapper_cfg.pad_shape
        for short in self.scales:
            resize = TestResize(short, self.max_size)
            resized, (nh, nw) = resize(image)
            for flipped in ((False, True) if self.flip else (False,)):
                img = hflip_image(resized) if flipped else resized
                padded = np.zeros((ph, pw, image.shape[2]), np.float32)
                padded[:nh, :nw] = img
                batch = {
                    "image": jnp.asarray(padded[None]),
                    "image_size": jnp.asarray(np.array([[nh, nw]], np.int32)),
                    "orig_size": np.array([[h, w]], np.int32),
                    "image_id": [0],
                    "num_real": 1,
                }
                yield batch, flipped

    def __call__(self, image: np.ndarray) -> Dict[str, np.ndarray]:
        """image: HWC raw (0..255). Returns merged boxes/scores/classes in the
        original frame."""
        h, w = image.shape[:2]
        all_boxes, all_scores, all_classes = [], [], []
        for batch, flipped in self._augmented_batches(image):
            rec = self.predictor.predict_batch(batch)[0]
            boxes = rec["boxes"]
            if flipped and len(boxes):
                boxes = boxes.copy()
                x1 = boxes[:, 0].copy()
                boxes[:, 0] = w - boxes[:, 2]
                boxes[:, 2] = w - x1
            all_boxes.append(boxes)
            all_scores.append(rec["scores"])
            all_classes.append(rec["classes"])
        boxes = np.concatenate(all_boxes).reshape(-1, 4)
        scores = np.concatenate(all_scores)
        classes = np.concatenate(all_classes).astype(np.int64)
        if len(boxes) == 0:
            return {"boxes": boxes, "scores": scores, "classes": classes}
        keep = _plain_batched_nms(boxes.astype(np.float64), scores, classes, self.nms_thresh)
        keep = keep[: self.topk]
        return {
            "boxes": boxes[keep].astype(np.float32),
            "scores": scores[keep],
            "classes": classes[keep],
        }
