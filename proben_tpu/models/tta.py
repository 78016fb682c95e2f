"""Test-time augmentation for detection
(reference ``detectron2/modeling/test_time_augmentation.py:70``
GeneralizedRCNNWithTTA: multi-scale + horizontal-flip inference merging).

Host-orchestrated: each augmentation runs the jitted inference program once
(programs are cached per input shape), detections are mapped back to the
original frame and merged with class-batched NMS (the reference's
``_merge_detections`` union + ``fast_rcnn_inference_single_image`` NMS).

``rescore=True`` additionally re-runs the box head on the MERGED boxes in
every augmented frame and averages the class probabilities — the reference's
rerun-heads-on-given-boxes pathway (``_rescale_detected_boxes`` +
``GeneralizedRCNN.inference(..., detected_instances)``,
``test_time_augmentation.py:180-220``; there it feeds the mask head, which is
a declared non-goal here, so the rerun's output for a box-only model is the
rescored class distribution)."""

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
        rescore: bool = False,
    ):
        self.predictor = predictor
        self.mapper_cfg = mapper_cfg
        self.scales = scales
        self.max_size = max_size
        self.flip = flip
        self.nms_thresh = nms_thresh
        self.topk = topk
        self.rescore = rescore

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
                yield batch, flipped, (nh, nw)

    def _rescore_merged(
        self, image: np.ndarray, boxes: np.ndarray, classes: np.ndarray
    ) -> np.ndarray:
        """Average box-head class probabilities of the merged boxes over all
        augmented frames (reference rerun-with-detected_instances pathway)."""
        h, w = image.shape[:2]
        k = len(boxes)
        pad_k = self.topk  # static shape for the jitted given-boxes program
        acc = None
        n_aug = 0
        for batch, flipped, (nh, nw) in self._augmented_batches(image):
            b = boxes * np.array(
                [nw / w, nh / h, nw / w, nh / h], np.float32
            )  # original -> augmented frame (reference _rescale_detected_boxes)
            if flipped:
                x1 = b[:, 0].copy()
                b[:, 0] = nw - b[:, 2]
                b[:, 2] = nw - x1
            bp = np.zeros((pad_k, 4), np.float32)
            bp[:k] = b[:pad_k]
            import jax.numpy as jnp

            probs, _, _ = self.predictor.rescore_boxes(
                batch["image"], jnp.asarray(bp[None])
            )
            probs = np.asarray(probs)[0, :k]
            acc = probs if acc is None else acc + probs
            n_aug += 1
        mean = acc / n_aug
        return mean[np.arange(k), classes].astype(np.float32)

    def __call__(self, image: np.ndarray) -> Dict[str, np.ndarray]:
        """image: HWC raw (0..255). Returns merged boxes/scores/classes in the
        original frame."""
        h, w = image.shape[:2]
        all_boxes, all_scores, all_classes = [], [], []
        for batch, flipped, _ in self._augmented_batches(image):
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
        boxes, scores, classes = (
            boxes[keep].astype(np.float32), scores[keep], classes[keep]
        )
        if self.rescore and len(boxes):
            scores = self._rescore_merged(image, boxes, classes)
            order = np.argsort(-scores, kind="stable")
            boxes, scores, classes = boxes[order], scores[order], classes[order]
        return {"boxes": boxes, "scores": scores, "classes": classes}
