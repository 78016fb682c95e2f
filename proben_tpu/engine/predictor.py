"""Predictor: jit-compiled batched inference with host-side postprocess
(reference ``engine/defaults.py:133`` DefaultPredictor).

Differences from the reference: batch-N instead of single-image, one compiled
XLA program reused across the dataset, rescale-to-original done on device.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.rcnn import ModelConfig, rcnn_inference, rcnn_inference_given_boxes
from ..structures.detections import Detections

Array = jnp.ndarray


class Predictor:
    def __init__(self, params, model_cfg: ModelConfig):
        self.params = params
        self.cfg = model_cfg

        def infer(params, images, image_sizes, orig_sizes):
            det = rcnn_inference(params, model_cfg, images, image_sizes)
            # rescale boxes resized-frame -> original-frame on device
            in_hw = image_sizes.astype(jnp.float32)
            out_hw = orig_sizes.astype(jnp.float32)
            scale = jnp.stack(
                [
                    out_hw[:, 1] / in_hw[:, 1],
                    out_hw[:, 0] / in_hw[:, 0],
                    out_hw[:, 1] / in_hw[:, 1],
                    out_hw[:, 0] / in_hw[:, 0],
                ],
                axis=-1,
            )  # (N, 4)
            boxes = det.boxes * scale[:, None, :]
            x1 = jnp.clip(boxes[..., 0], 0, out_hw[:, None, 1])
            y1 = jnp.clip(boxes[..., 1], 0, out_hw[:, None, 0])
            x2 = jnp.clip(boxes[..., 2], 0, out_hw[:, None, 1])
            y2 = jnp.clip(boxes[..., 3], 0, out_hw[:, None, 0])
            det.boxes = jnp.stack([x1, y1, x2, y2], axis=-1)
            return det

        self._infer = jax.jit(infer)
        self._rescore = jax.jit(
            lambda p, im, bx: rcnn_inference_given_boxes(p, model_cfg, im, bx)
        )

    def rescore_boxes(self, images: Array, boxes: Array):
        """Box-head scores for GIVEN boxes in the model-input frame
        (reference ``GeneralizedRCNN.inference(..., detected_instances)``).
        images (N, H, W, C) raw; boxes (N, K, 4). Returns (probs, logits,
        variance) — probs (N, K, C+1) incl. background last."""
        return self._rescore(self.params, images, boxes)

    def predict_batch(self, batch: Dict) -> List[Dict[str, np.ndarray]]:
        """batch from data loaders. Returns per-image dicts of numpy arrays
        (boxes in ORIGINAL image frame, trimmed to valid detections)."""
        det: Detections = self._infer(
            self.params,
            batch["image"],
            batch["image_size"],
            jnp.asarray(batch["orig_size"]),
        )
        det = det.to_numpy()
        out = []
        n = batch.get("num_real", det.boxes.shape[0])
        for i in range(n):
            m = det.valid[i]
            rec = {
                "boxes": det.boxes[i][m],
                "scores": det.scores[i][m],
                "classes": det.classes[i][m],
                "image_id": batch["image_id"][i],
            }
            if det.probs is not None:
                rec["probs"] = det.probs[i][m]
            if det.class_logits is not None:
                rec["class_logits"] = det.class_logits[i][m]
            if det.variance is not None:
                rec["vars"] = det.variance[i][m]
            out.append(rec)
        return out
