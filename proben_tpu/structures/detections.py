"""Fixed-shape, masked detection containers.

The reference threads ragged per-image ``Instances`` lists through the whole
pipeline (``detectron2/structures/instances.py:9``). XLA requires static
shapes, so the TPU-native design replaces every ragged container with a padded
pytree + validity mask. All fields are jnp arrays with a leading capacity axis
``K``; invalid slots carry zeros and ``valid == False``.

These are registered as pytrees so they flow through ``jit``/``vmap``/``pjit``
transparently (including with a leading batch axis on every field).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Detections:
    """A padded set of detections/proposals for one image (or a batch of them).

    Shapes below are for the unbatched case; every transform that batches adds
    a leading axis uniformly.

    Attributes:
        boxes: (K, 4) XYXY absolute boxes in the *model input* coordinate frame
            unless otherwise noted.
        scores: (K,) detection confidence.
        classes: (K,) int32 class ids (0-based contiguous, no background).
        valid: (K,) bool validity mask.
        probs: optional (K, C) per-class softmax probabilities (foreground
            classes only — mirrors ``prob_score`` in reference
            ``fast_rcnn.py:140-145``).
        class_logits: optional (K, C+1) raw classifier logits (incl. background).
        variance: optional (K, 1) predicted box variance (uncertainty head).
    """

    boxes: Array
    scores: Array
    classes: Array
    valid: Array
    probs: Optional[Array] = None
    class_logits: Optional[Array] = None
    variance: Optional[Array] = None

    @property
    def capacity(self) -> int:
        return self.boxes.shape[-2]

    def num_valid(self) -> Array:
        return jnp.sum(self.valid.astype(jnp.int32), axis=-1)

    @staticmethod
    def empty(capacity: int, num_classes: int = 0, with_aux: bool = False) -> "Detections":
        z = jnp.zeros
        return Detections(
            boxes=z((capacity, 4), jnp.float32),
            scores=z((capacity,), jnp.float32),
            classes=z((capacity,), jnp.int32),
            valid=z((capacity,), bool),
            probs=z((capacity, num_classes), jnp.float32) if with_aux else None,
            class_logits=z((capacity, num_classes + 1), jnp.float32) if with_aux else None,
            variance=z((capacity, 1), jnp.float32) if with_aux else None,
        )

    def to_numpy(self) -> "Detections":
        return jax.tree_util.tree_map(np.asarray, self)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GroundTruth:
    """Padded ground-truth instances for one image (or batch with leading axis).

    boxes: (G, 4) XYXY in model-input frame; classes: (G,) int32;
    valid: (G,) bool.
    """

    boxes: Array
    classes: Array
    valid: Array

    @staticmethod
    def empty(capacity: int) -> "GroundTruth":
        return GroundTruth(
            boxes=jnp.zeros((capacity, 4), jnp.float32),
            classes=jnp.zeros((capacity,), jnp.int32),
            valid=jnp.zeros((capacity,), bool),
        )

    @staticmethod
    def from_numpy(boxes: np.ndarray, classes: np.ndarray, capacity: int) -> "GroundTruth":
        g = min(len(boxes), capacity)
        out_boxes = np.zeros((capacity, 4), np.float32)
        out_classes = np.zeros((capacity,), np.int32)
        out_valid = np.zeros((capacity,), bool)
        out_boxes[:g] = np.asarray(boxes, np.float32)[:g]
        out_classes[:g] = np.asarray(classes, np.int32)[:g]
        out_valid[:g] = True
        return GroundTruth(
            boxes=jnp.asarray(out_boxes), classes=jnp.asarray(out_classes), valid=jnp.asarray(out_valid)
        )


def pad_detections_numpy(
    boxes: np.ndarray,
    scores: np.ndarray,
    classes: np.ndarray,
    capacity: int,
    probs: Optional[np.ndarray] = None,
    class_logits: Optional[np.ndarray] = None,
    variance: Optional[np.ndarray] = None,
) -> Detections:
    """Host-side helper: build a padded Detections from ragged numpy arrays."""
    n = min(len(boxes), capacity)

    def pad(x, shape, dtype):
        out = np.zeros(shape, dtype)
        if n:
            out[:n] = np.asarray(x, dtype)[:n]
        return jnp.asarray(out)

    num_c = probs.shape[1] if probs is not None and probs.ndim == 2 else 0
    return Detections(
        boxes=pad(boxes, (capacity, 4), np.float32),
        scores=pad(scores, (capacity,), np.float32),
        classes=pad(classes, (capacity,), np.int32),
        valid=jnp.asarray(np.arange(capacity) < n),
        probs=pad(probs, (capacity, num_c), np.float32) if probs is not None else None,
        class_logits=(
            pad(class_logits, (capacity, class_logits.shape[1]), np.float32)
            if class_logits is not None
            else None
        ),
        variance=(
            pad(np.asarray(variance).reshape(-1, 1), (capacity, 1), np.float32)
            if variance is not None
            else None
        ),
    )
