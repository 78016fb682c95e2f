"""Host-side detection visualization (reference ``detectron2/utils/visualizer.py``
— the bbox/label subset on the ProbEn path, used by ``demo_draw_FLIR.py``)."""

from __future__ import annotations

import colorsys
from typing import Dict, List, Optional, Sequence

import numpy as np


def _color_for(idx: int) -> tuple:
    """Deterministic distinct colors (reference colormap.py spirit)."""
    hue = (idx * 0.61803398875) % 1.0
    r, g, b = colorsys.hsv_to_rgb(hue, 0.9, 1.0)
    return (int(b * 255), int(g * 255), int(r * 255))  # BGR for cv2


class Visualizer:
    """Draw instance predictions on an image.

    image: HWC uint8 BGR (cv2 convention); boxes XYXY in image frame.
    """

    def __init__(self, image: np.ndarray, metadata=None, scale: float = 1.0):
        import cv2

        self._cv2 = cv2
        img = np.asarray(image)
        if img.dtype != np.uint8:
            img = np.clip(img, 0, 255).astype(np.uint8)
        if img.ndim == 2 or img.shape[2] == 1:
            img = cv2.cvtColor(img.reshape(img.shape[0], img.shape[1]), cv2.COLOR_GRAY2BGR)
        if scale != 1.0:
            img = cv2.resize(img, None, fx=scale, fy=scale)
        self.img = img.copy()
        self.scale = scale
        self.metadata = metadata

    def _class_name(self, cls: int) -> str:
        names = getattr(self.metadata, "thing_classes", None) if self.metadata else None
        if names and 0 <= cls < len(names):
            return names[cls]
        return str(cls)

    def overlay_instances(
        self,
        boxes: Optional[np.ndarray] = None,
        labels: Optional[Sequence[str]] = None,
        classes: Optional[np.ndarray] = None,
        scores: Optional[np.ndarray] = None,
        thickness: int = 1,
        assigned_colors: Optional[Sequence] = None,
    ) -> "Visualizer":
        cv2 = self._cv2
        if boxes is None or len(boxes) == 0:
            return self
        boxes = np.asarray(boxes, float) * self.scale
        n = len(boxes)
        if labels is None:
            labels = []
            for i in range(n):
                text = self._class_name(int(classes[i])) if classes is not None else ""
                if scores is not None:
                    text = f"{text} {scores[i] * 100:.0f}%".strip()
                labels.append(text)
        for i, box in enumerate(boxes):
            if assigned_colors is not None:
                color = tuple(int(v) for v in assigned_colors[i])
            else:
                color = _color_for(int(classes[i]) if classes is not None else i)
            x1, y1, x2, y2 = [int(round(v)) for v in box]
            cv2.rectangle(self.img, (x1, y1), (x2, y2), color, thickness)
            if labels[i]:
                (tw, th), _ = cv2.getTextSize(labels[i], cv2.FONT_HERSHEY_SIMPLEX, 0.4, 1)
                ty = y1 - 3 if y1 - th - 4 >= 0 else y2 + th + 3
                cv2.rectangle(self.img, (x1, ty - th - 2), (x1 + tw, ty + 2), color, -1)
                cv2.putText(self.img, labels[i], (x1, ty), cv2.FONT_HERSHEY_SIMPLEX,
                            0.4, (0, 0, 0), 1, cv2.LINE_AA)
        return self

    def draw_masks(self, masks: np.ndarray, classes: Optional[np.ndarray] = None,
                   alpha: float = 0.45,
                   assigned_colors: Optional[Sequence] = None) -> "Visualizer":
        """Overlay (N, H, W) boolean masks with per-class colors."""
        for i, m in enumerate(np.asarray(masks)):
            if assigned_colors is not None:
                color = np.asarray(assigned_colors[i], float)
            else:
                color = np.array(_color_for(int(classes[i]) if classes is not None else i))
            region = m.astype(bool)
            self.img[region] = (
                (1 - alpha) * self.img[region] + alpha * color
            ).astype(np.uint8)
        return self

    def draw_keypoints(self, keypoints: np.ndarray, radius: int = 3) -> "Visualizer":
        """Draw (N, K, 3) keypoints (x, y, score/visibility > 0)."""
        cv2 = self._cv2
        for inst in np.asarray(keypoints):
            for x, y, v in inst:
                if v > 0:
                    cv2.circle(self.img, (int(round(x * self.scale)),
                                          int(round(y * self.scale))),
                               radius, (0, 255, 0), -1)
        return self

    def draw_instance_predictions(self, predictions: Dict) -> "Visualizer":
        """predictions: dict with boxes/scores/classes (+ optional masks (N,H,W),
        keypoints (N,K,3)) numpy arrays (Predictor.predict_batch format)."""
        if predictions.get("masks") is not None:
            self.draw_masks(predictions["masks"], predictions.get("classes"))
        out = self.overlay_instances(
            boxes=predictions.get("boxes"),
            classes=predictions.get("classes"),
            scores=predictions.get("scores"),
        )
        if predictions.get("keypoints") is not None:
            self.draw_keypoints(predictions["keypoints"])
        return out

    def get_image(self) -> np.ndarray:
        return self.img

    def save(self, path: str):
        self._cv2.imwrite(path, self.img)


class PaperVisualizer(Visualizer):
    """The reference's ``visualizer_paper.py`` fork: identical drawing with
    FIXED per-class colors for the ProbEn paper figures (its only substantive
    diff vs ``visualizer.py`` is the hardcoded class->color map and label
    suppression)."""

    # reference visualizer_paper.py:341-346 ({0,1,2} -> green/yellow/blue),
    # expressed in this module's BGR convention
    PAPER_COLORS = {0: (0, 255, 0), 1: (0, 255, 255), 2: (255, 0, 0)}

    def overlay_instances(self, boxes=None, labels=None, classes=None,
                          scores=None, thickness: int = 2,
                          assigned_colors=None):
        if assigned_colors is None and classes is not None:
            assigned_colors = [
                self.PAPER_COLORS.get(int(c), _color_for(int(c))) for c in classes
            ]
        if labels is None:
            labels = [""] * (len(boxes) if boxes is not None else 0)
        return super().overlay_instances(
            boxes, labels, classes, scores, thickness, assigned_colors
        )
