"""DatasetMapper: dataset dict -> fixed-shape model inputs
(reference ``detectron2/data/dataset_mapper.py:19``).

TPU-first difference: every mapped sample is padded to one static
``pad_shape`` (instead of detectron2's per-batch divisibility padding) and GT
is padded to ``max_gt`` with a validity mask, so batches have identical shapes
and the jitted program compiles once.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..structures.boxes import BoxMode, convert_box_mode
from .detection_utils import read_image
from .transforms import TestResize, TrainAugment


@dataclasses.dataclass
class MapperConfig:
    input_format: str = "BGR"  # BGR | BGRT | BGRTTT
    pad_shape: Tuple[int, int] = (800, 1024)  # static (H, W) after resize
    max_gt: int = 64
    min_size_train: Sequence[int] = (640, 672, 704, 736, 768, 800)
    max_size_train: int = 1333
    min_size_test: int = 800
    max_size_test: int = 1333
    flip: bool = True
    crop: Optional[Tuple[float, float]] = None  # relative_range crop

    @property
    def num_channels(self) -> int:
        return {"BGR": 3, "RGB": 3, "L": 1, "BGRT": 4, "BGRTTT": 6}[self.input_format]


class DatasetMapper:
    def __init__(self, cfg: MapperConfig, is_train: bool = True, seed: int = 0):
        self.cfg = cfg
        self.is_train = is_train
        rng = np.random.RandomState(seed)
        self.train_aug = TrainAugment(
            cfg.min_size_train, cfg.max_size_train, cfg.flip, rng, crop=cfg.crop
        )
        self.test_resize = TestResize(cfg.min_size_test, cfg.max_size_test)

    def __call__(self, dataset_dict: Dict) -> Dict:
        """Returns numpy sample: image (H, W, C) padded, image_size (2,),
        gt_boxes (G, 4) XYXY in resized frame, gt_classes (G,), gt_valid (G,),
        plus bookkeeping (image_id, orig_size)."""
        cfg = self.cfg
        image = read_image(dataset_dict["file_name"], cfg.input_format)
        orig_h, orig_w = image.shape[:2]

        annos = dataset_dict.get("annotations", [])
        boxes = np.array(
            [
                convert_box_mode(
                    np.asarray(a["bbox"], np.float32), a.get("bbox_mode", BoxMode.XYWH_ABS), BoxMode.XYXY_ABS
                )
                for a in annos
                if not a.get("iscrowd", 0)
            ],
            np.float32,
        ).reshape(-1, 4)
        classes = np.array(
            [a["category_id"] for a in annos if not a.get("iscrowd", 0)], np.int64
        )

        if self.is_train:
            image, boxes = self.train_aug(image, boxes)
            new_h, new_w = image.shape[:2]
        else:
            image, (new_h, new_w) = self.test_resize(image)

        ph, pw = cfg.pad_shape
        if new_h > ph or new_w > pw:
            raise ValueError(
                f"resized image ({new_h}, {new_w}) exceeds pad_shape {cfg.pad_shape}"
            )
        padded = np.zeros((ph, pw, image.shape[2]), np.float32)
        padded[:new_h, :new_w] = image

        # clip boxes to the resized frame and drop empties
        if len(boxes):
            boxes[:, 0::2] = boxes[:, 0::2].clip(0, new_w)
            boxes[:, 1::2] = boxes[:, 1::2].clip(0, new_h)
            keep = (boxes[:, 2] > boxes[:, 0]) & (boxes[:, 3] > boxes[:, 1])
            boxes, classes = boxes[keep], classes[keep]

        g = cfg.max_gt
        gt_boxes = np.zeros((g, 4), np.float32)
        gt_classes = np.zeros((g,), np.int32)
        gt_valid = np.zeros((g,), bool)
        n = min(len(boxes), g)
        gt_boxes[:n] = boxes[:n]
        gt_classes[:n] = classes[:n]
        gt_valid[:n] = True

        return {
            "image": padded,
            "image_size": np.array([new_h, new_w], np.int32),
            "gt_boxes": gt_boxes,
            "gt_classes": gt_classes,
            "gt_valid": gt_valid,
            "image_id": dataset_dict.get("image_id"),
            "orig_size": np.array([orig_h, orig_w], np.int32),
            "file_name": dataset_dict["file_name"],
        }
