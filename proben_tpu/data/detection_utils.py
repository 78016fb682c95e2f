"""Image IO including the fork's multichannel BGRT/BGRTTT formats
(reference ``detectron2/data/detection_utils.py:38-95``).

For the multimodal formats, the RGB path is derived from the thermal path
(``thermal_8_bit/`` <-> ``RGB/``, ``.jpeg``/``.jpg`` extension swap), the RGB
image is resized to the thermal resolution, and channels are stacked:
BGRT = BGR + 1 thermal channel (4), BGRTTT = BGR + 3 thermal channels (6).
"""

from __future__ import annotations

import os
from typing import Optional

import cv2
import numpy as np


def derive_rgb_path(
    thermal_path: str,
    thermal_dir: str = "thermal_8_bit",
    rgb_dir: str = "RGB",
    rgb_ext: str = ".jpg",
) -> str:
    marker = thermal_dir + "/"
    if marker not in thermal_path:
        raise ValueError(f"'{marker}' not in thermal path {thermal_path}")
    folder, name = thermal_path.split(marker, 1)
    return folder + rgb_dir + "/" + os.path.splitext(name)[0] + rgb_ext


def read_image(file_name: str, format: str = "BGR") -> np.ndarray:
    """HWC float-compatible uint8-ish image in the requested channel format.

    format: BGR (3), RGB (3), L (1), BGRT (4: BGR+thermal), BGRTTT (6).
    For BGRT/BGRTTT, ``file_name`` is the thermal image path.
    """
    if format in ("BGRT", "BGRTTT"):
        thermal = cv2.imread(file_name)
        if thermal is None:
            raise FileNotFoundError(file_name)
        rgb_path = derive_rgb_path(file_name)
        rgb = cv2.imread(rgb_path)
        if rgb is None:
            raise FileNotFoundError(rgb_path)
        rgb = cv2.resize(rgb, (thermal.shape[1], thermal.shape[0]))
        if format == "BGRT":
            out = np.zeros(thermal.shape[:2] + (4,), np.float32)
            out[:, :, :3] = rgb
            out[:, :, 3] = thermal[:, :, 0]
        else:
            out = np.zeros(thermal.shape[:2] + (6,), np.float32)
            out[:, :, :3] = rgb
            out[:, :, 3:] = thermal
        return out

    img = cv2.imread(file_name, cv2.IMREAD_COLOR if format != "L" else cv2.IMREAD_GRAYSCALE)
    if img is None:
        raise FileNotFoundError(file_name)
    if format == "L":
        return img[:, :, None].astype(np.float32)
    if format == "RGB":
        img = img[:, :, ::-1]
    return np.ascontiguousarray(img).astype(np.float32)
