#!/usr/bin/env python
"""Convert a torchvision ResNet checkpoint to the detectron2 naming scheme
(reference ``tools/convert-torchvision-to-d2.py``), producing a ``.pkl``
that ``proben_tpu.checkpoint.torch_import.import_detectron2_checkpoint``
(or detectron2 itself) can load.

Usage:
  python tools/convert_torchvision.py r50.pth r50.pkl

Then point a config at it:
  MODEL:
    WEIGHTS: "/path/to/r50.pkl"
    PIXEL_MEAN: [123.675, 116.280, 103.530]
    PIXEL_STD: [58.395, 57.120, 57.375]
    RESNETS: {DEPTH: 50, STRIDE_IN_1X1: False}
  INPUT: {FORMAT: "RGB"}
"""

import pickle
import sys


def torchvision_key_to_d2(k: str) -> str:
    """torchvision ResNet state-dict key -> detectron2 backbone key
    (the rename table IS the reference script's spec)."""
    if "layer" not in k:
        k = "stem." + k
    for t in (1, 2, 3, 4):
        k = k.replace(f"layer{t}", f"res{t + 1}")
    for t in (1, 2, 3):
        k = k.replace(f"bn{t}", f"conv{t}.norm")
    k = k.replace("downsample.0", "shortcut")
    k = k.replace("downsample.1", "shortcut.norm")
    return k


def convert(src: str, dst: str) -> None:
    import torch

    obj = torch.load(src, map_location="cpu")
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    model = {}
    unconverted = []
    for old_k in list(obj.keys()):
        if old_k.startswith("fc."):
            unconverted.append(old_k)  # classifier head: not a backbone key
            continue
        new_k = torchvision_key_to_d2(old_k)
        print(old_k, "->", new_k)
        model[new_k] = obj[old_k].detach().numpy()
    res = {"model": model, "__author__": "torchvision", "matching_heuristics": True}
    with open(dst, "wb") as f:
        pickle.dump(res, f)
    if unconverted:
        print("Unconverted keys:", unconverted)


if __name__ == "__main__":
    convert(sys.argv[1], sys.argv[2])
