"""tools/convert_torchvision.py and tools/visualize_json_results.py
(reference tools/convert-torchvision-to-d2.py, visualize_json_results.py)."""

import importlib.util
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_tool(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, "tools", f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _fake_torchvision_r50_sd():
    """State dict with torchvision ResNet-50 key/shape structure."""
    import torch

    sd = {}
    sd["conv1.weight"] = torch.randn(64, 3, 7, 7)
    for part, shape in (("weight", (64,)), ("bias", (64,)),
                        ("running_mean", (64,)), ("running_var", (64,))):
        sd[f"bn1.{part}"] = torch.rand(shape) + 0.5
    blocks = [3, 4, 6, 3]
    cin = 64
    for li, n in enumerate(blocks, start=1):
        width = 64 * 2 ** (li - 1)
        cout = width * 4
        for b in range(n):
            pre = f"layer{li}.{b}"
            sd[f"{pre}.conv1.weight"] = torch.randn(width, cin, 1, 1)
            sd[f"{pre}.conv2.weight"] = torch.randn(width, width, 3, 3)
            sd[f"{pre}.conv3.weight"] = torch.randn(cout, width, 1, 1)
            for ci, ch in (("1", width), ("2", width), ("3", cout)):
                for part in ("weight", "bias", "running_mean", "running_var"):
                    sd[f"{pre}.bn{ci}.{part}"] = torch.rand(ch) + 0.5
            if b == 0:
                sd[f"{pre}.downsample.0.weight"] = torch.randn(cout, cin, 1, 1)
                for part in ("weight", "bias", "running_mean", "running_var"):
                    sd[f"{pre}.downsample.1.{part}"] = torch.rand(cout) + 0.5
            cin = cout
    sd["fc.weight"] = torch.randn(1000, 2048)
    sd["fc.bias"] = torch.randn(1000)
    return sd


def test_convert_torchvision_roundtrip(tmp_path):
    import torch

    tool = _load_tool("convert_torchvision")
    sd = _fake_torchvision_r50_sd()
    src = tmp_path / "r50.pth"
    dst = tmp_path / "r50.pkl"
    torch.save(sd, str(src))
    tool.convert(str(src), str(dst))

    import pickle

    res = pickle.load(open(dst, "rb"))
    model = res["model"]
    assert res["matching_heuristics"]
    assert "stem.conv1.weight" in model
    assert "res2.0.shortcut.weight" in model
    assert "res5.2.conv3.norm.running_var" in model
    assert not any(k.startswith("fc.") for k in model)

    # the converted pkl loads through the proben_tpu importer: backbone
    # weights land (HWIO transpose + folded FrozenBN affine), heads fall
    # back to the template under strict=False
    import jax

    from proben_tpu.checkpoint.torch_import import import_detectron2_checkpoint
    from proben_tpu.models import build_config, init_rcnn

    cfg = build_config(depth=50, input_format="BGR", num_classes=3)
    template = init_rcnn(jax.random.PRNGKey(0), cfg)
    params = import_detectron2_checkpoint(str(dst), template, strict=False)
    got = np.asarray(params["backbone"]["stem"]["conv1"]["w"])
    want = sd["conv1.weight"].numpy().transpose(2, 3, 1, 0)  # OIHW -> HWIO
    np.testing.assert_allclose(got, want, rtol=1e-6)
    assert not np.allclose(
        np.asarray(template["backbone"]["stem"]["conv1"]["w"]), got
    )


def test_visualize_json_results(tmp_path):
    cv2 = pytest.importorskip("cv2")
    img_path = tmp_path / "im0.png"
    cv2.imwrite(str(img_path), np.full((64, 64, 3), 127, np.uint8))
    preds = [
        {"image_id": 1, "category_id": 1, "bbox": [8, 8, 20, 20], "score": 0.9},
        {"image_id": 1, "category_id": 1, "bbox": [1, 1, 5, 5], "score": 0.1},
    ]
    pred_json = tmp_path / "preds.json"
    pred_json.write_text(json.dumps(preds))
    out_dir = tmp_path / "out"

    # subprocess so the tool registers its own dataset via a small driver
    driver = tmp_path / "driver.py"
    driver.write_text(
        f"""
import sys
sys.path.insert(0, {str(REPO)!r})
sys.argv = ["visualize_json_results.py", "--input", {str(pred_json)!r},
            "--output", {str(out_dir)!r}, "--dataset", "viz_test",
            "--conf-threshold", "0.5"]
from proben_tpu.data import DatasetCatalog, MetadataCatalog
DatasetCatalog.register("viz_test", lambda: [
    {{"file_name": {str(img_path)!r}, "image_id": 1,
      "annotations": [{{"bbox": [10, 10, 18, 18], "category_id": 1}}]}},
])
MetadataCatalog.get("viz_test").thing_dataset_id_to_contiguous_id = {{1: 0}}
MetadataCatalog.get("viz_test").thing_classes = ["person"]
import importlib.util
spec = importlib.util.spec_from_file_location(
    "viz", {os.path.join(REPO, "tools", "visualize_json_results.py")!r})
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)
mod.main()
"""
    )
    r = subprocess.run([sys.executable, str(driver)], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-2000:]
    out_img = out_dir / "im0.png"
    assert out_img.exists()
    arr = cv2.imread(str(out_img))
    assert arr.shape == (64, 128, 3)  # pred | gt side by side
    assert (arr != 127).any()  # something was drawn
