"""VOC / LVIS / Cityscapes dataset loaders + builtin registration
(references: detectron2/data/datasets/{pascal_voc,lvis,cityscapes,builtin}.py)."""

import json
import os

import numpy as np

from proben_tpu.data import (
    DatasetCatalog,
    MetadataCatalog,
    load_cityscapes_instances,
    load_lvis_json,
    load_voc_instances,
    register_all_builtin,
)
from proben_tpu.structures.boxes import BoxMode


def test_voc_loader(tmp_path):
    (tmp_path / "ImageSets" / "Main").mkdir(parents=True)
    (tmp_path / "Annotations").mkdir()
    (tmp_path / "JPEGImages").mkdir()
    (tmp_path / "ImageSets" / "Main" / "train.txt").write_text("000001\n")
    (tmp_path / "Annotations" / "000001.xml").write_text(
        """<annotation>
  <size><width>100</width><height>80</height><depth>3</depth></size>
  <object><name>dog</name><difficult>0</difficult>
    <bndbox><xmin>1</xmin><ymin>1</ymin><xmax>50</xmax><ymax>40</ymax></bndbox>
  </object>
  <object><name>person</name><difficult>1</difficult>
    <bndbox><xmin>10</xmin><ymin>20</ymin><xmax>30</xmax><ymax>60</ymax></bndbox>
  </object>
</annotation>"""
    )
    dicts = load_voc_instances(str(tmp_path), "train")
    assert len(dicts) == 1
    d = dicts[0]
    assert d["height"] == 80 and d["width"] == 100
    a0, a1 = d["annotations"]
    # 1-based inclusive -> 0-based: min corner shifts, max stays
    np.testing.assert_allclose(a0["bbox"], [0.0, 0.0, 50.0, 40.0])
    assert a0["bbox_mode"] == BoxMode.XYXY_ABS
    assert a0["category_id"] == 11  # dog
    assert a1["category_id"] == 14 and a1["difficult"] == 1


def test_lvis_loader(tmp_path):
    data = {
        "images": [
            {
                "id": 7,
                "height": 64,
                "width": 48,
                "coco_url": "http://images.cocodataset.org/val2017/000000000007.jpg",
                "neg_category_ids": [2],
                "not_exhaustive_category_ids": [1],
            }
        ],
        "annotations": [
            {"id": 1, "image_id": 7, "category_id": 1, "bbox": [1, 2, 10, 12]},
            {"id": 2, "image_id": 7, "category_id": 2, "bbox": [5, 5, 8, 8]},
        ],
        "categories": [
            {"id": 1, "name": "aardvark", "frequency": "c"},
            {"id": 2, "synonyms": ["abacus"], "frequency": "r"},
        ],
    }
    p = tmp_path / "lvis.json"
    p.write_text(json.dumps(data))
    dicts = load_lvis_json(str(p), "/imgs", dataset_name="lvis_tiny_test")
    d = dicts[0]
    assert d["file_name"] == "/imgs/val2017/000000000007.jpg"
    assert d["neg_category_ids"] == [2]
    assert [a["category_id"] for a in d["annotations"]] == [0, 1]  # 1-based -> 0-based
    meta = MetadataCatalog.get("lvis_tiny_test")
    assert meta.thing_classes == ["aardvark", "abacus"]
    assert meta.lvis_categories[1]["frequency"] == "r"


def test_cityscapes_loader(tmp_path):
    img_dir = tmp_path / "leftImg8bit" / "val" / "frankfurt"
    gt_dir = tmp_path / "gtFine" / "val" / "frankfurt"
    img_dir.mkdir(parents=True)
    gt_dir.mkdir(parents=True)
    stem = "frankfurt_000000_000294_"
    (img_dir / (stem + "leftImg8bit.png")).write_bytes(b"\x89PNG\r\n")
    (gt_dir / (stem + "gtFine_polygons.json")).write_text(
        json.dumps(
            {
                "imgHeight": 1024,
                "imgWidth": 2048,
                "objects": [
                    {"label": "car", "polygon": [[10, 20], [110, 20], [110, 90], [10, 90]]},
                    {"label": "cargroup", "polygon": [[0, 0], [50, 0], [50, 50]]},
                    {"label": "sky", "polygon": [[0, 0], [2048, 0], [2048, 10]]},
                    {"label": "person", "deleted": 1, "polygon": [[0, 0], [1, 0], [1, 1]]},
                ],
            }
        )
    )
    dicts = load_cityscapes_instances(
        str(tmp_path / "leftImg8bit" / "val"), str(tmp_path / "gtFine" / "val")
    )
    assert len(dicts) == 1
    d = dicts[0]
    assert d["height"] == 1024 and d["width"] == 2048
    assert len(d["annotations"]) == 2  # sky dropped, deleted dropped
    car, group = d["annotations"]
    assert car["category_id"] == 2 and car["iscrowd"] == 0  # car
    np.testing.assert_allclose(car["bbox"], [10, 20, 110, 90])
    assert group["category_id"] == 2 and group["iscrowd"] == 1


def test_register_all_builtin():
    register_all_builtin(root="/nonexistent-root")
    names = DatasetCatalog.list()
    assert "coco_2017_val" in names
    assert "lvis_v1_val" in names
    assert "voc_2007_test" in names
    assert "cityscapes_fine_instance_seg_val" in names
    assert MetadataCatalog.get("coco_2017_val").thing_classes[0] == "person"
    assert len(MetadataCatalog.get("coco_2017_val").thing_classes) == 80
    assert MetadataCatalog.get("voc_2007_test").evaluator_type == "pascal_voc"
    # registration is lazy: fetching a missing split raises only on access
    try:
        DatasetCatalog.get("coco_2017_val")
        raised = False
    except (FileNotFoundError, OSError):
        raised = True
    assert raised


def test_load_sem_seg(tmp_path):
    from proben_tpu.data import load_sem_seg

    (tmp_path / "imgs" / "sub").mkdir(parents=True)
    (tmp_path / "gts" / "sub").mkdir(parents=True)
    (tmp_path / "imgs" / "sub" / "a.jpg").write_bytes(b"x")
    (tmp_path / "gts" / "sub" / "a.png").write_bytes(b"y")
    (tmp_path / "imgs" / "orphan.jpg").write_bytes(b"x")  # no gt -> dropped
    dicts = load_sem_seg(str(tmp_path / "gts"), str(tmp_path / "imgs"))
    assert len(dicts) == 1
    assert dicts[0]["file_name"].endswith(os.path.join("sub", "a.jpg"))
    assert dicts[0]["sem_seg_file_name"].endswith(os.path.join("sub", "a.png"))


def test_build_evaluator_dispatch(tmp_path):
    from proben_tpu.evaluation import build_evaluator
    from proben_tpu.evaluation.flir import FLIREvaluator
    from proben_tpu.evaluation.lvis import LVISEvaluator
    from proben_tpu.evaluation.pascal_voc import PascalVOCDetectionEvaluator

    coco_json = tmp_path / "tiny_coco.json"
    coco_json.write_text(json.dumps({
        "images": [{"id": 1, "file_name": "a.jpg", "height": 10, "width": 10}],
        "annotations": [{"id": 1, "image_id": 1, "category_id": 3,
                         "bbox": [1, 1, 5, 5], "area": 25, "iscrowd": 0}],
        "categories": [{"id": 3, "name": "cat"}],
    }))
    from proben_tpu.data import MetadataCatalog

    m = MetadataCatalog.get("disp_coco")
    m.json_file = str(coco_json)
    m.evaluator_type = "coco"
    ev = build_evaluator("disp_coco")
    assert isinstance(ev, FLIREvaluator) and ev.valid_classes == {0}
    assert ev.class_remap == {}
    # contiguous class 0 must survive the generic-coco route (passing
    # DATASET ids as valid_classes silently dropped every detection)
    ev.process(1, [[1, 1, 6, 6]], [0.9], [0])
    np.testing.assert_allclose(ev.evaluate()["bbox"]["AP50"], 100.0)

    lvis_json = tmp_path / "tiny_lvis.json"
    lvis_json.write_text(json.dumps({
        "images": [{"id": 1, "neg_category_ids": []}],
        "annotations": [{"id": 1, "image_id": 1, "category_id": 1,
                         "bbox": [1, 1, 5, 5]}],
        "categories": [{"id": 1, "name": "x", "frequency": "c"}],
    }))
    m2 = MetadataCatalog.get("disp_lvis")
    m2.json_file = str(lvis_json)
    m2.evaluator_type = "lvis"
    assert isinstance(build_evaluator("disp_lvis"), LVISEvaluator)

    # VOC: register a one-image dataset, gt seeded from the dicts
    from proben_tpu.data import DatasetCatalog

    DatasetCatalog.register("disp_voc", lambda: [{
        "image_id": "im0",
        "annotations": [{"bbox": [0, 0, 9, 9], "category_id": 0,
                         "bbox_mode": BoxMode.XYXY_ABS}],
    }])
    mv = MetadataCatalog.get("disp_voc")
    mv.evaluator_type = "pascal_voc"
    mv.thing_classes = ["person"]
    mv.year = 2007
    ev = build_evaluator("disp_voc")
    assert isinstance(ev, PascalVOCDetectionEvaluator)
    ev.process("im0", [[0, 0, 9, 9]], [0.9], [0])
    np.testing.assert_allclose(ev.evaluate()["bbox"]["AP50"], 100.0)


def test_build_evaluator_cityscapes_instance(tmp_path):
    """cityscapes_instance datasets dispatch to a box-protocol adapter over
    CityscapesInstanceEvaluator (gt from the dataset dicts' polygons); a
    box-perfect detection on a box-shaped instance scores AP50=100
    (round-2 advisor: the loader/evaluator pair never connected)."""
    from proben_tpu.data import DatasetCatalog, MetadataCatalog
    from proben_tpu.evaluation import build_evaluator

    DatasetCatalog.register("disp_city", lambda: [{
        "image_id": "frankfurt_000000_000294",
        "height": 128, "width": 256,
        "annotations": [{
            "category_id": 2,  # car
            "bbox": [10.0, 20.0, 110.0, 90.0],
            "bbox_mode": BoxMode.XYXY_ABS,
            "iscrowd": 0,
            # rectangle polygon == its own bbox, so a box prediction is an
            # exact mask match
            "segmentation": [[10, 20, 110, 20, 110, 90, 10, 90]],
        }],
    }])
    mc = MetadataCatalog.get("disp_city")
    mc.evaluator_type = "cityscapes_instance"
    mc.thing_classes = [
        "person", "rider", "car", "truck", "bus", "train", "motorcycle",
        "bicycle",
    ]
    ev = build_evaluator("disp_city", output_dir=str(tmp_path / "cs_out"))
    ev.reset()
    ev.process("frankfurt_000000_000294", [[10, 20, 110, 90]], [0.95], [2])
    res = ev.evaluate()
    np.testing.assert_allclose(res["segm"]["AP50"], 100.0)
