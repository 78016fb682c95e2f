"""Data layer tests on a synthetic FLIR-like mini dataset."""

import json
import os

import cv2
import numpy as np
import pytest

from proben_tpu.data import (
    DatasetCatalog,
    DatasetMapper,
    MapperConfig,
    MetadataCatalog,
    TrainLoader,
    load_coco_json,
    read_image,
    register_coco_instances,
    build_test_loader,
    training_index_stream,
)
from proben_tpu.data.detection_utils import derive_rgb_path


@pytest.fixture(scope="module")
def flir_mini(tmp_path_factory):
    """4 synthetic 128x160 thermal+RGB pairs with COCO annotations."""
    root = tmp_path_factory.mktemp("flir")
    tdir = root / "thermal_8_bit"
    rdir = root / "RGB"
    tdir.mkdir()
    rdir.mkdir()
    rng = np.random.RandomState(0)
    images, annotations = [], []
    aid = 1
    for i in range(4):
        name = f"FLIR_{i:05d}.jpeg"
        thermal = rng.randint(0, 255, (128, 160, 3), np.uint8)
        rgb = rng.randint(0, 255, (256, 320, 3), np.uint8)  # RGB is larger
        cv2.imwrite(str(tdir / name), thermal)
        cv2.imwrite(str(rdir / f"FLIR_{i:05d}.jpg"), rgb)
        images.append({"id": i + 1, "file_name": name, "height": 128, "width": 160})
        for _ in range(2):
            x, y = rng.randint(0, 100), rng.randint(0, 80)
            w, h = rng.randint(10, 40), rng.randint(10, 30)
            annotations.append(
                {
                    "id": aid,
                    "image_id": i + 1,
                    "category_id": int(rng.choice([1, 2, 3])),
                    "bbox": [float(x), float(y), float(w), float(h)],
                    "area": float(w * h),
                    "iscrowd": 0,
                }
            )
            aid += 1
    js = {
        "images": images,
        "annotations": annotations,
        "categories": [
            {"id": 1, "name": "person"},
            {"id": 2, "name": "bicycle"},
            {"id": 3, "name": "car"},
        ],
    }
    json_path = root / "annotations.json"
    json_path.write_text(json.dumps(js))
    return {"root": str(root), "json": str(json_path), "thermal": str(tdir)}


def test_load_and_register(flir_mini):
    DatasetCatalog.remove("flir_mini_test")
    register_coco_instances(
        "flir_mini_test", {}, flir_mini["json"], flir_mini["thermal"]
    )
    dicts = DatasetCatalog.get("flir_mini_test")
    assert len(dicts) == 4
    assert all(len(d["annotations"]) == 2 for d in dicts)
    meta = MetadataCatalog.get("flir_mini_test")
    assert meta.thing_classes == ["person", "bicycle", "car"]
    assert meta.thing_dataset_id_to_contiguous_id == {1: 0, 2: 1, 3: 2}
    # contiguous category ids
    cats = {a["category_id"] for d in dicts for a in d["annotations"]}
    assert cats <= {0, 1, 2}


def test_read_image_formats(flir_mini):
    path = os.path.join(flir_mini["thermal"], "FLIR_00000.jpeg")
    bgr = read_image(path, "BGR")
    assert bgr.shape == (128, 160, 3)
    bgrt = read_image(path, "BGRT")
    assert bgrt.shape == (128, 160, 4)
    bgrttt = read_image(path, "BGRTTT")
    assert bgrttt.shape == (128, 160, 6)
    # thermal channel comes from the thermal image
    np.testing.assert_allclose(bgrt[:, :, 3], bgr[:, :, 0], atol=1e-5)
    # RGB channels come from the (resized) RGB file -> differ from thermal
    assert np.abs(bgrttt[:, :, :3] - bgr).mean() > 1.0


def test_derive_rgb_path():
    assert (
        derive_rgb_path("/data/FLIR/val/thermal_8_bit/FLIR_08864.jpeg")
        == "/data/FLIR/val/RGB/FLIR_08864.jpg"
    )


def test_mapper_train_shapes(flir_mini):
    dicts = load_coco_json(flir_mini["json"], flir_mini["thermal"])
    cfg = MapperConfig(input_format="BGRT", pad_shape=(256, 320), max_gt=8,
                       min_size_train=(160, 200), max_size_train=320)
    mapper = DatasetMapper(cfg, is_train=True, seed=0)
    s = mapper(dicts[0])
    assert s["image"].shape == (256, 320, 4)
    assert s["gt_boxes"].shape == (8, 4)
    assert s["gt_valid"].sum() == 2
    h, w = s["image_size"]
    assert h <= 256 and w <= 320
    # boxes inside resized frame
    b = s["gt_boxes"][s["gt_valid"]]
    assert (b[:, 2] <= w + 1e-3).all() and (b[:, 3] <= h + 1e-3).all()
    # padding region is zero
    assert s["image"][int(h):].sum() == 0


def test_mapper_test_deterministic(flir_mini):
    dicts = load_coco_json(flir_mini["json"], flir_mini["thermal"])
    cfg = MapperConfig(pad_shape=(256, 320), min_size_test=200, max_size_test=320)
    mapper = DatasetMapper(cfg, is_train=False)
    s1, s2 = mapper(dicts[1]), mapper(dicts[1])
    np.testing.assert_array_equal(s1["image"], s2["image"])
    # 128x160 -> short side 200 would give 200x250 (max 320 ok)
    np.testing.assert_array_equal(s1["image_size"], [200, 250])


def test_training_stream_sharding():
    s0 = list(itertools_islice(training_index_stream(10, seed=1, shard=0, num_shards=2), 10))
    s1 = list(itertools_islice(training_index_stream(10, seed=1, shard=1, num_shards=2), 10))
    # same permutation, interleaved: union of first epoch halves = all indices
    assert set(s0[:5]) | set(s1[:5]) == set(range(10))
    assert set(s0[:5]).isdisjoint(s1[:5])


def itertools_islice(it, n):
    import itertools

    return itertools.islice(it, n)


def test_train_loader_batches(flir_mini):
    dicts = load_coco_json(flir_mini["json"], flir_mini["thermal"])
    cfg = MapperConfig(pad_shape=(256, 320), max_gt=8,
                       min_size_train=(200,), max_size_train=320)
    loader = TrainLoader(dicts, DatasetMapper(cfg, True, 0), batch_size=2,
                         num_workers=2, prefetch=2)
    try:
        for _ in range(3):
            batch = next(loader)
            assert batch["image"].shape == (2, 256, 320, 3)
            assert batch["gt"].boxes.shape == (2, 8, 4)
    finally:
        loader.close()


def test_test_loader_covers_all(flir_mini):
    dicts = load_coco_json(flir_mini["json"], flir_mini["thermal"])
    cfg = MapperConfig(pad_shape=(256, 320), min_size_test=200, max_size_test=320)
    mapper = DatasetMapper(cfg, is_train=False)
    seen = []
    for batch in build_test_loader(dicts, mapper, batch_size=3):
        seen.extend(batch["image_id"][: batch["num_real"]])
        assert batch["image"].shape[0] == 3  # static batch even when short
    assert seen == [1, 2, 3, 4]


def test_random_crop():
    from proben_tpu.data.transforms import random_crop

    rng = np.random.RandomState(0)
    img = np.arange(100 * 120 * 3, dtype=np.float32).reshape(100, 120, 3)
    boxes = np.array([[10.0, 10.0, 60.0, 50.0]], np.float32)
    cimg, cboxes = random_crop(img, boxes, (0.7, 0.7), rng)
    assert 70 <= cimg.shape[0] <= 100 and 84 <= cimg.shape[1] <= 120
    # box shifted by the crop origin (may be partially outside; mapper clips)
    assert cboxes[0, 2] - cboxes[0, 0] == 50.0


def test_color_jitter_blend_semantics():
    """Reference transform_gen.py :308-413: each color gen lowers to
    BlendTransform(out = src_w*src + dst_w*img). Closed-form checks at
    pinned RNG draws; intensity 1 must preserve the image exactly."""
    from proben_tpu.data.transforms import (
        ColorAugment,
        random_brightness,
        random_contrast,
        random_lighting,
        random_saturation,
    )

    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (8, 10, 3)).astype(np.float32)

    # intensity fixed at 1 -> identity (w=1: 0*src + 1*img)
    for fn in (random_contrast, random_brightness, random_saturation):
        np.testing.assert_allclose(
            fn(img, 1.0, 1.0, np.random.RandomState(1)), img, rtol=1e-6)
    # closed-form: w drawn from U(lo,hi) with a pinned seed
    w = np.random.RandomState(2).uniform(0.5, 1.5)
    np.testing.assert_allclose(
        random_brightness(img, 0.5, 1.5, np.random.RandomState(2)),
        w * img, rtol=1e-6)
    np.testing.assert_allclose(
        random_contrast(img, 0.5, 1.5, np.random.RandomState(2)),
        (1 - w) * img.mean() + w * img, rtol=1e-6)
    gray = img.dot([0.299, 0.587, 0.114])[:, :, None]
    np.testing.assert_allclose(
        random_saturation(img, 0.5, 1.5, np.random.RandomState(2)),
        (1 - w) * gray + w * img, rtol=1e-6)
    # lighting: adds a per-channel constant (PCA direction); scale=0 -> exact
    np.testing.assert_allclose(
        random_lighting(img, 0.0, np.random.RandomState(3)), img, rtol=1e-6)
    out = random_lighting(img, 0.1, np.random.RandomState(3))
    shift = out - img
    assert np.allclose(shift, shift[0, 0][None, None], atol=1e-5)  # constant
    # the stack composes and keeps shape
    aug = ColorAugment(contrast=(0.9, 1.1), brightness=(0.9, 1.1),
                       saturation=(0.9, 1.1), lighting=0.1,
                       rng=np.random.RandomState(4))
    assert aug(img).shape == img.shape


def test_random_extent():
    from proben_tpu.data.transforms import random_extent

    img = np.arange(40 * 50 * 3, dtype=np.float32).reshape(40, 50, 3)
    boxes = np.array([[5.0, 5.0, 20.0, 15.0]], np.float32)
    out, oboxes = random_extent(img, boxes, (0.8, 1.2), (0.2, 0.2),
                                np.random.RandomState(0))
    assert out.ndim == 3 and out.shape[2] == 3
    # box width/height preserved (pure shift into the subrect frame)
    assert oboxes[0, 2] - oboxes[0, 0] == 15.0
    assert oboxes[0, 3] - oboxes[0, 1] == 10.0


def test_mapper_with_crop(flir_mini):
    dicts = load_coco_json(flir_mini["json"], flir_mini["thermal"])
    cfg = MapperConfig(pad_shape=(256, 320), max_gt=8,
                       min_size_train=(160,), max_size_train=320,
                       crop=(0.8, 0.8))
    mapper = DatasetMapper(cfg, is_train=True, seed=0)
    s = mapper(dicts[0])
    assert s["image"].shape == (256, 320, 3)
