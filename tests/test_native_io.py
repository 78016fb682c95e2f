"""Native C++ loader tests: build, parity vs the cv2 python path, threading."""

import os

import cv2
import numpy as np
import pytest

from proben_tpu.native import native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native io library unavailable"
)


@pytest.fixture(scope="module")
def jpeg_pairs(tmp_path_factory):
    root = tmp_path_factory.mktemp("imgs")
    (root / "thermal_8_bit").mkdir()
    (root / "RGB").mkdir()
    rng = np.random.RandomState(0)
    tpaths, rpaths = [], []
    for i in range(4):
        tp = str(root / "thermal_8_bit" / f"t{i}.jpeg")
        rp = str(root / "RGB" / f"t{i}.jpg")
        # smooth images compress/decode deterministically enough for parity
        base = cv2.GaussianBlur(
            rng.randint(0, 255, (256, 320, 3), np.uint8), (31, 31), 8
        )
        cv2.imwrite(tp, base)
        cv2.imwrite(rp, cv2.resize(base, (640, 512)))
        tpaths.append(tp)
        rpaths.append(rp)
    return tpaths, rpaths


def test_batch_shapes_and_padding(jpeg_pairs):
    from proben_tpu.native import NativeLoader

    tpaths, rpaths = jpeg_pairs
    loader = NativeLoader("BGRTTT", short_side=200, max_size=320,
                          pad_shape=(208, 320), num_threads=2)
    imgs, sizes, orig = loader.load_batch(tpaths, rpaths)
    assert imgs.shape == (4, 208, 320, 6)
    assert (orig == [256, 320]).all()
    assert (sizes == [200, 250]).all()
    # padding region zero
    assert imgs[:, 200:].sum() == 0
    assert imgs[:, :, 250:].sum() == 0


def test_parity_with_python_path(jpeg_pairs):
    from proben_tpu.data.detection_utils import read_image
    from proben_tpu.data.transforms import TestResize
    from proben_tpu.native import NativeLoader

    tpaths, rpaths = jpeg_pairs
    loader = NativeLoader("BGRT", short_side=200, max_size=320,
                          pad_shape=(208, 320), num_threads=2)
    imgs, sizes, _ = loader.load_batch(tpaths, rpaths)

    resize = TestResize(200, 320)
    ref, (nh, nw) = resize(read_image(tpaths[0], "BGRT"))
    got = imgs[0, :nh, :nw]
    # decode differences (libjpeg variants) + fixed-point vs float resize
    assert np.abs(got - ref).mean() < 2.0
    assert np.abs(got - ref).max() < 40  # local diffs bounded


def test_missing_file_raises(jpeg_pairs):
    from proben_tpu.native import NativeLoader

    tpaths, rpaths = jpeg_pairs
    loader = NativeLoader("BGR", pad_shape=(208, 320), short_side=200, max_size=320)
    with pytest.raises(IOError):
        loader.load_batch(["/nonexistent/file.jpeg"] + tpaths[1:], rpaths)
