"""Config VERSION migration (reference detectron2/config/compat.py) and
VideoVisualizer / PaperVisualizer (utils/video_visualizer.py,
visualizer_paper.py)."""

import numpy as np

from proben_tpu.config import get_cfg
from proben_tpu.config.compat import (
    downgrade_config,
    guess_version,
    upgrade_config,
)
from proben_tpu.utils.video_visualizer import VideoVisualizer
from proben_tpu.utils.visualizer import PaperVisualizer


# -- compat -------------------------------------------------------------------


def test_upgrade_downgrade_roundtrip():
    cfg = get_cfg()
    old = downgrade_config(cfg, to_version=1)
    assert old.VERSION == 1
    assert "SCORE_THRESH" in old.MODEL.ROI_HEADS
    assert "SCORE_THRESH_TEST" not in old.MODEL.ROI_HEADS
    assert "WEIGHT" in old.MODEL and "WEIGHTS" not in old.MODEL
    back = upgrade_config(old)
    assert back.VERSION == cfg.VERSION
    assert back.MODEL.ROI_HEADS.SCORE_THRESH_TEST == cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST
    assert back.dump() == cfg.dump()


def test_guess_version_markers():
    from proben_tpu.config.config import CfgNode

    assert guess_version(CfgNode({"MODEL": {"WEIGHT": "x.pkl"}})) == 1
    assert guess_version(CfgNode({"TEST": {"AUG_ON": True}})) == 1
    assert guess_version(CfgNode({"MODEL": {"WEIGHTS": "x.pkl"}})) == 2


def test_merge_legacy_v1_yaml(tmp_path):
    legacy = tmp_path / "legacy.yaml"
    legacy.write_text(
        "MODEL:\n"
        "  WEIGHT: /some/model.pkl\n"
        "  ROI_HEADS:\n"
        "    SCORE_THRESH: 0.42\n"
        "TEST:\n"
        "  DETECTIONS_PER_IMG: 55\n"
    )
    cfg = get_cfg()
    cfg.merge_from_file(str(legacy))
    assert cfg.MODEL.WEIGHTS == "/some/model.pkl"
    assert cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST == 0.42
    assert cfg.TEST.DETECTIONS_PER_IMAGE == 55
    assert cfg.VERSION == 2
    # untouched defaults survive the downgrade/merge/upgrade round trip
    assert cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST == 0.5


def test_merge_current_yaml_unaffected(tmp_path):
    f = tmp_path / "new.yaml"
    f.write_text("MODEL:\n  WEIGHTS: /w.npz\n")
    cfg = get_cfg()
    cfg.merge_from_file(str(f))
    assert cfg.MODEL.WEIGHTS == "/w.npz"
    assert cfg.VERSION == 2


def test_newer_version_rejected(tmp_path):
    f = tmp_path / "future.yaml"
    f.write_text("VERSION: 99\n")
    cfg = get_cfg()
    try:
        cfg.merge_from_file(str(f))
        raised = False
    except ValueError:
        raised = True
    assert raised


# -- video visualizer ----------------------------------------------------------


def _frame():
    return np.full((64, 64, 3), 128, np.uint8)


def test_video_visualizer_color_stability():
    vv = VideoVisualizer()
    preds1 = {
        "boxes": np.array([[5.0, 5.0, 25.0, 25.0], [40.0, 40.0, 60.0, 60.0]]),
        "classes": np.array([0, 1]),
        "scores": np.array([0.9, 0.8]),
    }
    vv.draw_instance_predictions(_frame(), preds1)
    colors1 = [x.color for x in vv._old_instances]
    # frame 2: same objects moved slightly -> colors transfer
    preds2 = {
        "boxes": np.array([[6.0, 6.0, 26.0, 26.0], [41.0, 41.0, 61.0, 61.0]]),
        "classes": np.array([0, 1]),
        "scores": np.array([0.9, 0.8]),
    }
    vv.draw_instance_predictions(_frame(), preds2)
    colors2 = [x.color for x in vv._old_instances[:2]]
    assert colors1 == colors2
    # a new, non-overlapping instance gets a fresh color
    preds3 = {
        "boxes": np.array([[6.0, 6.0, 26.0, 26.0], [5.0, 40.0, 20.0, 60.0]]),
        "classes": np.array([0, 0]),
        "scores": np.array([0.9, 0.8]),
    }
    vv.draw_instance_predictions(_frame(), preds3)
    new_colors = [x.color for x in vv._old_instances if x.ttl == 8]
    assert new_colors[0] == colors1[0]
    assert new_colors[1] not in colors1


def test_video_visualizer_class_gate():
    """Same box, different class -> no color transfer."""
    vv = VideoVisualizer()
    box = np.array([[5.0, 5.0, 25.0, 25.0]])
    vv.draw_instance_predictions(_frame(), {"boxes": box, "classes": np.array([0])})
    c0 = vv._old_instances[0].color
    vv.draw_instance_predictions(_frame(), {"boxes": box, "classes": np.array([1])})
    c1 = [x for x in vv._old_instances if x.ttl == 8][0].color
    assert c0 != c1


def test_visualizer_rotated_and_keypoints():
    """Extended drawing surface (reference visualizer.py:693,836): rotated
    boxes land their corners where the corner math says, and keypoint
    skeleton lines follow metadata connection rules."""
    from proben_tpu.utils.visualizer import Visualizer

    def bluish(img):  # LINE_AA blends edge pixels; accept near-(255,0,0) BGR
        return (img[..., 0] > 180) & (img[..., 1] < 90) & (img[..., 2] < 90)

    # axis-aligned 'rotated' box at angle 0: edges at x=20..40, y=22..42
    vis = Visualizer(_frame())
    vis.draw_rotated_box_with_label((30, 32, 20, 20, 0.0), color=(255, 0, 0))
    img = vis.get_image()
    assert bluish(img[22, 20:40]).any()
    # 90-degree rotation swaps w/h extents: a (30, 10) box becomes 10 wide
    vis2 = Visualizer(_frame())
    vis2.draw_rotated_box_with_label((32, 32, 30, 10, 90.0), color=(255, 0, 0))
    img2 = vis2.get_image()
    red2 = np.argwhere(bluish(img2))
    assert red2[:, 1].max() - red2[:, 1].min() <= 12  # ~10 wide + AA
    assert red2[:, 0].max() - red2[:, 0].min() >= 28  # ~30 tall

    class Meta:
        keypoint_names = ("a", "b", "c")
        keypoint_connection_rules = [("a", "b", (255, 0, 0))]

    vis3 = Visualizer(_frame(), metadata=Meta())
    vis3.draw_keypoints(np.array([[[10, 10, 1.0], [30, 30, 1.0], [50, 50, 0.0]]]))
    img3 = vis3.get_image()
    # connection line drawn in BGR-flipped rule color between a and b
    px = img3[20, 20]
    assert px[2] > 180 and px[0] < 90 and px[1] < 90
    # invisible keypoint c: no circle at (50, 50)
    assert (img3[50, 50] == 128).all()


def test_visualizer_dataset_dict():
    from proben_tpu.utils.visualizer import Visualizer

    dic = {
        "annotations": [
            {"bbox": [10.0, 10.0, 20.0, 20.0], "bbox_mode": 1, "category_id": 0},
            {"bbox": [5.0, 40.0, 15.0, 55.0], "bbox_mode": 0, "category_id": 1,
             "iscrowd": 1},
        ]
    }
    vis = Visualizer(_frame())
    out = vis.draw_dataset_dict(dic).get_image()
    assert out.shape == (64, 64, 3)
    assert (out != 128).any()  # something was drawn


def test_paper_visualizer_fixed_colors():
    vis = PaperVisualizer(_frame())
    vis.overlay_instances(
        boxes=np.array([[10.0, 10.0, 30.0, 30.0]]), classes=np.array([0])
    )
    img = vis.get_image()
    # class 0 -> pure green border somewhere on the box edge
    assert (img[10, 10:30] == np.array([0, 255, 0])).all(axis=-1).any()
