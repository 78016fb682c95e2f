"""Config system tests: _BASE_ inheritance, CLI overrides, typed-config
conversion (mirrors reference tests/test_config.py scope)."""

import os

import pytest

from proben_tpu.config import (
    CfgNode,
    get_cfg,
    mapper_config_from_cfg,
    model_config_from_cfg,
    solver_config_from_cfg,
)

CONFIGS = os.path.join(os.path.dirname(__file__), "..", "configs")


def test_defaults_sane():
    cfg = get_cfg()
    assert cfg.MODEL.RESNETS.DEPTH == 50
    assert cfg.MODEL.RPN.NMS_THRESH == 0.7
    assert cfg.INPUT.FORMAT == "BGR"


def test_base_inheritance():
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(CONFIGS, "FLIR-Detection", "faster_rcnn_R_101_FLIR.yaml"))
    # from the leaf
    assert cfg.MODEL.RESNETS.DEPTH == 101
    assert cfg.SOLVER.MAX_ITER == 270000
    assert cfg.MODEL.ROI_HEADS.NUM_CLASSES == 3
    # from the base
    assert cfg.SOLVER.IMS_PER_BATCH == 16
    assert cfg.MODEL.RPN.PRE_NMS_TOPK_TEST == 1000
    # untouched default survives
    assert cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST == 0.05


def test_two_level_base():
    cfg = get_cfg()
    cfg.merge_from_file(
        os.path.join(CONFIGS, "FLIR-Detection", "faster_rcnn_R_101_FLIR_middle_fusion.yaml")
    )
    assert cfg.INPUT.FORMAT == "BGRTTT"
    assert cfg.MODEL.RESNETS.DEPTH == 101  # from mid level
    assert cfg.MODEL.BACKBONE.FREEZE_AT == 3
    assert len(cfg.MODEL.PIXEL_MEAN) == 6


def test_merge_from_list_coercion():
    cfg = get_cfg()
    cfg.merge_from_list(
        ["MODEL.RESNETS.DEPTH", "101", "SOLVER.BASE_LR", "0.001",
         "INPUT.FORMAT", "BGRT", "SOLVER.STEPS", "[100, 200]"]
    )
    assert cfg.MODEL.RESNETS.DEPTH == 101
    assert cfg.SOLVER.BASE_LR == 0.001
    assert cfg.INPUT.FORMAT == "BGRT"
    assert cfg.SOLVER.STEPS == (100, 200)


def test_freeze():
    cfg = get_cfg()
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.MODEL.RESNETS.DEPTH = 101
    cfg.defrost()
    cfg.MODEL.RESNETS.DEPTH = 101


def test_typed_conversion():
    cfg = get_cfg()
    cfg.merge_from_file(
        os.path.join(CONFIGS, "FLIR-Detection", "faster_rcnn_R_101_FLIR_gnll.yaml")
    )
    mc = model_config_from_cfg(cfg)
    assert mc.depth == 101
    assert mc.num_classes == 3
    assert mc.enable_gaussian_nll and mc.rcnn.enable_gaussian_nll
    assert mc.rpn.pre_nms_topk_test == 1000
    assert mc.rcnn.box_reg_weights == (10.0, 10.0, 5.0, 5.0)
    sc = solver_config_from_cfg(cfg)
    assert sc.max_iter == 270000
    dc = mapper_config_from_cfg(cfg)
    assert dc.pad_shape == (800, 1024)
    assert dc.min_size_train == (640, 672, 704, 736, 768, 800)


def test_clone_independent():
    cfg = get_cfg()
    c2 = cfg.clone()
    c2.MODEL.RESNETS.DEPTH = 101
    assert cfg.MODEL.RESNETS.DEPTH == 50
