"""C4 (Res5ROIHeads) and Cascade R-CNN smoke tests."""

import jax
import jax.numpy as jnp
import numpy as np

from proben_tpu.models import build_config
from proben_tpu.models.c4 import init_rcnn_c4, rcnn_c4_inference, rcnn_c4_train_losses
from proben_tpu.models.cascade import (
    cascade_inference,
    cascade_train_losses,
    init_cascade_roi_heads,
)
from proben_tpu.models.fast_rcnn import FastRCNNConfig
from proben_tpu.models.roi_heads import ROIHeadsConfig
from proben_tpu.models.rpn import RPNConfig
from proben_tpu.structures import GroundTruth

H = W = 128


def _cfg():
    return build_config(
        depth=50, num_classes=3,
        roi_align_impl="gather",  # CPU e2e speed; see test_model_e2e.tiny_cfg
        rpn=RPNConfig(pre_nms_topk_train=100, post_nms_topk_train=50,
                      pre_nms_topk_test=100, post_nms_topk_test=50),
        roi=ROIHeadsConfig(num_classes=3, batch_size_per_image=32),
        rcnn=FastRCNNConfig(num_classes=3, topk_per_image=10, max_candidates=128),
    )


def _gt(rng, n=1):
    xy = rng.rand(n, 3, 2) * 60
    wh = rng.rand(n, 3, 2) * 40 + 10
    return GroundTruth(
        boxes=jnp.asarray(np.concatenate([xy, xy + wh], -1).astype(np.float32)),
        classes=jnp.asarray(rng.randint(0, 3, (n, 3)).astype(np.int32)),
        valid=jnp.ones((n, 3), bool),
    )


def test_c4_inference_and_train():
    rng = np.random.RandomState(0)
    cfg = _cfg()
    params = init_rcnn_c4(jax.random.PRNGKey(0), cfg)
    images = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32) * 255)
    sizes = jnp.asarray(np.array([[H, W]], np.int32))
    # jit: eager op-by-op dispatch on the 1-core CPU mesh costs ~5x a compile
    det = jax.jit(lambda p, im, sz: rcnn_c4_inference(p, cfg, im, sz))(
        params, images, sizes)
    assert det.boxes.shape == (1, 10, 4)
    assert np.isfinite(np.asarray(det.boxes)).all()
    losses = jax.jit(
        lambda p, im, sz, g: rcnn_c4_train_losses(p, cfg, im, sz, g,
                                                  jax.random.PRNGKey(1))
    )(params, images, sizes, _gt(rng))
    assert {"loss_rpn_cls", "loss_rpn_loc", "loss_cls", "loss_box_reg"} <= set(losses)
    for v in losses.values():
        assert np.isfinite(float(v))


def test_cascade_heads():
    rng = np.random.RandomState(1)
    cfg = _cfg()
    params = init_cascade_roi_heads(jax.random.PRNGKey(0), in_channels=64,
                                    num_classes=3)
    feats = [jnp.asarray(rng.rand(H // s, W // s, 64).astype(np.float32))
             for s in (4, 8, 16, 32)]
    roi_cfg = ROIHeadsConfig(num_classes=3, batch_size_per_image=16)
    rcnn_cfg = FastRCNNConfig(num_classes=3, topk_per_image=8, max_candidates=64,
                              score_thresh=0.0)
    xy = rng.rand(20, 2) * 80
    wh = rng.rand(20, 2) * 30 + 8
    props = jnp.asarray(np.concatenate([xy, xy + wh], 1).astype(np.float32))
    valid = jnp.ones((20,), bool)

    det = jax.jit(
        lambda p, f, pr, v: cascade_inference(p, f, pr, v, (H, W), roi_cfg, rcnn_cfg)
    )(params, feats, props, valid)
    assert det.boxes.shape == (8, 4)
    assert np.isfinite(np.asarray(det.boxes)).all()

    gt = GroundTruth(
        boxes=jnp.asarray(np.array([[10, 10, 60, 60]], np.float32)),
        classes=jnp.asarray(np.array([1], np.int32)),
        valid=jnp.ones((1,), bool),
    )
    losses = jax.jit(
        lambda p, f, pr, v, g: cascade_train_losses(
            p, f, pr, v, g, jax.random.PRNGKey(2), roi_cfg, rcnn_cfg)
    )(params, feats, props, valid, gt)
    assert "loss_cls_stage0" in losses and "loss_box_reg_stage2" in losses
    for v in losses.values():
        assert np.isfinite(float(v))
