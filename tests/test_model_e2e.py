"""Model-level end-to-end tests on random weights + random data, mirroring the
reference tests/test_model_e2e.py strategy (:50-131): assert train/eval run,
shapes are right, empty-GT is handled, and losses are finite."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from proben_tpu.models import build_config, init_rcnn, rcnn_inference, rcnn_train_losses
from proben_tpu.models.fast_rcnn import FastRCNNConfig
from proben_tpu.models.roi_heads import ROIHeadsConfig
from proben_tpu.models.rpn import RPNConfig
from proben_tpu.structures import GroundTruth

H = W = 128
TINY_RPN = RPNConfig(pre_nms_topk_train=200, pre_nms_topk_test=100,
                     post_nms_topk_train=100, post_nms_topk_test=50)
TINY_ROI = ROIHeadsConfig(num_classes=3, batch_size_per_image=64)
TINY_RCNN = FastRCNNConfig(num_classes=3, topk_per_image=20, max_candidates=256)


def tiny_cfg(fmt="BGR", gnll=False, impl="gather"):
    # "gather" keeps CPU e2e runs fast: the interpret-mode Pallas kernel is
    # bit-identical but runs the grid in Python (~5 s/train-iter). The BGR
    # parametrizations keep impl="pallas" so BOTH rcnn.py dispatch branches
    # stay e2e-covered (kernel equivalence itself is pinned by
    # tests/test_roi_align_pallas.py).
    mean = {"BGR": (103.53, 116.28, 123.675),
            "BGRT": (103.53, 116.28, 123.675, 135.0),
            "BGRTTT": (103.53, 116.28, 123.675, 135.0, 135.0, 135.0)}[fmt]
    return build_config(
        input_format=fmt,
        pixel_mean=mean,
        enable_gaussian_nll=gnll,
        roi_align_impl=impl,
        rcnn=dataclasses.replace(TINY_RCNN, enable_gaussian_nll=gnll),
        roi=TINY_ROI,
        rpn=TINY_RPN,
    )


def rand_batch(rng, n, c):
    images = jnp.asarray(rng.rand(n, H, W, c).astype(np.float32) * 255)
    sizes = jnp.asarray(np.tile([[H, W]], (n, 1)).astype(np.int32))
    return images, sizes


def rand_gt(rng, n, g=4):
    xy = rng.rand(n, g, 2) * (H - 40)
    wh = rng.rand(n, g, 2) * 30 + 10
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    return GroundTruth(
        boxes=jnp.asarray(boxes),
        classes=jnp.asarray(rng.randint(0, 3, (n, g)).astype(np.int32)),
        valid=jnp.ones((n, g), bool),
    )


@pytest.mark.parametrize("fmt,c", [("BGR", 3), ("BGRT", 4), ("BGRTTT", 6)])
def test_train_losses_finite(fmt, c):
    rng = np.random.RandomState(0)
    cfg = tiny_cfg(fmt, impl="pallas" if fmt == "BGR" else "gather")
    params = init_rcnn(jax.random.PRNGKey(0), cfg)
    images, sizes = rand_batch(rng, 2, c)
    gt = rand_gt(rng, 2)
    # jit: eager op-by-op dispatch on the 1-core CPU mesh costs ~5x a compile
    losses = jax.jit(
        lambda p, im, sz, g: rcnn_train_losses(p, cfg, im, sz, g, jax.random.PRNGKey(1))
    )(params, images, sizes, gt)
    assert set(losses) == {"loss_rpn_cls", "loss_rpn_loc", "loss_cls", "loss_box_reg"}
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, v)


def test_gaussian_nll_loss_present():
    rng = np.random.RandomState(1)
    cfg = tiny_cfg("BGR", gnll=True)
    params = init_rcnn(jax.random.PRNGKey(0), cfg)
    assert "var_pred" in params["roi"]["output"]
    images, sizes = rand_batch(rng, 1, 3)
    gt = rand_gt(rng, 1)
    losses = jax.jit(
        lambda p, im, sz, g: rcnn_train_losses(p, cfg, im, sz, g, jax.random.PRNGKey(1))
    )(params, images, sizes, gt)
    assert "gaussian_loss" in losses
    assert np.isfinite(float(losses["gaussian_loss"]))


def test_empty_gt_train():
    rng = np.random.RandomState(2)
    cfg = tiny_cfg("BGR")
    params = init_rcnn(jax.random.PRNGKey(0), cfg)
    images, sizes = rand_batch(rng, 1, 3)
    gt = GroundTruth(
        boxes=jnp.zeros((1, 4, 4)), classes=jnp.zeros((1, 4), jnp.int32),
        valid=jnp.zeros((1, 4), bool),
    )
    losses = jax.jit(
        lambda p, im, sz, g: rcnn_train_losses(p, cfg, im, sz, g, jax.random.PRNGKey(1))
    )(params, images, sizes, gt)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, v)


@pytest.mark.parametrize("fmt,c", [("BGR", 3), ("BGRTTT", 6)])
def test_inference_shapes(fmt, c):
    rng = np.random.RandomState(3)
    cfg = tiny_cfg(fmt, gnll=True, impl="pallas" if fmt == "BGR" else "gather")
    params = init_rcnn(jax.random.PRNGKey(0), cfg)
    images, sizes = rand_batch(rng, 2, c)
    det = jax.jit(lambda p, im, sz: rcnn_inference(p, cfg, im, sz))(params, images, sizes)
    assert det.boxes.shape == (2, 20, 4)
    assert det.scores.shape == (2, 20)
    assert det.probs.shape == (2, 20, 3)
    assert det.class_logits.shape == (2, 20, 4)
    assert det.variance.shape == (2, 20, 1)
    b = np.asarray(det.boxes)
    assert np.isfinite(b).all()
    assert (b >= 0).all() and (b[..., [0, 2]] <= W).all() and (b[..., [1, 3]] <= H).all()
    # scores sorted descending within each image
    s = np.asarray(det.scores)
    assert (np.diff(s, axis=1) <= 1e-6).all()


def test_train_grads_flow_and_freeze():
    rng = np.random.RandomState(4)
    cfg = tiny_cfg("BGR")
    params = init_rcnn(jax.random.PRNGKey(0), cfg)
    images, sizes = rand_batch(rng, 1, 3)
    gt = rand_gt(rng, 1)

    def total_loss(p):
        losses = rcnn_train_losses(p, cfg, images, sizes, gt, jax.random.PRNGKey(1))
        return sum(losses.values())

    grads = jax.jit(jax.grad(total_loss))(params)
    # frozen (freeze_at=2): stem + res2 get zero grads via stop_gradient
    stem_g = np.abs(np.asarray(grads["backbone"]["stem"]["conv1"]["w"])).max()
    res2_g = np.abs(np.asarray(grads["backbone"]["res2"][0]["norm3"]["scale"])).max()
    # zero-gamma init: in-block conv grads are zero at step 0 (branch output
    # is scaled by 0), but the gamma itself gets gradient — check that leaf
    res4_g = np.abs(np.asarray(grads["backbone"]["res4"][0]["norm3"]["scale"])).max()
    rpn_g = np.abs(np.asarray(grads["rpn_head"]["conv"]["w"])).max()
    cls_g = np.abs(np.asarray(grads["roi"]["output"]["cls_score"]["w"])).max()
    assert stem_g == 0 and res2_g == 0
    assert res4_g > 0 and rpn_g > 0 and cls_g > 0
