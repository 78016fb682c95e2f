"""Middle-fusion ablations (BLUR_RGB / MAX_POOL_RGB), Gaussian blur numerics,
visualizer mask/keypoint drawing."""

import jax
import jax.numpy as jnp
import numpy as np

from proben_tpu.models import build_config, init_rcnn, rcnn_train_losses
from proben_tpu.models.fast_rcnn import FastRCNNConfig
from proben_tpu.models.gaussian_blur import gaussian_blur, gaussian_kernel_1d
from proben_tpu.models.roi_heads import ROIHeadsConfig
from proben_tpu.models.rpn import RPNConfig
from proben_tpu.structures import GroundTruth


def test_gaussian_kernel_normalized():
    k = np.asarray(gaussian_kernel_1d(5, 3.0))
    np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-6)
    assert k[2] == k.max()  # centered
    np.testing.assert_allclose(k, k[::-1])  # symmetric


def test_gaussian_blur_smooths():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 16, 16, 4).astype(np.float32))
    out = np.asarray(gaussian_blur(x, (5, 5), (3.0, 3.0)))
    assert out.shape == x.shape
    # blurring reduces variance, preserves mean (away from borders)
    assert out[0, 4:-4, 4:-4].std() < np.asarray(x)[0, 4:-4, 4:-4].std()
    # interior mean preserved (borders darken from the zero padding)
    np.testing.assert_allclose(
        out[0, 4:-4, 4:-4].mean(), np.asarray(x)[0, 4:-4, 4:-4].mean(), atol=0.03
    )


def test_blur_and_maxpool_ablations_train():
    rng = np.random.RandomState(1)
    cfg = build_config(
        input_format="BGRTTT",
        pixel_mean=(103.53, 116.28, 123.675, 135.0, 135.0, 135.0),
        blur_rgb=True,
        max_pool_rgb=True,
        roi_align_impl="gather",  # CPU e2e speed; see test_model_e2e.tiny_cfg
        rpn=RPNConfig(pre_nms_topk_train=64, post_nms_topk_train=32),
        roi=ROIHeadsConfig(num_classes=3, batch_size_per_image=16),
        rcnn=FastRCNNConfig(num_classes=3, topk_per_image=4, max_candidates=32),
    )
    params = init_rcnn(jax.random.PRNGKey(0), cfg)
    images = jnp.asarray(rng.rand(1, 64, 64, 6).astype(np.float32) * 255)
    sizes = jnp.asarray(np.array([[64, 64]], np.int32))
    gt = GroundTruth(
        boxes=jnp.asarray(np.array([[[8, 8, 40, 40]]], np.float32)),
        classes=jnp.zeros((1, 1), jnp.int32),
        valid=jnp.ones((1, 1), bool),
    )
    # jit: eager op-by-op dispatch on the 1-core CPU mesh costs ~5x a compile
    losses = jax.jit(
        lambda p, im, sz, g: rcnn_train_losses(p, cfg, im, sz, g, jax.random.PRNGKey(1))
    )(params, images, sizes, gt)
    for v in losses.values():
        assert np.isfinite(float(v))


def test_visualizer_masks_keypoints(tmp_path):
    from proben_tpu.utils import Visualizer

    img = np.zeros((64, 64, 3), np.uint8)
    masks = np.zeros((1, 64, 64), bool)
    masks[0, 10:30, 10:30] = True
    kpts = np.array([[[32.0, 32.0, 1.0], [5.0, 5.0, 0.0]]])
    vis = Visualizer(img).draw_instance_predictions(
        {"boxes": np.array([[10, 10, 30, 30]]), "scores": np.array([0.9]),
         "classes": np.array([1]), "masks": masks, "keypoints": kpts}
    )
    out = vis.get_image()
    assert out[15, 15].sum() > 0  # mask tint
    assert out[32, 32, 1] > 100  # keypoint dot (green)
    assert out[5, 5].sum() == 0  # invisible keypoint not drawn
