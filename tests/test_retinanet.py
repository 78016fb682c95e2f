"""RetinaNet smoke tests (random weights + random data, reference
test_model_e2e.py style) + ProposalNetwork and TTA."""

import jax
import jax.numpy as jnp
import numpy as np

from proben_tpu.models.retinanet import (
    RetinaNetConfig,
    init_retinanet,
    retinanet_inference,
    retinanet_losses,
)
from proben_tpu.structures import GroundTruth

H = W = 256


def _gt(rng, n, g=3):
    xy = rng.rand(n, g, 2) * (H - 80)
    wh = rng.rand(n, g, 2) * 60 + 20
    return GroundTruth(
        boxes=jnp.asarray(np.concatenate([xy, xy + wh], -1).astype(np.float32)),
        classes=jnp.asarray(rng.randint(0, 3, (n, g)).astype(np.int32)),
        valid=jnp.ones((n, g), bool),
    )


def test_retinanet_losses_finite():
    rng = np.random.RandomState(0)
    cfg = RetinaNetConfig(num_classes=3, topk_candidates=100, topk_per_image=10)
    params = init_retinanet(jax.random.PRNGKey(0), cfg)
    images = jnp.asarray(rng.rand(2, H, W, 3).astype(np.float32) * 255)
    sizes = jnp.asarray(np.tile([[H, W]], (2, 1)).astype(np.int32))
    # jit: eager op-by-op dispatch on the 1-core CPU mesh costs ~5x a compile
    losses = jax.jit(
        lambda p, im, sz, g: retinanet_losses(p, cfg, im, sz, g)
    )(params, images, sizes, _gt(rng, 2))
    assert set(losses) == {"loss_cls", "loss_box_reg"}
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, v)


def test_retinanet_empty_gt():
    rng = np.random.RandomState(1)
    cfg = RetinaNetConfig(num_classes=3, topk_candidates=100, topk_per_image=10)
    params = init_retinanet(jax.random.PRNGKey(0), cfg)
    images = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32) * 255)
    sizes = jnp.asarray(np.array([[H, W]], np.int32))
    gt = GroundTruth(boxes=jnp.zeros((1, 3, 4)), classes=jnp.zeros((1, 3), jnp.int32),
                     valid=jnp.zeros((1, 3), bool))
    losses = jax.jit(
        lambda p, im, sz, g: retinanet_losses(p, cfg, im, sz, g)
    )(params, images, sizes, gt)
    for v in losses.values():
        assert np.isfinite(float(v))


def test_retinanet_inference_shapes():
    rng = np.random.RandomState(2)
    cfg = RetinaNetConfig(num_classes=3, topk_candidates=100, topk_per_image=10,
                          score_thresh=0.0)
    params = init_retinanet(jax.random.PRNGKey(0), cfg)
    images = jnp.asarray(rng.rand(2, H, W, 3).astype(np.float32) * 255)
    sizes = jnp.asarray(np.tile([[H, W]], (2, 1)).astype(np.int32))
    det = jax.jit(lambda p, im, sz: retinanet_inference(p, cfg, im, sz))(
        params, images, sizes
    )
    assert det.boxes.shape == (2, 10, 4)
    b = np.asarray(det.boxes)
    assert np.isfinite(b).all()
    assert (b >= 0).all() and (b[..., 2] <= W).all() and (b[..., 3] <= H).all()
    # scores sorted descending within each image
    s = np.asarray(det.scores)
    assert (np.diff(s, axis=1) <= 1e-6).all()


def test_proposal_network():
    from proben_tpu.models import build_config, init_rcnn
    from proben_tpu.models.proposal_network import (
        proposal_network_inference,
        proposal_network_losses,
    )
    from proben_tpu.models.rpn import RPNConfig

    rng = np.random.RandomState(3)
    cfg = build_config(rpn=RPNConfig(pre_nms_topk_test=50, post_nms_topk_test=20,
                                     pre_nms_topk_train=50, post_nms_topk_train=20))
    params = init_rcnn(jax.random.PRNGKey(0), cfg)
    images = jnp.asarray(rng.rand(1, 128, 128, 3).astype(np.float32) * 255)
    sizes = jnp.asarray(np.array([[128, 128]], np.int32))
    boxes, scores, valid = proposal_network_inference(params, cfg, images, sizes)
    assert boxes.shape == (1, 20, 4)
    losses = proposal_network_losses(params, cfg, images, sizes, _rpn_gt(rng), jax.random.PRNGKey(1))
    assert set(losses) == {"loss_rpn_cls", "loss_rpn_loc"}


def _rpn_gt(rng):
    xy = rng.rand(1, 2, 2) * 80
    wh = rng.rand(1, 2, 2) * 30 + 10
    return GroundTruth(
        boxes=jnp.asarray(np.concatenate([xy, xy + wh], -1).astype(np.float32)),
        classes=jnp.zeros((1, 2), jnp.int32),
        valid=jnp.ones((1, 2), bool),
    )


def test_tta_merges_and_unflips():
    from proben_tpu.data.dataset_mapper import MapperConfig
    from proben_tpu.models.tta import DetectionTTA

    class FakePredictor:
        """Emits one box at a fixed ORIGINAL-frame location, scaled into
        whatever frame the TTA fed us (so unflip/unscale must invert it)."""

        def predict_batch(self, batch):
            nh, nw = np.asarray(batch["image_size"])[0]
            oh, ow = np.asarray(batch["orig_size"])[0]
            sx, sy = nw / ow, nh / oh
            box = np.array([10 * sx, 20 * sy, 50 * sx, 60 * sy], np.float32)
            # predictor returns boxes in the ORIGINAL frame (Predictor does
            # the rescale): emulate that — but flips are the TTA's job
            box = box / np.array([sx, sy, sx, sy])
            return [{
                "boxes": box[None], "scores": np.array([0.9], np.float32),
                "classes": np.array([1]), "image_id": 0,
            }]

    mc = MapperConfig(pad_shape=(256, 320))
    tta = DetectionTTA(FakePredictor(), mc, scales=(128, 160), flip=True)
    image = np.zeros((200, 300, 3), np.float32)
    out = tta(image)
    assert len(out["boxes"]) >= 1
    # unflipped original box and flipped-back box: x-flip of [10, 50] in a
    # 300-wide frame is [250, 290]; merged output keeps both clusters
    xs = np.sort(out["boxes"][:, 0])
    assert np.any(np.abs(xs - 10) < 1e-3)
    assert np.any(np.abs(xs - 250) < 1e-3)


def test_tta_rescore_averages_probs():
    """rescore=True replaces merged scores with the box-head class
    probabilities averaged over augmented frames (reference
    rerun-with-detected_instances pathway)."""
    from proben_tpu.data.dataset_mapper import MapperConfig
    from proben_tpu.models.tta import DetectionTTA

    class FakePredictor:
        def __init__(self):
            self.calls = 0
            self.seen_boxes = []

        def predict_batch(self, batch):
            return [{
                "boxes": np.array([[10.0, 20.0, 50.0, 60.0]], np.float32),
                "scores": np.array([0.9], np.float32),
                "classes": np.array([1]), "image_id": 0,
            }]

        def rescore_boxes(self, images, boxes):
            self.calls += 1
            self.seen_boxes.append(np.asarray(boxes))
            n, k = boxes.shape[0], boxes.shape[1]
            p = np.zeros((n, k, 4), np.float32)  # 3 fg classes + background
            p[..., 1] = 0.4 if self.calls == 1 else 0.8
            return jnp.asarray(p), None, None

    fp = FakePredictor()
    mc = MapperConfig(pad_shape=(256, 320))
    tta = DetectionTTA(fp, mc, scales=(128,), flip=True, rescore=True)
    out = tta(np.zeros((200, 300, 3), np.float32))
    assert fp.calls == 2  # one rescore pass per augmentation
    np.testing.assert_allclose(out["scores"], 0.6, atol=1e-6)  # mean(0.4, 0.8)
    # merged boxes were mapped into each augmented frame before rescoring:
    # scale 128/200 = 0.64, and the flipped frame mirrors x
    b0 = fp.seen_boxes[0][0, 0]
    np.testing.assert_allclose(b0, [10 * 0.64, 20 * 0.64, 50 * 0.64, 60 * 0.64],
                               atol=1e-4)
