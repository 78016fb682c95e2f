"""Golden-value regression tests (reference tests/test_rpn.py:17-76 style):
seeded tiny components assert exact expected numbers, locking numerics
against refactors.

Provenance: the same quantities (delta codec, matcher labels, RPN and
FastRCNN loss values, fusion outputs, COCOeval metrics) are validated against
the reference repo's own code in test_reference_parity.py (via
tests/ref_oracle.py), so these constants serve as fast refactor locks on
numerics already tied to the reference."""

import jax
import jax.numpy as jnp
import numpy as np

from proben_tpu.models.anchors import cell_anchors, grid_anchors
from proben_tpu.models.fast_rcnn import FastRCNNConfig, fast_rcnn_losses
from proben_tpu.models.rpn import RPNConfig, rpn_losses
from proben_tpu.ops import get_deltas


def test_cell_anchor_golden():
    a = cell_anchors([32.0], [0.5, 1.0, 2.0])
    # ratio .5: w = sqrt(1024/0.5) ~ 45.25, h = 22.63
    np.testing.assert_allclose(
        a[0], [-22.627417, -11.313708, 22.627417, 11.313708], rtol=1e-6
    )
    np.testing.assert_allclose(a[1], [-16, -16, 16, 16], atol=1e-5)
    np.testing.assert_allclose(
        a[2], [-11.313708, -22.627417, 11.313708, 22.627417], rtol=1e-6
    )


def test_grid_anchor_golden():
    g = grid_anchors((2, 2), 16, [32.0], [1.0])
    np.testing.assert_allclose(
        g,
        [
            [-16, -16, 16, 16],
            [0, -16, 32, 16],
            [-16, 0, 16, 32],
            [0, 0, 32, 32],
        ],
        atol=1e-5,
    )


def test_rpn_loss_golden_hand_computed():
    """One anchor, one gt, deterministic labels: losses computable by hand."""
    anchors = [jnp.array([[0.0, 0.0, 10.0, 10.0]])]
    gt = jnp.array([[0.0, 0.0, 10.0, 10.0]])  # IoU 1 -> positive
    logits = [jnp.array([2.0])]
    # perfect box prediction -> deltas = gt deltas = 0; predict 0 -> loc loss 0
    deltas = [jnp.zeros((1, 4))]
    cfg = RPNConfig(batch_size_per_image=4, positive_fraction=1.0)
    losses = rpn_losses(logits, deltas, anchors, gt, jnp.array([True]),
                        jax.random.PRNGKey(0), cfg)
    # BCE(logit=2, target=1) = log(1 + e^-2); normalized by batch_size 4
    want_cls = np.log1p(np.exp(-2.0)) / 4.0
    np.testing.assert_allclose(float(losses["loss_rpn_cls"]), want_cls, rtol=1e-5)
    np.testing.assert_allclose(float(losses["loss_rpn_loc"]), 0.0, atol=1e-7)


def test_fast_rcnn_loss_golden_hand_computed():
    """Two proposals (1 fg, 1 bg), uniform logits: CE = log(C+1)."""
    c = 3
    logits = jnp.zeros((2, c + 1))
    deltas = jnp.zeros((2, c * 4))
    boxes = jnp.array([[0.0, 0.0, 10.0, 10.0], [50.0, 50.0, 60.0, 60.0]])
    gt_classes = jnp.array([1, c])  # fg class 1, bg
    gt_boxes = jnp.array([[0.0, 0.0, 10.0, 10.0], [0.0, 0.0, 0.0, 0.0]])
    valid = jnp.array([True, True])
    cfg = FastRCNNConfig(num_classes=c)
    losses = fast_rcnn_losses(logits, deltas, None, boxes, gt_classes, valid,
                              gt_boxes, cfg)
    np.testing.assert_allclose(float(losses["loss_cls"]), np.log(c + 1), rtol=1e-6)
    # fg proposal box == gt box -> target deltas 0, prediction 0 -> loss 0
    np.testing.assert_allclose(float(losses["loss_box_reg"]), 0.0, atol=1e-7)


def test_fast_rcnn_box_loss_golden_nonzero():
    """Known offset: |target deltas| summed / num sampled."""
    c = 1
    logits = jnp.zeros((1, 2))
    deltas = jnp.zeros((1, 4))
    boxes = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    gt_boxes = jnp.array([[1.0, 0.0, 11.0, 10.0]])  # ctr shift +1 in x
    gt_classes = jnp.array([0])
    cfg = FastRCNNConfig(num_classes=c)
    losses = fast_rcnn_losses(logits, deltas, None, boxes, gt_classes,
                              jnp.array([True]), gt_boxes, cfg)
    # deltas = (10 * 1/10, 0, 0, 0) -> L1 sum = 1.0, normalizer = 1 sample
    np.testing.assert_allclose(float(losses["loss_box_reg"]), 1.0, rtol=1e-5)


def test_get_deltas_golden_weights():
    src = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    tgt = jnp.array([[2.0, 0.0, 12.0, 20.0]])
    d = np.asarray(get_deltas(src, tgt, (10.0, 10.0, 5.0, 5.0)))[0]
    np.testing.assert_allclose(d[0], 10 * 2.0 / 10)  # dx
    np.testing.assert_allclose(d[1], 10 * 5.0 / 10)  # dy (ctr 5 -> 10)
    np.testing.assert_allclose(d[2], 0.0, atol=1e-6)  # dw log(1)
    np.testing.assert_allclose(d[3], 5 * np.log(2.0), rtol=1e-6)  # dh
