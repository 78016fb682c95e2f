"""Box head (FastRCNNConvFCHead) and output layers (FastRCNNOutputLayers).

Rebuild of reference ``detectron2/modeling/roi_heads/box_head.py:20`` and
``fast_rcnn.py:480-546``: pooled (K, 7, 7, C) features -> 2 FC(1024) -> class
logits (K, C+1), box deltas (K, C*4), and — when the uncertainty head is
enabled (``ENABLE_GAUSSIANNLLOSS``) — per-RoI variance exp(var_pred(x)) (K, 1)
(reference ``fast_rcnn.py:508-512,541-543``).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .layers import init_linear, linear

Array = jnp.ndarray


def init_box_head(
    key,
    in_channels: int = 256,
    pooler_resolution: int = 7,
    fc_dim: int = 1024,
    num_fc: int = 2,
) -> Dict:
    keys = jax.random.split(key, num_fc)
    in_dim = in_channels * pooler_resolution * pooler_resolution
    fcs = []
    for i in range(num_fc):
        fcs.append(init_linear(keys[i], in_dim, fc_dim))  # XavierFill like reference
        in_dim = fc_dim
    return {"fcs": fcs}


def apply_box_head(params, x: Array, dtype=None) -> Array:
    """(K, P, P, C) -> (K, fc_dim)."""
    k = x.shape[0]
    # NOTE: flatten order differs from torch NCHW; the checkpoint importer
    # permutes fc1 weights accordingly (see checkpoint/torch_import.py).
    h = x.reshape(k, -1)
    if dtype is not None:
        h = h.astype(dtype)
    for fc in params["fcs"]:
        h = jax.nn.relu(linear(h, fc))
    return h.astype(jnp.float32)


def init_output_layers(
    key,
    in_dim: int = 1024,
    num_classes: int = 3,
    cls_agnostic_bbox_reg: bool = False,
    enable_variance: bool = False,
) -> Dict:
    k1, k2, k3 = jax.random.split(key, 3)
    num_bbox_reg = 1 if cls_agnostic_bbox_reg else num_classes
    p = {
        "cls_score": init_linear(k1, in_dim, num_classes + 1, init_std=0.01),
        "bbox_pred": init_linear(k2, in_dim, num_bbox_reg * 4, init_std=0.001),
    }
    if enable_variance:
        p["var_pred"] = init_linear(k3, in_dim, 1, init_std=0.01)
    return p


def apply_output_layers(
    params, x: Array
) -> Tuple[Array, Array, Optional[Array]]:
    """(K, fc_dim) -> (logits (K, C+1), deltas (K, R*4), variance (K, 1)|None)."""
    scores = linear(x, params["cls_score"])
    deltas = linear(x, params["bbox_pred"])
    variance = None
    if "var_pred" in params:
        # clamp the log-variance logit: trained values live in a few units of
        # 0; the clamp only guards exp overflow at (random) init
        variance = jnp.exp(jnp.clip(linear(x, params["var_pred"]), -25.0, 25.0))
    return scores, deltas, variance
