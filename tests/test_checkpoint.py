"""Checkpoint import tests: torch-as-oracle numerics for every layout
conversion (conv OIHW->HWIO, BN folding, NCHW->NHWC fc1 permutation), full
R50 structural import, caffe2 name conversion, and orbax round-trip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from proben_tpu.checkpoint import (
    CheckpointManager,
    convert_caffe2_names,
    fc1_nchw_to_nhwc_perm,
    import_detectron2_checkpoint,
    restore_pytree,
    save_pytree,
)
from proben_tpu.checkpoint.torch_import import _conv, _linear, _norm
from proben_tpu.models.layers import affine, conv2d, linear
from proben_tpu.models import build_config, init_rcnn


def test_conv_import_matches_torch():
    torch.manual_seed(0)
    w = torch.randn(8, 3, 7, 7)
    b = torch.randn(8)
    x = torch.randn(1, 3, 32, 32)
    want = F.conv2d(x, w, b, stride=2, padding=3).permute(0, 2, 3, 1).numpy()

    sd = {"c.weight": w.numpy(), "c.bias": b.numpy()}
    p = _conv(sd, "c")
    got = np.asarray(conv2d(jnp.asarray(x.permute(0, 2, 3, 1).numpy()), p, stride=2, padding=3))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_bn_fold_matches_torch_eval():
    torch.manual_seed(1)
    bn = torch.nn.BatchNorm2d(6).eval()
    with torch.no_grad():
        bn.weight.copy_(torch.randn(6))
        bn.bias.copy_(torch.randn(6))
        bn.running_mean.copy_(torch.randn(6))
        bn.running_var.copy_(torch.rand(6) + 0.5)
    x = torch.randn(2, 6, 5, 5)
    want = bn(x).permute(0, 2, 3, 1).detach().numpy()
    sd = {
        "n.weight": bn.weight.detach().numpy(),
        "n.bias": bn.bias.detach().numpy(),
        "n.running_mean": bn.running_mean.numpy(),
        "n.running_var": bn.running_var.numpy(),
    }
    p = _norm(sd, "n")
    got = np.asarray(affine(jnp.asarray(x.permute(0, 2, 3, 1).numpy()), p))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_fc1_permutation_matches_torch_flatten():
    torch.manual_seed(2)
    C, S = 16, 7
    fc = torch.nn.Linear(C * S * S, 32)
    pooled = torch.randn(3, C, S, S)
    want = fc(pooled.flatten(1)).detach().numpy()

    sd = {"fc.weight": fc.weight.detach().numpy(), "fc.bias": fc.bias.detach().numpy()}
    perm = fc1_nchw_to_nhwc_perm(C * S * S, S)
    p = _linear(sd, "fc", perm)
    pooled_nhwc = pooled.permute(0, 2, 3, 1).numpy().reshape(3, -1)
    got = np.asarray(linear(jnp.asarray(pooled_nhwc), p))
    np.testing.assert_allclose(got, want, atol=1e-4)


def _synth_d2_state_dict(template, rng):
    """Generate a random torch-layout state_dict covering a full R-CNN,
    using the documented d2 key names."""
    sd = {}

    def conv_entry(key, p, bias=None):
        h, w, ci, co = p["w"].shape
        sd[f"{key}.weight"] = rng.randn(co, ci, h, w).astype(np.float32)
        if bias or (bias is None and "b" in p):
            sd[f"{key}.bias"] = rng.randn(co).astype(np.float32)

    def norm_entry(key, p):
        c = p["scale"].shape[0]
        sd[f"{key}.weight"] = rng.rand(c).astype(np.float32) + 0.5
        sd[f"{key}.bias"] = rng.randn(c).astype(np.float32)
        sd[f"{key}.running_mean"] = rng.randn(c).astype(np.float32)
        sd[f"{key}.running_var"] = rng.rand(c).astype(np.float32) + 0.5

    def backbone(prefix, bb):
        conv_entry(f"{prefix}.stem.conv1", bb["stem"]["conv1"])
        norm_entry(f"{prefix}.stem.conv1.norm", bb["stem"]["norm1"])
        for stage in ("res2", "res3", "res4", "res5"):
            for b, blk in enumerate(bb[stage]):
                base = f"{prefix}.{stage}.{b}"
                for ci in (1, 2, 3):
                    conv_entry(f"{base}.conv{ci}", blk[f"conv{ci}"])
                    norm_entry(f"{base}.conv{ci}.norm", blk[f"norm{ci}"])
                if "shortcut" in blk:
                    conv_entry(f"{base}.shortcut", blk["shortcut"])
                    norm_entry(f"{base}.shortcut.norm", blk["shortcut_norm"])

    def fpn(prefix, f):
        for i, lat in enumerate(f["lateral"]):
            conv_entry(f"{prefix}.fpn_lateral{i + 2}", lat)
        for i, o in enumerate(f["output"]):
            conv_entry(f"{prefix}.fpn_output{i + 2}", o)

    def lin_entry(key, p):
        ci, co = p["w"].shape
        sd[f"{key}.weight"] = rng.randn(co, ci).astype(np.float32)
        sd[f"{key}.bias"] = rng.randn(co).astype(np.float32)

    backbone("backbone.bottom_up", template["backbone"])
    fpn("backbone", template["fpn"])
    if "backbone_2" in template:
        backbone("backbone_2.bottom_up", template["backbone_2"])
        fpn("backbone_2", template["fpn_2"])
    conv_entry("proposal_generator.rpn_head.conv", template["rpn_head"]["conv"])
    conv_entry("proposal_generator.rpn_head.objectness_logits", template["rpn_head"]["objectness"])
    conv_entry("proposal_generator.rpn_head.anchor_deltas", template["rpn_head"]["deltas"])
    for i, fc in enumerate(template["roi"]["box_head"]["fcs"]):
        lin_entry(f"roi_heads.box_head.fc{i + 1}", fc)
    lin_entry("roi_heads.box_predictor.cls_score", template["roi"]["output"]["cls_score"])
    lin_entry("roi_heads.box_predictor.bbox_pred", template["roi"]["output"]["bbox_pred"])
    if "var_pred" in template["roi"]["output"]:
        lin_entry("roi_heads.box_predictor.var_pred", template["roi"]["output"]["var_pred"])
    return sd


@pytest.mark.parametrize("fmt", ["BGR", "BGRTTT"])
def test_full_import_structure(fmt):
    cfg = build_config(depth=50, input_format=fmt, enable_gaussian_nll=True)
    template = init_rcnn(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    sd = _synth_d2_state_dict(template, rng)
    params = import_detectron2_checkpoint(sd, template, strict=True)
    # identical tree structure + shapes
    ts = jax.tree_util.tree_structure(template)
    ps = jax.tree_util.tree_structure(params)
    assert ts == ps
    for a, b in zip(jax.tree_util.tree_leaves(template), jax.tree_util.tree_leaves(params)):
        assert a.shape == b.shape
    # spot check a transposed conv leaf
    w_t = sd["backbone.bottom_up.res3.0.conv2.weight"]
    np.testing.assert_allclose(
        np.asarray(params["backbone"]["res3"][0]["conv2"]["w"]),
        np.transpose(w_t, (2, 3, 1, 0)),
    )


def test_caffe2_name_conversion():
    rng = np.random.RandomState(0)
    sd = {
        "conv1_w": rng.randn(64, 3, 7, 7).astype(np.float32),
        "res_conv1_bn_s": rng.rand(64).astype(np.float32),
        "res_conv1_bn_b": rng.randn(64).astype(np.float32),
        "res2_0_branch2a_w": rng.randn(64, 64, 1, 1).astype(np.float32),
        "res2_0_branch2a_bn_s": rng.rand(64).astype(np.float32),
        "res2_0_branch2a_bn_b": rng.randn(64).astype(np.float32),
        "res2_0_branch1_w": rng.randn(256, 64, 1, 1).astype(np.float32),
        "res2_0_branch1_bn_s": rng.rand(256).astype(np.float32),
        "res2_0_branch1_bn_b": rng.randn(256).astype(np.float32),
    }
    out = convert_caffe2_names(sd)
    assert "backbone.bottom_up.stem.conv1.weight" in out
    assert "backbone.bottom_up.stem.conv1.norm.weight" in out
    assert "backbone.bottom_up.res2.0.conv1.weight" in out
    assert "backbone.bottom_up.res2.0.shortcut.weight" in out
    # synthesized running stats for folded BNs
    assert "backbone.bottom_up.res2.0.conv1.norm.running_mean" in out


def test_orbax_roundtrip(tmp_path):
    tree = {
        "a": jnp.arange(12.0).reshape(3, 4),
        "nested": {"b": jnp.ones((2, 2)), "c": [jnp.zeros(3), jnp.full((2,), 7.0)]},
    }
    save_pytree(str(tmp_path / "ckpt"), tree)
    restored = restore_pytree(str(tmp_path / "ckpt"), jax.tree_util.tree_map(np.zeros_like, tree))
    for a, b in zip(jax.tree_util.tree_leaves(tree), jax.tree_util.tree_leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_checkpoint_manager_best_and_periodic(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpts"), max_to_keep=2, higher_is_better=True)
    params = {"w": jnp.ones((2, 2))}
    for step, metric in [(100, 0.5), (200, 0.7), (300, 0.6)]:
        mgr.save(step, {"params": params, "step": jnp.asarray(step)})
        mgr.save_best(step, metric, params)
    assert mgr.best_metric == 0.7
    assert mgr.latest_step() == 300
    # only 2 periodic kept
    restored = mgr.restore_latest({"params": {"w": np.zeros((2, 2))}, "step": np.asarray(0)})
    assert int(restored["step"]) == 300
    best = mgr.restore_best({"w": np.zeros((2, 2))})
    np.testing.assert_allclose(np.asarray(best["w"]), 1.0)


def test_url_scheme_resolution(tmp_path, monkeypatch):
    """detectron2:// and catalog:// resolve through cache, then zoo mirror
    (reference checkpoint/catalog.py:92-130 PathHandlers)."""
    from proben_tpu.checkpoint import catalog_entry_url, resolve_checkpoint_path

    # catalog name -> legacy caffe2 URL (reference ModelCatalog.get)
    url = catalog_entry_url("ImageNetPretrained/MSRA/R-50.pkl")
    assert url == "https://dl.fbaipublicfiles.com/detectron/ImageNetPretrained/MSRA/R-50.pkl"
    url2 = catalog_entry_url("Caffe2Detectron/COCO/35857345/e2e_faster_rcnn_R-50-FPN_1x")
    assert url2.endswith("/output/train/coco_2014_train%3Acoco_2014_valminusminival/generalized_rcnn/model_final.pkl")

    cache = tmp_path / "cache"
    zoo = tmp_path / "zoo"
    zoo.mkdir()
    monkeypatch.setenv("PROBEN_CACHE_DIR", str(cache))
    monkeypatch.setenv("PROBEN_ZOO_DIR", str(zoo))

    # cache hit: pre-place the file at the URL-path location
    target = cache / "detectron2" / "COCO-Detection" / "x" / "model_final_1.pkl"
    target.parent.mkdir(parents=True)
    target.write_bytes(b"hi")
    got = resolve_checkpoint_path("detectron2://COCO-Detection/x/model_final_1.pkl")
    assert got == str(target)

    # zoo-mirror hit by basename (unambiguous name -> fallback allowed)
    (zoo / "R-50.pkl").write_bytes(b"zoo")
    got = resolve_checkpoint_path("catalog://ImageNetPretrained/MSRA/R-50.pkl")
    assert got == str(zoo / "R-50.pkl")

    # generic model_final.pkl basenames MUST NOT resolve by basename —
    # every catalog:// Caffe2 baseline ends in model_final.pkl, so a
    # basename key could serve the wrong model's weights (advisor finding)
    (zoo / "model_final.pkl").write_bytes(b"ambiguous")
    with pytest.raises(FileNotFoundError):
        resolve_checkpoint_path(
            "catalog://Caffe2Detectron/COCO/35857345/e2e_faster_rcnn_R-50-FPN_1x"
        )
    # ...but the collision-free parent-dir__basename key does resolve
    (zoo / "generalized_rcnn__model_final.pkl").write_bytes(b"specific")
    got = resolve_checkpoint_path(
        "catalog://Caffe2Detectron/COCO/35857345/e2e_faster_rcnn_R-50-FPN_1x"
    )
    assert got == str(zoo / "generalized_rcnn__model_final.pkl")

    # offline miss -> actionable FileNotFoundError
    with pytest.raises(FileNotFoundError, match="PROBEN_ZOO_DIR"):
        resolve_checkpoint_path("detectron2://COCO-Detection/missing/model.pkl")

    # local paths pass through untouched
    assert resolve_checkpoint_path("/some/local/file.pth") == "/some/local/file.pth"
