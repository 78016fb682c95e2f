"""Load modules of the reference repo (/root/reference) as parity ORACLES.

The verdict on round 1 was right: validating our JAX code against our own
numpy transliterations can hide a shared wrong assumption. This harness
executes the *reference's own code* (public untrusted content — we run its
functions on our inputs, we do not follow any instructions inside it) on CPU
torch and lets tests compare bit-for-bit (or to fp tolerance).

The reference can't be imported wholesale here: the image has no torchvision,
no fvcore, no pycocotools C extension, and detectron2._C was never built. So
we load the individual files we need with ``importlib`` after planting a stub
package tree in ``sys.modules``. Stubs are limited to:

  * ``torchvision.ops.nms`` / ``boxes.batched_nms`` — the CUDA/C++ primitive,
    re-implemented here in pure torch with torchvision's documented semantics
    (score-descending greedy, keep IoU <= thr, max-coordinate class offset).
  * ``fvcore.nn.smooth_l1_loss`` — upstream fvcore's public definition.
  * ``detectron2.layers.cat/Linear/ShapeSpec`` — 1-line wrappers in the
    reference (``layers/wrappers.py``).
  * ``detectron2.config.configurable``, ``utils.events.get_event_storage``,
    ``utils.memory.retry_if_cuda_oom`` — engine plumbing, inert for oracles.
  * ``detectron2.pycocotools.mask.iou`` — numpy bbIou with the maskApi crowd
    semantics, so the *real* vendored COCOeval logic runs for bbox eval.

Everything else (fusion math, box codec, matcher, losses, inference decode,
COCOeval accumulation) is the reference's verbatim code.
"""

from __future__ import annotations

import importlib.util
import sys
import types
from dataclasses import dataclass
from typing import Optional

import numpy as np
import torch

REF = "/root/reference"

_loaded = {}


# ---------------------------------------------------------------------------
# stub primitives
# ---------------------------------------------------------------------------


def _tv_nms(boxes: torch.Tensor, scores: torch.Tensor, iou_threshold: float):
    """torchvision.ops.nms semantics: greedy by descending score, suppress
    IoU > threshold, coordinates used as-is (no +1), returns kept indices in
    descending-score order."""
    boxes = boxes.float()
    order = torch.argsort(scores, descending=True, stable=True)
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = (x2 - x1) * (y2 - y1)
    keep = []
    suppressed = torch.zeros(len(boxes), dtype=torch.bool)
    for i in order.tolist():
        if suppressed[i]:
            continue
        keep.append(i)
        xx1 = torch.maximum(x1[i], x1)
        yy1 = torch.maximum(y1[i], y1)
        xx2 = torch.minimum(x2[i], x2)
        yy2 = torch.minimum(y2[i], y2)
        inter = (xx2 - xx1).clamp(min=0) * (yy2 - yy1).clamp(min=0)
        union = areas[i] + areas - inter
        iou = torch.where(union > 0, inter / union, torch.zeros_like(union))
        newly = iou > iou_threshold
        newly[i] = False
        suppressed |= newly
    return torch.as_tensor(keep, dtype=torch.int64)


def _tv_batched_nms(boxes, scores, idxs, iou_threshold):
    """torchvision.ops.boxes.batched_nms: per-class via max-coordinate offset."""
    if boxes.numel() == 0:
        return torch.empty((0,), dtype=torch.int64)
    max_coordinate = boxes.max()
    offsets = idxs.to(boxes) * (max_coordinate + torch.tensor(1).to(boxes))
    boxes_for_nms = boxes + offsets[:, None]
    return _tv_nms(boxes_for_nms, scores, iou_threshold)


def _fvcore_smooth_l1_loss(input, target, beta: float, reduction: str = "none"):
    """fvcore.nn.smooth_l1_loss (upstream public definition)."""
    if beta < 1e-5:
        loss = torch.abs(input - target)
    else:
        n = torch.abs(input - target)
        cond = n < beta
        loss = torch.where(cond, 0.5 * n ** 2 / beta, n - 0.5 * beta)
    if reduction == "mean":
        loss = loss.mean()
    elif reduction == "sum":
        loss = loss.sum()
    return loss


def _bb_iou(dt: np.ndarray, gt: np.ndarray, iscrowd) -> np.ndarray:
    """pycocotools maskUtils.iou for bbox lists (maskApi.c bbIou semantics):
    xywh boxes; iou = inter/union, crowd gt -> inter/dt_area."""
    dt = np.asarray(dt, np.float64).reshape(-1, 4)
    gt = np.asarray(gt, np.float64).reshape(-1, 4)
    iscrowd = np.asarray(iscrowd, bool).reshape(-1)
    ious = np.zeros((len(dt), len(gt)))
    for j, g in enumerate(gt):
        gx1, gy1, gw, gh = g
        ga = gw * gh
        for i, d in enumerate(dt):
            dx1, dy1, dw, dh = d
            da = dw * dh
            iw = min(dx1 + dw, gx1 + gw) - max(dx1, gx1)
            ih = min(dy1 + dh, gy1 + gh) - max(dy1, gy1)
            if iw <= 0 or ih <= 0:
                continue
            inter = iw * ih
            union = da if iscrowd[j] else da + ga - inter
            ious[i, j] = inter / union
    return ious


@dataclass
class _ShapeSpec:
    channels: Optional[int] = None
    height: Optional[int] = None
    width: Optional[int] = None
    stride: Optional[int] = None


class _EventStorage:
    def put_scalar(self, *a, **k):
        pass

    def put_scalars(self, *a, **k):
        pass


def _cat(tensors, dim=0):
    # reference layers/wrappers.py cat
    assert isinstance(tensors, (list, tuple))
    if len(tensors) == 1:
        return tensors[0]
    return torch.cat(tensors, dim)


def _configurable(init_func):
    """Functional re-implementation of detectron2.config.configurable
    (reference config/config.py:33): when the decorated ``__init__`` is
    called with a cfg as the first positional arg, route through the class's
    ``from_config`` to build the explicit kwargs."""
    import functools

    @functools.wraps(init_func)
    def wrapped(self, *args, **kwargs):
        if args and (hasattr(args[0], "MODEL") or hasattr(args[0], "defrost")):
            explicit = type(self).from_config(args[0], *args[1:], **kwargs)
            init_func(self, **explicit)
        else:
            init_func(self, *args, **kwargs)

    return wrapped


# ---------------------------------------------------------------------------
# module loading
# ---------------------------------------------------------------------------


def _mod(name: str, **attrs) -> types.ModuleType:
    m = sys.modules.get(name)
    if m is None:
        m = types.ModuleType(name)
        sys.modules[name] = m
    for k, v in attrs.items():
        setattr(m, k, v)
    # attach to parent package
    if "." in name:
        parent, leaf = name.rsplit(".", 1)
        if parent in sys.modules:
            setattr(sys.modules[parent], leaf, m)
    return m


def _load_file(name: str, path: str) -> types.ModuleType:
    if name in _loaded:
        return _loaded[name]
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    try:
        spec.loader.exec_module(mod)
    except Exception:
        del sys.modules[name]
        raise
    _loaded[name] = mod
    if "." in name:
        parent, leaf = name.rsplit(".", 1)
        if parent in sys.modules:
            setattr(sys.modules[parent], leaf, mod)
    return mod


def _plant_stubs():
    if "detectron2" in sys.modules and getattr(
        sys.modules["detectron2"], "__ref_oracle__", False
    ):
        return

    # the 2020-era vendored pycocotools uses np.float/np.int/np.bool,
    # removed in numpy>=1.24; restore the aliases (they were exact aliases
    # of the builtins, semantics unchanged). Test-process only.
    for alias, builtin in (("float", float), ("int", int), ("bool", bool)):
        if not hasattr(np, alias):
            setattr(np, alias, builtin)

    # torchvision
    tv = _mod("torchvision")
    ops = _mod("torchvision.ops", nms=_tv_nms)
    bx = _mod("torchvision.ops.boxes", nms=_tv_nms, batched_nms=_tv_batched_nms)
    ops.boxes = bx
    tv.ops = ops

    # fvcore
    _mod("fvcore")
    _mod("fvcore.nn", smooth_l1_loss=_fvcore_smooth_l1_loss)

    # detectron2 package skeleton
    d2 = _mod("detectron2", __ref_oracle__=True)
    d2.__path__ = []  # mark as package
    _mod("detectron2.config", configurable=_configurable)
    layers = _mod(
        "detectron2.layers",
        cat=_cat,
        Linear=torch.nn.Linear,
        ShapeSpec=_ShapeSpec,
    )
    layers.__path__ = []
    structures = _mod("detectron2.structures")
    structures.__path__ = []
    utils = _mod("detectron2.utils")
    utils.__path__ = []
    _mod("detectron2.utils.events", get_event_storage=lambda: _EventStorage())
    _mod("detectron2.utils.memory", retry_if_cuda_oom=lambda f: f)
    modeling = _mod("detectron2.modeling")
    modeling.__path__ = []
    _mod("detectron2.modeling.roi_heads").__path__ = []
    _mod("detectron2.modeling.proposal_generator").__path__ = []
    pct = _mod("detectron2.pycocotools")
    pct.__path__ = []
    _mod("detectron2.pycocotools.mask", iou=_bb_iou)

    # demo_probEn import-time-only deps
    _mod(
        "detectron2.data",
        DatasetCatalog=object(),
        MetadataCatalog=object(),
    ).__path__ = []
    _mod("detectron2.data.datasets", register_coco_instances=lambda *a, **k: None)
    _mod("detectron2.evaluation", FLIREvaluator=object).__path__ = []
    _mod("detectron2.utils.opt", config_parser=lambda *a, **k: None)
    sys.modules["detectron2.config"].get_cfg = lambda: None


def load():
    """Load and return a namespace of reference oracle modules."""
    _plant_stubs()
    ns = types.SimpleNamespace()

    # real reference layers/nms.py (the class-offset batched_nms used by
    # demo_probEn's nms_1 and by fast_rcnn inference)
    ns.nms = _load_file("detectron2.layers.nms", f"{REF}/detectron2/layers/nms.py")
    sys.modules["detectron2.layers"].batched_nms = ns.nms.batched_nms

    # real structures (Boxes/Instances/pairwise_iou/ImageList)
    boxes_mod = _load_file(
        "detectron2.structures.boxes", f"{REF}/detectron2/structures/boxes.py"
    )
    inst_mod = _load_file(
        "detectron2.structures.instances", f"{REF}/detectron2/structures/instances.py"
    )
    il_mod = _load_file(
        "detectron2.structures.image_list", f"{REF}/detectron2/structures/image_list.py"
    )
    st = sys.modules["detectron2.structures"]
    st.Boxes = boxes_mod.Boxes
    st.BoxMode = boxes_mod.BoxMode
    st.pairwise_iou = boxes_mod.pairwise_iou
    st.Instances = inst_mod.Instances
    st.ImageList = il_mod.ImageList
    ns.structures = st

    # real box codec / matcher / sampling
    try:
        ns.box_regression = _load_file(
            "detectron2.modeling.box_regression",
            f"{REF}/detectron2/modeling/box_regression.py",
        )
    except Exception:
        # torch.jit.script of the 2020-era class can fail on newer torch;
        # scripting is a pure compilation step, semantics unchanged.
        orig = torch.jit.script
        torch.jit.script = lambda obj, *a, **k: obj
        try:
            ns.box_regression = _load_file(
                "detectron2.modeling.box_regression",
                f"{REF}/detectron2/modeling/box_regression.py",
            )
        finally:
            torch.jit.script = orig
    ns.matcher = _load_file(
        "detectron2.modeling.matcher", f"{REF}/detectron2/modeling/matcher.py"
    )
    ns.sampling = _load_file(
        "detectron2.modeling.sampling", f"{REF}/detectron2/modeling/sampling.py"
    )
    sys.modules["detectron2.modeling"].box_regression = ns.box_regression

    # real fast_rcnn (losses + inference decode + output layers)
    ns.fast_rcnn = _load_file(
        "detectron2.modeling.roi_heads.fast_rcnn",
        f"{REF}/detectron2/modeling/roi_heads/fast_rcnn.py",
    )

    # real RPN outputs (losses); relative ..sampling resolves to the module
    # planted above
    ns.rpn_outputs = _load_file(
        "detectron2.modeling.proposal_generator.rpn_outputs",
        f"{REF}/detectron2/modeling/proposal_generator/rpn_outputs.py",
    )

    # real anchor generator needs registry/config; skip (golden-tested instead)

    # real vendored COCOeval (bbox path runs fully on the numpy bbIou stub)
    ns.coco = _load_file(
        "detectron2.pycocotools.coco", f"{REF}/detectron2/pycocotools/coco.py"
    )
    ns.cocoeval = _load_file(
        "detectron2.pycocotools.cocoeval", f"{REF}/detectron2/pycocotools/cocoeval.py"
    )

    # the ProbEn fusion demo itself (pure numpy + torch; uses batched_nms)
    ns.proben = _load_file("ref_demo_proben", f"{REF}/demo/FLIR/demo_probEn.py")

    return ns


_ns = None


def get():
    global _ns
    if _ns is None:
        _ns = load()
    return _ns


# ---------------------------------------------------------------------------
# composed full model (round-3): the reference's GeneralizedRCNN graph
# ---------------------------------------------------------------------------


class _Registry:
    """Minimal detectron2.utils.registry.Registry (decorator + get)."""

    def __init__(self, name):
        self._name = name
        self._map = {}

    def register(self, obj=None):
        if obj is None:
            def deco(cls):
                self._map[cls.__name__] = cls
                return cls

            return deco
        self._map[obj.__name__] = obj
        return obj

    def get(self, name):
        return self._map[name]


def _c2_msra_fill(module):
    torch.nn.init.kaiming_normal_(module.weight, mode="fan_out", nonlinearity="relu")
    if module.bias is not None:
        torch.nn.init.constant_(module.bias, 0)


def _c2_xavier_fill(module):
    torch.nn.init.kaiming_uniform_(module.weight, a=1)
    if module.bias is not None:
        torch.nn.init.constant_(module.bias, 0)


def _bilinear_grid(feat, ys, xs):
    """Vectorized ROIAlign bilinear sampling (ROIAlign_cuda.cu:19-66
    semantics): feat (C, H, W); ys (M,), xs (K,) -> (C, M, K); points with
    y < -1 | y > H | x < -1 | x > W contribute exactly 0."""
    C, H, W = feat.shape
    vy = (ys >= -1.0) & (ys <= H)
    vx = (xs >= -1.0) & (xs <= W)
    y = ys.clamp(min=0.0)
    x = xs.clamp(min=0.0)
    y0 = y.floor().long()
    x0 = x.floor().long()
    top_y = y0 >= H - 1
    top_x = x0 >= W - 1
    y0 = torch.where(top_y, torch.full_like(y0, H - 1), y0)
    x0 = torch.where(top_x, torch.full_like(x0, W - 1), x0)
    y1 = torch.where(top_y, y0, y0 + 1)
    x1 = torch.where(top_x, x0, x0 + 1)
    ly = torch.where(top_y, torch.zeros_like(y), y - y0.to(y.dtype))
    lx = torch.where(top_x, torch.zeros_like(x), x - x0.to(x.dtype))
    hy, hx = 1.0 - ly, 1.0 - lx
    # gather the four corners: (C, M, K)
    f00 = feat[:, y0][:, :, x0]
    f01 = feat[:, y0][:, :, x1]
    f10 = feat[:, y1][:, :, x0]
    f11 = feat[:, y1][:, :, x1]
    w00 = (hy[:, None] * hx[None, :])[None]
    w01 = (hy[:, None] * lx[None, :])[None]
    w10 = (ly[:, None] * hx[None, :])[None]
    w11 = (ly[:, None] * lx[None, :])[None]
    out = f00 * w00 + f01 * w01 + f10 * w10 + f11 * w11
    mask = (vy[:, None] & vx[None, :]).to(feat.dtype)[None]
    return out * mask


class _ROIAlignStub(torch.nn.Module):
    """Pure-torch ROIAlign with the reference CUDA kernel's exact semantics
    (aligned=True V2, adaptive sampling_ratio=0 -> ceil(roi/P) per RoI;
    reference layers/csrc/ROIAlign/ROIAlign_cuda.cu:68-140). Used as the
    ``detectron2.layers.ROIAlign`` stub so the real poolers.py/roi_heads.py
    composition can run on CPU without the _C extension."""

    def __init__(self, output_size, spatial_scale, sampling_ratio, aligned=True):
        super().__init__()
        self.output_size = (
            output_size if isinstance(output_size, (tuple, list))
            else (output_size, output_size)
        )
        self.spatial_scale = spatial_scale
        self.sampling_ratio = sampling_ratio
        self.aligned = aligned

    def forward(self, x, rois):
        P_h, P_w = self.output_size
        N, C, H, W = x.shape
        out = x.new_zeros((len(rois), C, P_h, P_w))
        offset = 0.5 if self.aligned else 0.0
        for r in range(len(rois)):
            b = int(rois[r, 0])
            x1 = rois[r, 1] * self.spatial_scale - offset
            y1 = rois[r, 2] * self.spatial_scale - offset
            x2 = rois[r, 3] * self.spatial_scale - offset
            y2 = rois[r, 4] * self.spatial_scale - offset
            rw, rh = x2 - x1, y2 - y1
            if not self.aligned:
                rw = rw.clamp(min=1.0)
                rh = rh.clamp(min=1.0)
            bin_w, bin_h = rw / P_w, rh / P_h
            gh = (
                self.sampling_ratio
                if self.sampling_ratio > 0
                else int(torch.ceil(rh / P_h).item())
            )
            gw = (
                self.sampling_ratio
                if self.sampling_ratio > 0
                else int(torch.ceil(rw / P_w).item())
            )
            count = max(gh * gw, 1)
            if gh <= 0 or gw <= 0:
                continue
            py = torch.arange(P_h, dtype=x.dtype)
            iy = (torch.arange(gh, dtype=x.dtype) + 0.5) / gh
            ys = (y1 + (py[:, None] + iy[None, :]) * bin_h).reshape(-1)
            px = torch.arange(P_w, dtype=x.dtype)
            ix = (torch.arange(gw, dtype=x.dtype) + 0.5) / gw
            xs = (x1 + (px[:, None] + ix[None, :]) * bin_w).reshape(-1)
            vals = _bilinear_grid(x[b], ys, xs)  # (C, P_h*gh, P_w*gw)
            vals = vals.reshape(C, P_h, gh, P_w, gw).sum(dim=(2, 4)) / count
            out[r] = vals
        return out


class _MiniCfgNode(types.SimpleNamespace):
    def clone(self):
        import copy

        return copy.deepcopy(self)


def _to_cfg(d):
    if isinstance(d, dict):
        return _MiniCfgNode(**{k: _to_cfg(v) for k, v in d.items()})
    return d


def make_ref_cfg(num_classes=3, depth=50, pre_nms_topk_test=1000,
                 post_nms_topk_test=1000, detections_per_image=100,
                 score_thresh=0.05, input_format="BGR", num_in_channels=3,
                 pixel_mean=None, pixel_std=None):
    """R50/R101-FPN GeneralizedRCNN config with the reference's default
    values (reference config/defaults.py), as a minimal attribute tree —
    yacs isn't installed here and only these keys are read by the modules
    under test. ``input_format``/``num_in_channels``/``pixel_mean`` select
    the fork's multimodal variants (BGRT early fusion, BGRTTT dual-backbone
    middle fusion — reference meta_arch/rcnn.py:34-66)."""
    if pixel_mean is None:
        pixel_mean = [103.53, 116.28, 123.675]
        if num_in_channels > 3:
            pixel_mean = pixel_mean + [135.438] * (num_in_channels - 3)
    if pixel_std is None:
        # rcnn.py:76 asserts len(PIXEL_MEAN) == len(PIXEL_STD); the BGRTTT
        # branch then reads only PIXEL_STD[:3] (shared std)
        pixel_std = [1.0] * len(pixel_mean)
    return _to_cfg({
        "VIS_PERIOD": 0,
        "INPUT": {"FORMAT": input_format, "NUM_IN_CHANNELS": num_in_channels},
        "TEST": {"DETECTIONS_PER_IMAGE": detections_per_image},
        "MODEL": {
            "DEVICE": "cpu",
            "MASK_ON": False,
            "KEYPOINT_ON": False,
            "LOAD_PROPOSALS": False,
            "BLUR_RGB": False,
            "MAX_POOL_RGB": False,
            "PIXEL_MEAN": list(pixel_mean),
            "PIXEL_STD": list(pixel_std),
            "BACKBONE": {"NAME": "build_resnet_fpn_backbone", "FREEZE_AT": 0},
            "RESNETS": {
                "DEPTH": depth, "NORM": "FrozenBN", "NUM_GROUPS": 1,
                "WIDTH_PER_GROUP": 64, "STEM_OUT_CHANNELS": 64,
                "RES2_OUT_CHANNELS": 256, "RES5_DILATION": 1,
                "STRIDE_IN_1X1": True,
                "OUT_FEATURES": ["res2", "res3", "res4", "res5"],
                "DEFORM_ON_PER_STAGE": [False, False, False, False],
                "DEFORM_MODULATED": False, "DEFORM_NUM_GROUPS": 1,
            },
            "FPN": {
                "IN_FEATURES": ["res2", "res3", "res4", "res5"],
                "OUT_CHANNELS": 256, "NORM": "", "FUSE_TYPE": "sum",
            },
            "ANCHOR_GENERATOR": {
                "NAME": "DefaultAnchorGenerator",
                "SIZES": [[32], [64], [128], [256], [512]],
                "ASPECT_RATIOS": [[0.5, 1.0, 2.0]],
                "ANGLES": [[-90, 0, 90]], "OFFSET": 0.0,
            },
            "PROPOSAL_GENERATOR": {"NAME": "RPN", "MIN_SIZE": 0},
            "RPN": {
                "HEAD_NAME": "StandardRPNHead",
                "IN_FEATURES": ["p2", "p3", "p4", "p5", "p6"],
                "IOU_THRESHOLDS": [0.3, 0.7], "IOU_LABELS": [0, -1, 1],
                "BATCH_SIZE_PER_IMAGE": 256, "POSITIVE_FRACTION": 0.5,
                "BBOX_REG_WEIGHTS": (1.0, 1.0, 1.0, 1.0),
                "SMOOTH_L1_BETA": 0.0, "LOSS_WEIGHT": 1.0,
                "PRE_NMS_TOPK_TRAIN": 2000, "PRE_NMS_TOPK_TEST": pre_nms_topk_test,
                "POST_NMS_TOPK_TRAIN": 1000, "POST_NMS_TOPK_TEST": post_nms_topk_test,
                "NMS_THRESH": 0.7, "BOUNDARY_THRESH": -1,
            },
            "ROI_HEADS": {
                "NAME": "StandardROIHeads", "NUM_CLASSES": num_classes,
                "IN_FEATURES": ["p2", "p3", "p4", "p5"],
                "IOU_THRESHOLDS": [0.5], "IOU_LABELS": [0, 1],
                "BATCH_SIZE_PER_IMAGE": 512, "POSITIVE_FRACTION": 0.25,
                "SCORE_THRESH_TEST": score_thresh, "NMS_THRESH_TEST": 0.5,
                "PROPOSAL_APPEND_GT": True, "ENABLE_GAUSSIANNLLOSS": False,
            },
            "ROI_BOX_HEAD": {
                "NAME": "FastRCNNConvFCHead", "NUM_FC": 2, "FC_DIM": 1024,
                "NUM_CONV": 0, "CONV_DIM": 256, "NORM": "",
                "POOLER_RESOLUTION": 7, "POOLER_SAMPLING_RATIO": 0,
                "POOLER_TYPE": "ROIAlignV2",
                "BBOX_REG_WEIGHTS": (10.0, 10.0, 5.0, 5.0),
                "SMOOTH_L1_BETA": 0.0, "CLS_AGNOSTIC_BBOX_REG": False,
                "TRAIN_ON_PRED_BOXES": False, "OUTPUT_LOGITS": False,
            },
            "ROI_MASK_HEAD": {
                "POOLER_RESOLUTION": 14, "POOLER_SAMPLING_RATIO": 0,
                "POOLER_TYPE": "ROIAlignV2",
            },
            "ROI_KEYPOINT_HEAD": {
                "POOLER_RESOLUTION": 14, "POOLER_SAMPLING_RATIO": 0,
                "POOLER_TYPE": "ROIAlignV2",
            },
        },
    })


def load_full_model():
    """Load the reference's COMPOSED GeneralizedRCNN graph — real resnet.py,
    fpn.py, anchor_generator.py, rpn.py, poolers.py, box_head.py,
    roi_heads.py, postprocessing.py, meta_arch/rcnn.py — with only the
    C-extension primitives stubbed (ROIAlign above, torchvision NMS,
    registries). Returns a namespace with GeneralizedRCNN + make_ref_cfg."""
    get()  # base stubs + shared modules (structures, fast_rcnn, rpn_outputs)

    # extra stubs ------------------------------------------------------------
    _mod("fvcore.nn.weight_init", c2_msra_fill=_c2_msra_fill,
         c2_xavier_fill=_c2_xavier_fill)
    sys.modules["fvcore.nn"].weight_init = sys.modules["fvcore.nn.weight_init"]
    _mod("detectron2.utils.registry", Registry=_Registry)
    _mod("detectron2.utils.logger", log_first_n=lambda *a, **k: None)
    _mod("detectron2.utils.comm",
         get_world_size=lambda: 1, is_main_process=lambda: True)

    class _RoIPoolStub(torch.nn.Module):  # torchvision.ops.RoIPool, unused
        def __init__(self, *a, **k):
            super().__init__()

    sys.modules["torchvision.ops"].RoIPool = _RoIPoolStub

    # real layer wrappers (Conv2d with norm/activation, interpolate, ...)
    wrappers = _load_file(
        "detectron2.layers.wrappers", f"{REF}/detectron2/layers/wrappers.py"
    )
    bn = _load_file(
        "detectron2.layers.batch_norm", f"{REF}/detectron2/layers/batch_norm.py"
    )
    layers = sys.modules["detectron2.layers"]
    for name in ("Conv2d", "ConvTranspose2d", "BatchNorm2d", "interpolate", "Linear"):
        setattr(layers, name, getattr(wrappers, name))
    layers.get_norm = bn.get_norm
    layers.FrozenBatchNorm2d = bn.FrozenBatchNorm2d
    layers.NaiveSyncBatchNorm = bn.NaiveSyncBatchNorm
    layers.ROIAlign = _ROIAlignStub
    layers.ROIAlignRotated = _RoIPoolStub  # imported by poolers, never built
    layers.DeformConv = _RoIPoolStub  # imported by resnet, only built when
    layers.ModulatedDeformConv = _RoIPoolStub  # DEFORM_ON_PER_STAGE is set
    layers.paste_masks_in_image = lambda *a, **k: None

    # structures: RotatedBoxes referenced by anchor_generator's rotated class
    sys.modules["detectron2.structures"].RotatedBoxes = type(
        "RotatedBoxes", (), {}
    )

    ns = types.SimpleNamespace()

    # backbone family ---------------------------------------------------------
    _mod("detectron2.modeling.backbone").__path__ = []
    _load_file(
        "detectron2.modeling.backbone.backbone",
        f"{REF}/detectron2/modeling/backbone/backbone.py",
    )
    bbuild = _load_file(
        "detectron2.modeling.backbone.build",
        f"{REF}/detectron2/modeling/backbone/build.py",
    )
    ns.resnet = _load_file(
        "detectron2.modeling.backbone.resnet",
        f"{REF}/detectron2/modeling/backbone/resnet.py",
    )
    ns.fpn = _load_file(
        "detectron2.modeling.backbone.fpn",
        f"{REF}/detectron2/modeling/backbone/fpn.py",
    )
    mb = sys.modules["detectron2.modeling.backbone"]
    mb.build_backbone = bbuild.build_backbone
    mb.Backbone = sys.modules["detectron2.modeling.backbone.backbone"].Backbone

    # anchor generator ---------------------------------------------------------
    ns.anchor_generator = _load_file(
        "detectron2.modeling.anchor_generator",
        f"{REF}/detectron2/modeling/anchor_generator.py",
    )

    # proposal generator --------------------------------------------------------
    pg_registry = _Registry("PROPOSAL_GENERATOR")
    _mod(
        "detectron2.modeling.proposal_generator.build",
        PROPOSAL_GENERATOR_REGISTRY=pg_registry,
        build_proposal_generator=lambda cfg, input_shape: pg_registry.get(
            cfg.MODEL.PROPOSAL_GENERATOR.NAME
        )(cfg, input_shape),
    )
    _load_file(
        "detectron2.modeling.proposal_generator.proposal_utils",
        f"{REF}/detectron2/modeling/proposal_generator/proposal_utils.py",
    )
    ns.rpn = _load_file(
        "detectron2.modeling.proposal_generator.rpn",
        f"{REF}/detectron2/modeling/proposal_generator/rpn.py",
    )
    pg = sys.modules["detectron2.modeling.proposal_generator"]
    pg.build_proposal_generator = sys.modules[
        "detectron2.modeling.proposal_generator.build"
    ].build_proposal_generator

    # roi heads -------------------------------------------------------------------
    ns.poolers = _load_file(
        "detectron2.modeling.poolers", f"{REF}/detectron2/modeling/poolers.py"
    )
    sys.modules["detectron2.modeling"].poolers = ns.poolers
    ns.box_head = _load_file(
        "detectron2.modeling.roi_heads.box_head",
        f"{REF}/detectron2/modeling/roi_heads/box_head.py",
    )
    _mod(
        "detectron2.modeling.roi_heads.keypoint_head",
        build_keypoint_head=lambda *a, **k: None,
    )
    _mod(
        "detectron2.modeling.roi_heads.mask_head",
        build_mask_head=lambda *a, **k: None,
    )
    ns.roi_heads = _load_file(
        "detectron2.modeling.roi_heads.roi_heads",
        f"{REF}/detectron2/modeling/roi_heads/roi_heads.py",
    )
    rh = sys.modules["detectron2.modeling.roi_heads"]
    rh.build_roi_heads = ns.roi_heads.build_roi_heads

    # meta arch ---------------------------------------------------------------------
    ns.postprocessing = _load_file(
        "detectron2.modeling.postprocessing",
        f"{REF}/detectron2/modeling/postprocessing.py",
    )
    sys.modules["detectron2.modeling"].postprocessing = ns.postprocessing
    _mod("detectron2.modeling.meta_arch").__path__ = []
    _mod(
        "detectron2.modeling.meta_arch.build",
        META_ARCH_REGISTRY=_Registry("META_ARCH"),
    )
    _load_file(
        "detectron2.modeling.meta_arch.gaussian_blur",
        f"{REF}/detectron2/modeling/meta_arch/gaussian_blur.py",
    )
    ns.rcnn = _load_file(
        "detectron2.modeling.meta_arch.rcnn",
        f"{REF}/detectron2/modeling/meta_arch/rcnn.py",
    )
    ns.GeneralizedRCNN = ns.rcnn.GeneralizedRCNN
    ns.make_ref_cfg = make_ref_cfg
    return ns


_full_ns = None


def get_full():
    global _full_ns
    if _full_ns is None:
        _full_ns = load_full_model()
    return _full_ns
