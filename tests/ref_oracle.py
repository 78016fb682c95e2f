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
    _mod("detectron2.config", configurable=lambda f=None, **kw: f if f else (lambda g: g))
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
