"""Cross-validation of the KAIST LAMR evaluator against an INDEPENDENT
transliteration of the published Caltech/KAIST protocol.

The reference repo imports an evalKAIST package that is absent from it
(SURVEY §2.1), so `proben_tpu/evaluation/kaist.py` was built from the
protocol. This file guards against shared-assumption bugs by implementing the
protocol a second time, directly from the published algorithm (Dollár et al.,
"Pedestrian Detection: An Evaluation of the State of the Art", PAMI 2012 —
the bbGt.evalRes matching + dbEval.compRoc log-average sampling the KAIST
devkit reuses), and checking both agree to 1e-9 on randomized det/gt sets
with ignore regions, occlusion levels, small boxes, and day/night splits —
plus one hand-computed exact value.

Protocol facts encoded here (independent of our evaluator's code):
  * reasonable GT = person, bbox height >= 55, occlusion in {0, 1};
    everything else (incl. other categories and explicit ignore flags) is an
    IGNORE region, matched by intersection-over-detection-area.
  * per image, detections in descending score order greedily claim the
    unmatched reasonable GT with max IoU >= 0.5; failing that, any ignore
    region with IoA >= 0.5 marks the detection ignored (neither TP nor FP);
    ignore regions may absorb any number of detections.
  * curve: sweep detections globally by score; FPPI = cumFP / nImages,
    MR = 1 - cumTP / nReasonableGT, with an implicit starting point
    (FPPI=0, MR=1); LAMR = exp(mean(log(max(mr, 1e-10)))) over the MR at the
    last curve point with FPPI <= ref, for ref in logspace(-2, 0, 9).
"""

import numpy as np

from proben_tpu.evaluation.kaist import FPPI_REFS, KAISTEvaluator


def _iou(d, g):
    ix = max(0.0, min(d[0] + d[2], g[0] + g[2]) - max(d[0], g[0]))
    iy = max(0.0, min(d[1] + d[3], g[1] + g[3]) - max(d[1], g[1]))
    inter = ix * iy
    return inter / (d[2] * d[3] + g[2] * g[3] - inter + 1e-12)


def _ioa(d, g):
    ix = max(0.0, min(d[0] + d[2], g[0] + g[2]) - max(d[0], g[0]))
    iy = max(0.0, min(d[1] + d[3], g[1] + g[3]) - max(d[1], g[1]))
    return ix * iy / (d[2] * d[3] + 1e-12)


def oracle_lamr(images, annotations, detections, thr=0.5, condition=None):
    """Independent bbGt-style LAMR. images: list of dicts with id/im_name;
    annotations: list of gt dicts; detections: {image_id: (N,5) xywhs}."""

    def cond_of(name):
        num = int(name.split("set")[1][:2])
        return "day" if num <= 8 else "night"

    if condition:
        images = [im for im in images if cond_of(im["im_name"]) == condition]
    img_ids = [im["id"] for im in images]

    n_gt = 0
    rows = []  # (score, is_tp, is_ignored)
    for iid in img_ids:
        gts = [a for a in annotations if a["image_id"] == iid]
        reasonable, ignores = [], []
        for g in gts:
            ok = (
                g.get("category_id", 1) == 1
                and g["bbox"][3] >= 55.0
                and g.get("occlusion", 0) in (0, 1)
                and not g.get("ignore", 0)
            )
            (reasonable if ok else ignores).append(g["bbox"])
        n_gt += len(reasonable)
        dets = detections.get(iid, np.zeros((0, 5)))
        dets = np.asarray(dets, np.float64)
        order = np.argsort(-dets[:, 4], kind="stable") if len(dets) else []
        taken = [False] * len(reasonable)
        for di in order:
            d = dets[di]
            best, besti = thr, -1
            for gi, g in enumerate(reasonable):
                if taken[gi]:
                    continue
                ov = _iou(d, g)
                if ov >= best:
                    best, besti = ov, gi
            if besti >= 0:
                taken[besti] = True
                rows.append((d[4], 1, 0))
            elif any(_ioa(d, g) >= thr for g in ignores):
                rows.append((d[4], 0, 1))
            else:
                rows.append((d[4], 0, 0))

    rows = [r for r in rows if not r[2]]
    rows.sort(key=lambda r: -r[0])
    tp = np.cumsum([r[1] for r in rows])
    fp = np.cumsum([1 - r[1] for r in rows])
    fppi = np.concatenate([[0.0], fp / max(len(img_ids), 1)])
    mr = np.concatenate([[1.0], 1.0 - tp / max(n_gt, 1)])
    if n_gt == 0:
        return float("nan")
    samples = []
    for ref in FPPI_REFS:
        idx = np.where(fppi <= ref)[0]
        samples.append(mr[idx[-1]])
    return float(np.exp(np.mean(np.log(np.maximum(samples, 1e-10)))))


def _random_case(rng, n_img=12, seed_sets=(6, 7, 9, 10)):
    images, annotations, detections = [], [], {}
    for i in range(n_img):
        s = seed_sets[rng.randint(len(seed_sets))]
        images.append(
            {"id": i, "im_name": f"set{s:02d}_V000_I{i:05d}_lwir.png",
             "height": 512, "width": 640}
        )
        for _ in range(rng.randint(0, 4)):
            h = float(rng.choice([30, 54, 55, 80, 120]))
            x, y = rng.rand(2) * 400
            annotations.append(
                {
                    "image_id": i,
                    "category_id": int(rng.choice([1, 1, 1, 2])),
                    "bbox": [float(x), float(y), h * 0.41, h],
                    "height": h,
                    "occlusion": int(rng.choice([0, 0, 1, 2])),
                    "ignore": int(rng.rand() < 0.15),
                }
            )
        dets = []
        for a in annotations:
            if a["image_id"] != i or rng.rand() < 0.3:
                continue
            bx, by, bw, bh = a["bbox"]
            jitter = (rng.rand(4) - 0.5) * np.array([8, 8, 6, 10])
            dets.append([bx + jitter[0], by + jitter[1],
                         max(bw + jitter[2], 4), max(bh + jitter[3], 8),
                         rng.rand()])
        for _ in range(rng.randint(0, 3)):  # pure false positives
            x, y = rng.rand(2) * 500
            dets.append([x, y, 20 + rng.rand() * 30, 50 + rng.rand() * 60,
                         rng.rand()])
        if dets:
            detections[i] = np.array(dets, np.float64)
    return images, annotations, detections


def test_randomized_crosscheck_all_conditions():
    rng = np.random.RandomState(0)
    for trial in range(10):
        images, annotations, detections = _random_case(rng)
        ann = {"images": images, "annotations": annotations}
        ev = KAISTEvaluator(ann)
        res = ev.evaluate_all_conditions(detections)
        for cond in ("all", "day", "night"):
            want = oracle_lamr(
                images, annotations, detections,
                condition=None if cond == "all" else cond,
            )
            got = res[f"lamr_{cond}"] / 100.0
            if np.isnan(want):
                assert np.isnan(got), (trial, cond, got)
            else:
                np.testing.assert_allclose(
                    got, want, atol=1e-9, err_msg=f"trial {trial} cond {cond}"
                )


def test_hand_computed_exact_lamr():
    """4 images, 1 reasonable gt each in 3... detections: TP(.9), FP(.8),
    TP(.7). Curve: (0,1)->(0,.75)->(.25,.75)->(.25,.5). Six refs < 0.25 read
    mr=0.75, three read 0.5 -> LAMR = exp((6 ln .75 + 3 ln .5)/9) = 0.6552."""
    images = [
        {"id": i, "im_name": f"set06_V000_I{i:05d}_lwir.png", "height": 512,
         "width": 640}
        for i in range(4)
    ]
    annotations = [
        {"image_id": i, "category_id": 1, "bbox": [10, 10, 30, 80],
         "height": 80, "occlusion": 0, "ignore": 0}
        for i in range(4)
    ]
    detections = {
        0: np.array([[10, 10, 30, 80, 0.9]]),
        1: np.array([[400, 300, 30, 80, 0.8]]),
        2: np.array([[10, 10, 30, 80, 0.7]]),
    }
    ev = KAISTEvaluator({"images": images, "annotations": annotations})
    got = ev.evaluate(detections)["lamr"]
    want = float(np.exp((6 * np.log(0.75) + 3 * np.log(0.5)) / 9.0))
    np.testing.assert_allclose(got, want, atol=1e-9)
    np.testing.assert_allclose(round(got, 4), 0.6552)
    np.testing.assert_allclose(
        oracle_lamr(images, annotations, detections), want, atol=1e-12
    )
