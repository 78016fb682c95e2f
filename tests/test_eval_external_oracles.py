"""External-oracle pins for the native LVIS / Panoptic-PQ / Cityscapes
scorers (round-2 verdict item 5: these three validated only on
builder-authored fixtures — 'both sides written by the builder').

Same medicine KAIST LAMR got in round 2 (test_kaist_eval_crosscheck.py):

  * CLOSED-FORM fixtures whose expected values are hand-computed here from
    the PUBLISHED definitions (LVIS v1 paper / pycocotools 101-point
    interpolation; Kirillov et al. PQ = sum IoU_TP / (TP + FP/2 + FN/2);
    Cityscapes AP in the regime where the official integration and COCO
    interpolation provably coincide: constant precision envelopes) — the
    numbers in the asserts derive from arithmetic in the comments, not
    from running our code;
  * INDEPENDENT in-repo transliterations (mask/dict loops, structured
    nothing like evaluation/cocoeval.py's vectorized accumulation) for
    randomized cross-checks.
"""

import numpy as np
import pytest

from proben_tpu.evaluation.lvis import LVISEval
from proben_tpu.evaluation.panoptic import PQStat, pq_compute_single

# ---------------------------------------------------------------------------
# LVIS
# ---------------------------------------------------------------------------

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)


def _xywh_iou(d, g):
    dx, dy, dw, dh = d
    gx, gy, gw, gh = g
    iw = min(dx + dw, gx + gw) - max(dx, gx)
    ih = min(dy + dh, gy + gh) - max(dy, gy)
    if iw <= 0 or ih <= 0:
        return 0.0
    inter = iw * ih
    return inter / (dw * dh + gw * gh - inter)


def oracle_lvis_ap(annotations, images, categories, detections,
                   max_dets=300):
    """Independent transliteration of the LVIS v1 bbox protocol (published
    lvis-api algorithm): per-image cross-category score cap, federated
    evaluable-image sets (pos | neg), per-image greedy best-IoU matching in
    score order, 101-point interpolated AP averaged over IoU 0.5:0.95.
    Returns {cat_id: AP in [0, 1]} plus mean recall at max_dets."""
    pos = {c["id"]: set() for c in categories}
    for a in annotations:
        pos[a["category_id"]].add(a["image_id"])
    neg = {c["id"]: set() for c in categories}
    for im in images:
        for c in im.get("neg_category_ids", ()):
            neg[c].add(im["id"])

    by_img = {}
    for d in detections:
        by_img.setdefault(d["image_id"], []).append(d)
    capped = []
    for ds in by_img.values():
        capped.extend(sorted(ds, key=lambda d: -d["score"])[:max_dets])

    ap, rec = {}, {}
    for cat in categories:
        cid = cat["id"]
        evaluable = pos[cid] | neg[cid]
        gts = {}
        for a in annotations:
            if a["category_id"] == cid:
                gts.setdefault(a["image_id"], []).append(a["bbox"])
        n_gt = sum(len(v) for v in gts.values())
        if n_gt == 0:
            continue
        dets = [d for d in capped
                if d["category_id"] == cid and d["image_id"] in evaluable]
        dets.sort(key=lambda d: -d["score"])

        aps, recalls = [], []
        for thr in IOU_THRS:
            # per-image greedy matching in global score order
            matched = {img: [False] * len(g) for img, g in gts.items()}
            flags = []  # (score, is_tp)
            for d in dets:
                g_list = gts.get(d["image_id"], [])
                best, best_j = thr, -1
                for j, g in enumerate(g_list):
                    if matched[d["image_id"]][j]:
                        continue
                    iou = _xywh_iou(d["bbox"], g)
                    if iou >= best:
                        best, best_j = iou, j
                if best_j >= 0:
                    matched[d["image_id"]][best_j] = True
                    flags.append(True)
                else:
                    flags.append(False)
            tp = np.cumsum(flags) if flags else np.zeros(0)
            fp = np.cumsum([not f for f in flags]) if flags else np.zeros(0)
            rc = tp / n_gt if len(tp) else np.zeros(0)
            pr = tp / np.maximum(tp + fp, 1e-12) if len(tp) else np.zeros(0)
            # precision envelope (monotone non-increasing from the right)
            for i in range(len(pr) - 1, 0, -1):
                pr[i - 1] = max(pr[i - 1], pr[i])
            # sample at the 101 recall thresholds
            q = np.zeros(len(REC_THRS))
            inds = np.searchsorted(rc, REC_THRS, side="left")
            for ri, pi in enumerate(inds):
                if pi < len(pr):
                    q[ri] = pr[pi]
            aps.append(q.mean())
            recalls.append(rc[-1] if len(rc) else 0.0)
        ap[cid] = float(np.mean(aps))
        rec[cid] = float(np.mean(recalls))
    return ap, rec


def _lvis_fixture():
    images = [
        {"id": 1, "neg_category_ids": []},
        {"id": 2, "neg_category_ids": []},
        {"id": 3, "neg_category_ids": []},   # cat 1 NOT evaluable here
        {"id": 4, "neg_category_ids": [1]},  # cat 1 verified negative
    ]
    categories = [{"id": 1, "name": "c1", "frequency": "f"}]
    annotations = [
        {"image_id": 1, "category_id": 1, "bbox": [10.0, 10.0, 40.0, 40.0]},
        {"image_id": 2, "category_id": 1, "bbox": [5.0, 5.0, 20.0, 20.0]},
    ]
    detections = [
        # ignored entirely: image 3 is not evaluable for cat 1 (federated)
        {"image_id": 3, "category_id": 1, "bbox": [0.0, 0.0, 10.0, 10.0], "score": 0.95},
        {"image_id": 1, "category_id": 1, "bbox": [10.0, 10.0, 40.0, 40.0], "score": 0.9},
        # FP: image 4 is VERIFIED negative for cat 1
        {"image_id": 4, "category_id": 1, "bbox": [0.0, 0.0, 10.0, 10.0], "score": 0.8},
        {"image_id": 2, "category_id": 1, "bbox": [5.0, 5.0, 20.0, 20.0], "score": 0.7},
    ]
    return annotations, images, categories, detections


def test_lvis_closed_form_hand_computed():
    """TP@0.9 (IoU=1), FP@0.8, TP@0.7 over 2 gt; the non-evaluable-image
    det is ignored. PR points: (r=1/2, p=1), (r=1/2, p=1/2), (r=1, p=2/3).
    Envelope: p=1 for r<=0.5, p=2/3 above. 101-pt AP =
    (51*1 + 50*(2/3)) / 101 = 0.834983498... — identical at every IoU
    threshold (TP IoUs are exactly 1, the FP overlaps nothing)."""
    anns, images, cats, dets = _lvis_fixture()
    expected_ap = (51 * 1.0 + 50 * (2.0 / 3.0)) / 101 * 100.0
    res = LVISEval(anns, images, cats).evaluate(dets)
    np.testing.assert_allclose(res["AP"], expected_ap, rtol=1e-9)
    np.testing.assert_allclose(res["AP50"], expected_ap, rtol=1e-9)
    np.testing.assert_allclose(res["APf"], expected_ap, rtol=1e-9)
    np.testing.assert_allclose(res["AR@300"], 100.0)  # both gt matched

    # the same fixture WITHOUT the federated ignore scores lower: plain
    # COCO semantics make the 0.95 det a top-ranked FP. PR points become
    # (1/2, 1/2) after the second det and (1, 1/2) after the fourth;
    # envelope = 1/2 everywhere -> AP = 50 — proves the ignore engaged
    images_all_pos = [dict(im, neg_category_ids=[1]) for im in images]
    res2 = LVISEval(anns, images_all_pos, cats).evaluate(dets)
    np.testing.assert_allclose(res2["AP"], 50.0, rtol=1e-9)


def test_lvis_randomized_crosscheck():
    """Randomized federated fixtures vs the independent transliteration."""
    rng = np.random.RandomState(11)
    for trial in range(6):
        n_img, n_cat = 5, 3
        images = [
            {"id": i + 1,
             "neg_category_ids": [c + 1 for c in range(n_cat)
                                  if rng.rand() < 0.3]}
            for i in range(n_img)
        ]
        categories = [
            {"id": c + 1, "name": f"c{c}",
             "frequency": ["r", "c", "f"][c % 3]}
            for c in range(n_cat)
        ]
        annotations = []
        for i in range(n_img):
            for _ in range(rng.randint(1, 4)):
                x, y = rng.rand(2) * 60
                w, h = rng.rand(2) * 40 + 5
                annotations.append({
                    "image_id": i + 1,
                    "category_id": int(rng.randint(1, n_cat + 1)),
                    "bbox": [float(x), float(y), float(w), float(h)],
                })
        detections = []
        for i in range(n_img):
            for _ in range(rng.randint(2, 7)):
                if rng.rand() < 0.6 and annotations:
                    a = annotations[rng.randint(len(annotations))]
                    bx = [v + float(rng.randn() * 3) for v in a["bbox"][:2]]
                    bwh = [max(2.0, v + float(rng.randn() * 3))
                           for v in a["bbox"][2:]]
                    bbox, cat = bx + bwh, a["category_id"]
                else:
                    x, y = rng.rand(2) * 60
                    bbox = [float(x), float(y),
                            float(rng.rand() * 40 + 5), float(rng.rand() * 40 + 5)]
                    cat = int(rng.randint(1, n_cat + 1))
                detections.append({
                    "image_id": i + 1, "category_id": cat,
                    "bbox": bbox, "score": float(rng.rand()),
                })
        res = LVISEval(annotations, images, categories).evaluate(detections)
        oracle_ap, oracle_rec = oracle_lvis_ap(
            annotations, images, categories, detections
        )
        exp_ap = 100.0 * np.mean(list(oracle_ap.values()))
        np.testing.assert_allclose(res["AP"], exp_ap, atol=1e-9,
                                   err_msg=f"trial {trial}")
        exp_ar = 100.0 * np.mean(list(oracle_rec.values()))
        np.testing.assert_allclose(res["AR@300"], exp_ar, atol=1e-9)


# ---------------------------------------------------------------------------
# Panoptic PQ
# ---------------------------------------------------------------------------


def oracle_pq(gt_map, gt_segments, pred_map, pred_segments):
    """Independent PQ transliteration straight from the published protocol
    (Kirillov et al. + panopticapi rules), via per-pair boolean masks."""
    gt_map = np.asarray(gt_map)
    pred_map = np.asarray(pred_map)
    void_mask = gt_map == 0
    stats = {}  # cat -> [iou_sum, tp, fp, fn]

    def st(c):
        return stats.setdefault(c, [0.0, 0, 0, 0])

    matched_g, matched_p = set(), set()
    for g in gt_segments:
        if g.get("iscrowd", 0):
            continue
        gm = gt_map == g["id"]
        for p in pred_segments:
            if p["category_id"] != g["category_id"]:
                continue
            pm = pred_map == p["id"]
            inter = float((gm & pm).sum())
            union = float(gm.sum() + pm.sum() - inter - (pm & void_mask).sum())
            iou = inter / union if union > 0 else 0.0
            if iou > 0.5:
                s = st(g["category_id"])
                s[0] += iou
                s[1] += 1
                matched_g.add(g["id"])
                matched_p.add(p["id"])
    for g in gt_segments:
        if g.get("iscrowd", 0) or g["id"] in matched_g:
            continue
        st(g["category_id"])[3] += 1
    crowd = {g["category_id"]: (gt_map == g["id"])
             for g in gt_segments if g.get("iscrowd", 0)}
    for p in pred_segments:
        if p["id"] in matched_p:
            continue
        pm = pred_map == p["id"]
        if pm.sum() == 0:
            continue
        ignore = (pm & void_mask).sum()
        if p["category_id"] in crowd:
            ignore += (pm & crowd[p["category_id"]]).sum()
        if ignore / pm.sum() > 0.5:
            continue
        st(p["category_id"])[2] += 1

    per_cat = {}
    for c, (iou, tp, fp, fn) in stats.items():
        denom = tp + fp / 2 + fn / 2
        per_cat[c] = {
            "pq": iou / denom if denom else 0.0,
            "sq": iou / tp if tp else 0.0,
            "rq": tp / denom if denom else 0.0,
        }
    return per_cat


def _pq_maps():
    """Hand-constructed 20x30 scene. Class 1: gt A (10x10=100 px at
    (0:10, 0:10)), gt B (6x10=60 px at (10:16, 0:10)). Class 2: gt C
    (50 px at (0:5, 15:25)). Preds: P1 covers A's first 8 rows + 1 row
    below (area 90, inter 80 -> IoU 80/110); P2 clips B to 20 px of a
    40-px box (IoU 20/80 = 0.25 < 0.5 -> FP, B FN); P3 == C (IoU 1)."""
    gt = np.zeros((20, 30), np.int32)
    gt[0:10, 0:10] = 1   # A
    gt[10:16, 0:10] = 2  # B
    gt[0:5, 15:25] = 3   # C
    pred = np.zeros((20, 30), np.int32)
    pred[1:10, 0:10] = 11  # P1: rows 1..9 of A (90 px, 80 in rows 1..9? see below)
    pred[16:18, 0:10] = 12  # P2: 20 px just below B -> zero overlap with B
    pred[0:5, 15:25] = 13  # P3
    # recompute P1/P2 to match the docstring arithmetic exactly:
    pred[pred == 11] = 0
    pred[2:11, 0:10] = 11  # rows 2..10: 90 px; rows 2..9 overlap A -> 80 px
    pred[pred == 12] = 0
    pred[12:16, 0:10] = 12  # rows 12..15: 40 px; rows 12..15 all inside B -> 40?
    # B spans rows 10..15 -> inter = 4 rows * 10 = 40, union = 60+40-40 = 60
    # IoU = 2/3 > 0.5 -> that would be a TP; shrink: 2 rows inside + 2 below
    pred[pred == 12] = 0
    pred[14:18, 0:10] = 12  # rows 14..17: 40 px; rows 14,15 in B -> inter 20
    # union = 60 + 40 - 20 = 80 -> IoU 0.25 -> FP + FN  ✓
    gt_segments = [
        {"id": 1, "category_id": 1},
        {"id": 2, "category_id": 1},
        {"id": 3, "category_id": 2},
    ]
    pred_segments = [
        {"id": 11, "category_id": 1},
        {"id": 12, "category_id": 1},
        {"id": 13, "category_id": 2},
    ]
    return gt, gt_segments, pred, pred_segments


def test_pq_closed_form_hand_computed():
    """Class 1: TP(A,P1) IoU = 80/(100+90-80) = 8/11; P2 FP; B FN.
    PQ_1 = (8/11)/(1 + 0.5 + 0.5) = 4/11; SQ_1 = 8/11; RQ_1 = 1/2.
    Class 2: exact match -> PQ = SQ = RQ = 1.
    All-PQ = (4/11 + 1)/2 = 15/22 = 0.681818..."""
    gt, gs, pred, ps = _pq_maps()
    stat = pq_compute_single(gt, gs, pred, ps)
    res = stat.pq_average()
    np.testing.assert_allclose(res["pq"], 15.0 / 22.0, rtol=1e-12)
    one = stat.pq_average([1])
    np.testing.assert_allclose(one["pq"], 4.0 / 11.0, rtol=1e-12)
    np.testing.assert_allclose(one["sq"], 8.0 / 11.0, rtol=1e-12)
    np.testing.assert_allclose(one["rq"], 0.5, rtol=1e-12)


def test_pq_void_and_crowd_rules_hand_computed():
    """panopticapi rules: (a) void pixels are excluded from the match
    union; (b) an unmatched pred >50% covered by void (or same-class
    crowd) is NOT an FP."""
    gt = np.zeros((10, 20), np.int32)
    gt[0:10, 0:8] = 1           # gt A, class 1, 80 px
    # rest is void (id 0)
    pred = np.zeros((10, 20), np.int32)
    pred[0:10, 0:10] = 11       # P1 class 1: 100 px, 80 on A + 20 on void
    pred[0:10, 12:20] = 12      # P2 class 1: 80 px entirely on void
    gs = [{"id": 1, "category_id": 1}]
    ps = [{"id": 11, "category_id": 1}, {"id": 12, "category_id": 1}]
    stat = pq_compute_single(gt, gs, pred, ps)
    res = stat.pq_average([1])
    # (a) union = 80 + 100 - 80 - void_inter(20) = 80 -> IoU = 1.0 -> TP
    # (b) P2 is 100% void-covered -> ignored, NOT an FP
    np.testing.assert_allclose(res["pq"], 1.0, rtol=1e-12)
    np.testing.assert_allclose(res["rq"], 1.0, rtol=1e-12)

    # crowd: unmatched pred mostly covering a same-class crowd is ignored
    gt2 = np.zeros((10, 20), np.int32)
    gt2[0:10, 0:8] = 5
    pred2 = np.zeros((10, 20), np.int32)
    pred2[0:10, 0:6] = 21
    gs2 = [{"id": 5, "category_id": 3, "iscrowd": 1}]
    ps2 = [{"id": 21, "category_id": 3}]
    stat2 = pq_compute_single(gt2, gs2, pred2, ps2)
    res2 = stat2.pq_average()
    assert res2["n"] == 0  # no countable categories at all: crowd gt is
    # excluded and the pred was ignored (100% inside same-class crowd)


def test_pq_randomized_crosscheck():
    """Random id maps vs the independent mask-loop transliteration."""
    rng = np.random.RandomState(5)
    for trial in range(5):
        h, w = 24, 32
        gt = np.zeros((h, w), np.int32)
        gs = []
        gid = 1
        for _ in range(rng.randint(3, 7)):
            y, x = rng.randint(0, h - 6), rng.randint(0, w - 6)
            hh, ww = rng.randint(3, 10), rng.randint(3, 10)
            gt[y : y + hh, x : x + ww] = gid
            gs.append({"id": gid, "category_id": int(rng.randint(1, 4)),
                       "iscrowd": int(rng.rand() < 0.2)})
            gid += 1
        pred = np.zeros((h, w), np.int32)
        ps = []
        pid = 100
        for _ in range(rng.randint(3, 7)):
            y, x = rng.randint(0, h - 6), rng.randint(0, w - 6)
            hh, ww = rng.randint(3, 10), rng.randint(3, 10)
            pred[y : y + hh, x : x + ww] = pid
            ps.append({"id": pid, "category_id": int(rng.randint(1, 4))})
            pid += 1
        # drop overwritten segments (paint order can erase earlier ids)
        gs = [g for g in gs if (gt == g["id"]).any()]
        ps = [p for p in ps if (pred == p["id"]).any()]
        stat = pq_compute_single(gt, gs, pred, ps)
        mine = stat.pq_average()
        oracle = oracle_pq(gt, gs, pred, ps)
        if not oracle:
            assert mine["n"] == 0
            continue
        exp_pq = np.mean([v["pq"] for v in oracle.values()])
        np.testing.assert_allclose(mine["pq"], exp_pq, rtol=1e-12,
                                   err_msg=f"trial {trial}")
        for c, v in oracle.items():
            got = stat.pq_average([c])
            np.testing.assert_allclose(got["pq"], v["pq"], rtol=1e-12)
            np.testing.assert_allclose(got["sq"], v["sq"], rtol=1e-12)
            np.testing.assert_allclose(got["rq"], v["rq"], rtol=1e-12)


# ---------------------------------------------------------------------------
# Cityscapes instance AP
# ---------------------------------------------------------------------------


def _city_eval(tmp_path):
    from proben_tpu.evaluation.cityscapes import CityscapesInstanceEvaluator

    return CityscapesInstanceEvaluator(
        str(tmp_path), thing_classes=["person", "car"]
    )


def _rect_mask(h, w, y0, y1, x0, x1):
    m = np.zeros((h, w), np.uint8)
    m[y0:y1, x0:x1] = 1
    return m


def test_cityscapes_closed_form_perfect(tmp_path):
    """All-perfect detections: AP = AP50 = 100 under BOTH the official
    cityscapesscripts integration and COCO 101-pt interpolation (constant
    precision 1.0 — the protocols provably coincide on constant
    envelopes)."""
    ev = _city_eval(tmp_path)
    m1 = _rect_mask(64, 96, 5, 30, 5, 30)
    m2 = _rect_mask(64, 96, 35, 60, 40, 90)
    ev.add_ground_truth("img0", [m1, m2], [0, 1])
    ev.process("img0", [m1, m2], [0.9, 0.8], [0, 1])
    res = ev.evaluate()["segm"]
    np.testing.assert_allclose(res["AP"], 100.0)
    np.testing.assert_allclose(res["AP50"], 100.0)


def test_cityscapes_closed_form_top_fp(tmp_path):
    """2 exact TPs + 1 TOP-scored FP (zero overlap), one class. PR points:
    (1/2, 1/2), (1, 2/3); envelope is the CONSTANT 2/3, where the official
    piecewise integration (integral of 2/3 over r in [0,1]) and the COCO
    101-pt mean (101 * 2/3 / 101) both give exactly 2/3 at every IoU
    threshold (TP IoUs = 1, FP IoU = 0). AP = AP50 = 66.666..."""
    ev = _city_eval(tmp_path)
    m1 = _rect_mask(64, 96, 5, 30, 5, 30)
    m2 = _rect_mask(64, 96, 35, 60, 40, 90)
    fp = _rect_mask(64, 96, 0, 4, 92, 96)
    ev.add_ground_truth("img0", [m1, m2], [0, 0])
    ev.process("img0", [fp, m1, m2], [0.99, 0.9, 0.8], [0, 0, 0])
    res = ev.evaluate()["segm"]
    np.testing.assert_allclose(res["AP"], (2.0 / 3.0) * 100.0, rtol=1e-9)
    np.testing.assert_allclose(res["AP50"], (2.0 / 3.0) * 100.0, rtol=1e-9)


def test_cityscapes_min_region_size(tmp_path):
    """Official protocol: gt regions below minRegionSizes (100 px default)
    are ignore regions — a detection matching one is neither TP nor FP, so
    the tiny-region pair must not change AP from the perfect case."""
    from proben_tpu.evaluation.cityscapes import CityscapesInstanceEvaluator

    ev = CityscapesInstanceEvaluator(str(tmp_path), thing_classes=["person"])
    big = _rect_mask(64, 96, 5, 40, 5, 40)    # 1225 px
    tiny = _rect_mask(64, 96, 50, 57, 50, 57)  # 49 px < 100
    ev.add_ground_truth("img0", [big, tiny], [0, 0])
    ev.process("img0", [big, tiny], [0.9, 0.85], [0, 0])
    res = ev.evaluate()["segm"]
    np.testing.assert_allclose(res["AP"], 100.0)
    np.testing.assert_allclose(res["AP50"], 100.0)
