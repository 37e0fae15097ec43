"""mAP evaluator unit tests with hand-computable scenarios."""

import numpy as np
import pytest

from ssd_object_detection_tpu.eval.coco_map import DetectionEvaluator


def _box(x, y, w, h):
    return [x, y, x + w, y + h]


def test_perfect_detections_map_one():
    ev = DetectionEvaluator(num_classes=3)
    gt = np.array([_box(0, 0, 10, 10), _box(20, 20, 10, 10)], float)
    cls = np.array([0, 1])
    ev.add_image(gt, np.array([0.9, 0.8]), cls, gt, cls)
    out = ev.summarize()
    assert out["mAP"] == pytest.approx(1.0)
    assert out["mAP@0.5"] == pytest.approx(1.0)


def test_miss_halves_recall():
    ev = DetectionEvaluator()
    gt = np.array([_box(0, 0, 10, 10), _box(50, 50, 10, 10)], float)
    cls = np.array([0, 0])
    # only first GT detected
    ev.add_image(gt[:1], np.array([0.9]), cls[:1], gt, cls)
    out = ev.summarize()
    # precision 1 up to recall 0.5, then 0 -> 101-pt AP ~ 51/101
    assert out["mAP@0.5"] == pytest.approx(51 / 101, abs=0.01)


def test_false_positive_lowers_precision():
    ev = DetectionEvaluator()
    gt = np.array([_box(0, 0, 10, 10)], float)
    dets = np.array([_box(0, 0, 10, 10), _box(80, 80, 5, 5)], float)
    # FP scored higher than the TP
    ev.add_image(dets, np.array([0.95, 0.9]), np.array([0, 0]), gt, np.array([0]))
    out = ev.summarize()
    # wait: the FP is the SECOND det here; order by score: box0 (0.95, TP), fp (0.9)
    # precision stays 1.0 at all recall points -> AP 1.0
    assert out["mAP@0.5"] == pytest.approx(1.0)

    ev2 = DetectionEvaluator()
    ev2.add_image(dets[::-1], np.array([0.95, 0.9]), np.array([0, 0]), gt, np.array([0]))
    # now the FP comes first: precision at recall>0 is 1/2
    assert ev2.summarize()["mAP@0.5"] == pytest.approx(0.5, abs=0.01)


def test_localization_quality_affects_high_iou_thresholds():
    ev = DetectionEvaluator()
    gt = np.array([_box(0, 0, 10, 10)], float)
    det = np.array([_box(1, 0, 10, 10)], float)  # IoU = 9/11 ~ 0.818
    ev.add_image(det, np.array([0.9]), np.array([0]), gt, np.array([0]))
    out = ev.summarize()
    assert out["mAP@0.5"] == pytest.approx(1.0)
    assert out["mAP@0.75"] == pytest.approx(1.0)
    assert out["mAP"] < 1.0  # fails at IoU 0.85+


def test_crowd_gt_neither_tp_nor_fp():
    ev = DetectionEvaluator()
    gt = np.array([_box(0, 0, 10, 10), _box(30, 30, 20, 20)], float)
    cls = np.array([0, 0])
    ignore = np.array([False, True])
    dets = np.array([_box(0, 0, 10, 10), _box(32, 32, 10, 10)], float)
    # second det lands inside the crowd region -> ignored, not FP
    ev.add_image(dets, np.array([0.9, 0.8]), np.array([0, 0]), gt, cls, gt_ignore=ignore)
    out = ev.summarize()
    assert out["mAP@0.5"] == pytest.approx(1.0)


def test_non_crowd_ignored_gt_absorbs_only_one_detection():
    """pycocotools semantics: a NON-crowd ignored GT (e.g. out of the area range) is
    claimable once (gtm set, `gtm > 0 and not iscrowd` skip); only crowd GTs absorb
    unlimited detections. A second detection on an already-claimed out-of-range GT
    must therefore be a FP in the bucketed metric, not ignored."""
    ev = DetectionEvaluator()
    gt = np.array([
        [0.0, 0.0, 34.0, 34.0],  # area 1156 -> medium; IGNORED in the 'small' range
        [100.0, 100.0, 110.0, 110.0],  # area 100 -> small
    ])
    cls = np.zeros(2, int)
    dets = np.array([
        # two small-area (in-range) detections on GT0, IoU .88 each (>= t for the
        # 8 thresholds .50-.85), ranked ABOVE the true positive:
        [0.0, 0.0, 32.0, 31.9],  # score .95: claims ignored GT0 -> ignored
        [0.0, 0.0, 31.9, 32.0],  # score .90: GT0 already taken -> in-range FP
        [100.0, 100.0, 110.0, 110.0],  # score .85: exact small TP
    ])
    ev.add_image(dets, np.array([0.95, 0.9, 0.85]), np.zeros(3, int), gt, cls)
    out = ev.summarize()
    # t <= .85 (8 thresholds): det0 ignored, det1 FP above the TP ->
    #   prec/rec pairs (0, 0) then (1/2, 1) -> AP 0.5.
    # t in {.90, .95}: neither det reaches GT0 (IoU .88) -> det0 AND det1 are
    #   in-range FPs above the TP -> AP 1/3 (identical with or without the
    #   taken-once rule). Crowd-style reuse would instead ignore det1 at t <= .85,
    #   giving AP 1.0 there and mAP_small 0.8667.
    assert out["mAP_small"] == pytest.approx((8 * 0.5 + 2 * (1 / 3)) / 10)


def test_wrong_class_is_fp():
    ev = DetectionEvaluator()
    gt = np.array([_box(0, 0, 10, 10)], float)
    ev.add_image(gt, np.array([0.9]), np.array([1]), gt, np.array([0]))
    out = ev.summarize()
    assert out["mAP@0.5"] == pytest.approx(0.0)


def test_duplicate_detection_is_fp():
    """Second detection of an already-claimed GT counts as FP (greedy matching)."""
    ev = DetectionEvaluator()
    gt = np.array([_box(0, 0, 10, 10)], float)
    dets = np.array([_box(0, 0, 10, 10), _box(0, 0, 10, 10)], float)
    ev.add_image(dets, np.array([0.9, 0.8]), np.array([0, 0]), gt, np.array([0]))
    out = ev.summarize()
    # recall hits 1.0 with precision 1.0 first, duplicate adds FP after full recall
    assert out["mAP@0.5"] == pytest.approx(1.0)


def test_multi_image_accumulation():
    ev = DetectionEvaluator()
    gt1 = np.array([_box(0, 0, 10, 10)], float)
    gt2 = np.array([_box(5, 5, 10, 10)], float)
    ev.add_image(gt1, np.array([0.9]), np.array([0]), gt1, np.array([0]))
    ev.add_image(np.zeros((0, 4)), np.zeros((0,)), np.zeros((0,), int), gt2, np.array([0]))
    out = ev.summarize()
    assert 0.4 < out["mAP@0.5"] < 0.6  # half the GTs found


# --------------------------------------------------------------------------- oracle
# Independent transliteration of pycocotools cocoeval.evaluateImg/accumulate (bbox),
# written directly from the published algorithm as a cross-validation oracle
# (pycocotools itself is not installed in this image). Deliberately loop-based and
# structured like cocoeval, unlike the vectorized evaluator under test.
from ssd_object_detection_tpu.eval.coco_map import (  # noqa: E402
    AREA_RANGES,
    IOU_THRESHOLDS,
    RECALL_POINTS,
)


def _oracle_iou(d, g, iscrowd):
    out = np.zeros((len(d), len(g)))
    for i, db in enumerate(d):
        da = max(db[2] - db[0], 0) * max(db[3] - db[1], 0)
        for j, gb in enumerate(g):
            ga = max(gb[2] - gb[0], 0) * max(gb[3] - gb[1], 0)
            iw = min(db[2], gb[2]) - max(db[0], gb[0])
            ih = min(db[3], gb[3]) - max(db[1], gb[1])
            inter = max(iw, 0) * max(ih, 0)
            union = da if iscrowd[j] else da + ga - inter
            out[i, j] = inter / max(union, 1e-10)
    return out


def _oracle_evaluate_img(dt, dt_scores, gt, gt_crowd, rng_lo, rng_hi, max_dets):
    order = np.argsort(-dt_scores, kind="mergesort")[:max_dets]
    dt, dt_scores = dt[order], dt_scores[order]
    g_area = np.maximum(gt[:, 2] - gt[:, 0], 0) * np.maximum(gt[:, 3] - gt[:, 1], 0)
    gtIg = gt_crowd | (g_area < rng_lo) | (g_area > rng_hi)
    # cocoeval sorts gts ignored-last
    gorder = np.argsort(gtIg, kind="mergesort")
    gt, gtIg, crowd = gt[gorder], gtIg[gorder], gt_crowd[gorder]
    ious = _oracle_iou(dt, gt, crowd)
    T, D, G = len(IOU_THRESHOLDS), len(dt), len(gt)
    dtm = np.zeros((T, D), int)
    dtIg = np.zeros((T, D), bool)
    gtm = np.zeros((T, G), int)
    for ti, t in enumerate(IOU_THRESHOLDS):
        for d in range(D):
            iou = min(t, 1 - 1e-10)
            m = -1
            for g in range(G):
                if gtm[ti, g] > 0 and not crowd[g]:
                    continue
                if m > -1 and not gtIg[m] and gtIg[g]:
                    break
                if ious[d, g] < iou:
                    continue
                iou = ious[d, g]
                m = g
            if m == -1:
                continue
            dtIg[ti, d] = gtIg[m]
            dtm[ti, d] = 1
            gtm[ti, m] = 1
    d_area = np.maximum(dt[:, 2] - dt[:, 0], 0) * np.maximum(dt[:, 3] - dt[:, 1], 0)
    outside = (d_area < rng_lo) | (d_area > rng_hi)
    dtIg = dtIg | ((dtm == 0) & outside[None, :])
    return dt_scores, dtm.astype(bool), dtIg, int((~gtIg).sum())


def _oracle_summarize(images, num_classes):
    """images: list of (dt, scores, cls, gt, gcls, gcrowd). Returns the 12 metrics."""
    def stats(rng, max_dets):
        lo, hi = rng
        aps, recs = [], []
        for c in range(num_classes):
            per_img = []
            npig = 0
            for dt, sc, cls, gt, gcls, gcrowd in images:
                ds = cls == c
                gs = gcls == c
                r = _oracle_evaluate_img(dt[ds], sc[ds], gt[gs], gcrowd[gs], lo, hi, max_dets)
                per_img.append(r)
                npig += r[3]
            if npig == 0:
                continue
            T = len(IOU_THRESHOLDS)
            scores = np.concatenate([r[0] for r in per_img])
            m = np.concatenate([r[1] for r in per_img], axis=1)
            ig = np.concatenate([r[2] for r in per_img], axis=1)
            o = np.argsort(-scores, kind="mergesort")
            m, ig = m[:, o], ig[:, o]
            ap = np.zeros(T)
            rc = np.zeros(T)
            for ti in range(T):
                keep = ~ig[ti]
                tps = np.cumsum(m[ti][keep])
                fps = np.cumsum(~m[ti][keep])
                if len(tps) == 0:
                    continue
                rec = tps / npig
                prec = tps / np.maximum(tps + fps, 1e-10)
                rc[ti] = rec[-1]
                q = np.zeros(len(RECALL_POINTS))
                for i in range(len(prec) - 1, 0, -1):
                    prec[i - 1] = max(prec[i - 1], prec[i])
                inds = np.searchsorted(rec, RECALL_POINTS, side="left")
                for ri, pi in enumerate(inds):
                    if pi < len(prec):
                        q[ri] = prec[pi]
                ap[ti] = q.mean()
            aps.append(ap)
            recs.append(rc)
        if not aps:
            return None
        return np.stack(aps), np.stack(recs)

    all_s = stats(AREA_RANGES["all"], 100)
    i75 = IOU_THRESHOLDS.tolist().index(0.75)
    out = {
        "mAP": all_s[0].mean(), "mAP@0.5": all_s[0][:, 0].mean(),
        "mAP@0.75": all_s[0][:, i75].mean(), "AR@100": all_s[1].mean(),
    }
    for md, key in ((1, "AR@1"), (10, "AR@10")):
        s = stats(AREA_RANGES["all"], md)
        out[key] = s[1].mean() if s else 0.0
    for name in ("small", "medium", "large"):
        s = stats(AREA_RANGES[name], 100)
        out[f"mAP_{name}"] = s[0].mean() if s else 0.0
        out[f"AR_{name}"] = s[1].mean() if s else 0.0
    return out


def _random_scene(rng, n_img=4, n_cls=3):
    images = []
    for _ in range(n_img):
        n_g = rng.integers(1, 8)
        n_d = rng.integers(0, 12)
        def boxes(n):
            xy = rng.uniform(0, 200, (n, 2))
            wh = rng.uniform(2, 150, (n, 2))
            return np.concatenate([xy, xy + wh], axis=1)
        gt = boxes(n_g)
        gcls = rng.integers(0, n_cls, n_g)
        gcrowd = rng.uniform(size=n_g) < 0.25
        # most detections are perturbed GTs (a random GT each, so several
        # detections can pile onto one GT — exercising the crowd-reusable /
        # non-crowd-taken-once distinction), the rest random false positives
        dt = []
        dcls = []
        for i in range(n_d):
            if n_g and rng.uniform() < 0.6:
                j = int(rng.integers(0, n_g))
                b = gt[j] + rng.normal(0, 6, 4)
                b[2:] = np.maximum(b[2:], b[:2] + 1)
                dt.append(b)
                dcls.append(gcls[j] if rng.uniform() < 0.8 else rng.integers(0, n_cls))
            else:
                dt.append(boxes(1)[0])
                dcls.append(rng.integers(0, n_cls))
        dt = np.array(dt).reshape(n_d, 4)
        scores = rng.permutation(np.linspace(0.1, 0.99, n_d))  # distinct scores
        images.append((dt, scores, np.array(dcls, int), gt, gcls, gcrowd))
    return images


@pytest.mark.parametrize("seed", range(6))
def test_randomized_against_cocoeval_oracle(seed):
    rng = np.random.default_rng(seed)
    images = _random_scene(rng)
    ev = DetectionEvaluator(num_classes=3)
    for dt, sc, cls, gt, gcls, gcrowd in images:
        ev.add_image(dt, sc, cls, gt, gcls, gt_ignore=gcrowd)
    got = ev.summarize()
    want = _oracle_summarize(images, 3)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-9), (k, got[k], v)


def test_area_range_buckets():
    """A small GT (<32^2) counts only in mAP_small; large only in mAP_large."""
    ev = DetectionEvaluator()
    small = np.array([_box(0, 0, 10, 10)], float)  # area 100
    large = np.array([_box(50, 50, 200, 200)], float)  # area 40000
    gt = np.concatenate([small, large])
    ev.add_image(gt, np.array([0.9, 0.8]), np.array([0, 0]), gt, np.array([0, 0]))
    out = ev.summarize()
    assert out["mAP"] == pytest.approx(1.0)
    assert out["mAP_small"] == pytest.approx(1.0)
    assert out["mAP_large"] == pytest.approx(1.0)
    assert out["mAP_medium"] == 0.0  # no medium GTs anywhere


def test_ar_maxdets():
    """AR@1 sees only the top-scoring detection."""
    ev = DetectionEvaluator()
    gt = np.array([_box(0, 0, 10, 10), _box(50, 50, 10, 10)], float)
    cls = np.array([0, 0])
    ev.add_image(gt, np.array([0.9, 0.8]), cls, gt, cls)
    out = ev.summarize()
    assert out["AR@100"] == pytest.approx(1.0)
    assert out["AR@10"] == pytest.approx(1.0)
    assert out["AR@1"] == pytest.approx(0.5)
