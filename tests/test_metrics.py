import numpy as np
import pytest

from tpudet.eval.metrics import DetectionEvaluator, average_precision


def box(x, y, s=10.0):
    return [x, y, x + s, y + s]


def test_perfect_detections_map_1():
    ev = DetectionEvaluator(num_classes=2)
    gt = np.asarray([box(0, 0), box(50, 50)], np.float32)
    gtc = np.asarray([1, 2])
    ev.add_image(gt, np.asarray([0.9, 0.8]), gtc, gt, gtc)
    s = ev.summarize()
    assert s["mAP"] == pytest.approx(1.0)


def test_no_detections_map_0():
    ev = DetectionEvaluator(num_classes=1)
    gt = np.asarray([box(0, 0)], np.float32)
    ev.add_image(
        np.zeros((0, 4)), np.zeros(0), np.zeros(0, int), gt, np.asarray([1])
    )
    assert ev.summarize()["mAP"] == 0.0


def test_false_positive_lowers_ap():
    ev = DetectionEvaluator(num_classes=1, interpolation="all_points")
    gt = np.asarray([box(0, 0)], np.float32)
    # One TP at 0.9, one FP at 0.95 (higher score, elsewhere).
    preds = np.asarray([box(0, 0), box(80, 80)], np.float32)
    ev.add_image(preds, np.asarray([0.9, 0.95]), np.asarray([1, 1]), gt, np.asarray([1]))
    # PR: [fp@.95 -> p=0 r=0], [tp@.9 -> p=1/2 r=1]; all-points AP = 0.5.
    assert ev.summarize()["mAP"] == pytest.approx(0.5)


def test_duplicate_detection_is_fp():
    ev = DetectionEvaluator(num_classes=1, interpolation="all_points")
    gt = np.asarray([box(0, 0)], np.float32)
    preds = np.asarray([box(0, 0), box(1, 1)], np.float32)  # both overlap gt
    ev.add_image(preds, np.asarray([0.9, 0.8]), np.asarray([1, 1]), gt, np.asarray([1]))
    # First (higher score) matches; second is a duplicate FP at lower score ->
    # precision envelope keeps AP = 1.0 at recall 1.
    assert ev.summarize()["mAP"] == pytest.approx(1.0)


def test_low_iou_is_fp():
    ev = DetectionEvaluator(num_classes=1)
    gt = np.asarray([box(0, 0)], np.float32)
    preds = np.asarray([box(7, 7)], np.float32)  # IoU ~ 9/191 << 0.5
    ev.add_image(preds, np.asarray([0.9]), np.asarray([1]), gt, np.asarray([1]))
    assert ev.summarize()["mAP"] == 0.0


def test_difficult_gt_ignored():
    ev = DetectionEvaluator(num_classes=1)
    gt = np.asarray([box(0, 0), box(50, 50)], np.float32)
    gtc = np.asarray([1, 1])
    difficult = np.asarray([False, True])
    # Detect both; the difficult match neither helps nor hurts.
    ev.add_image(gt, np.asarray([0.9, 0.8]), gtc, gt, gtc, difficult)
    assert ev.summarize()["mAP"] == pytest.approx(1.0)
    # And missing the difficult one entirely is still perfect.
    ev2 = DetectionEvaluator(num_classes=1)
    ev2.add_image(gt[:1], np.asarray([0.9]), gtc[:1], gt, gtc, difficult)
    assert ev2.summarize()["mAP"] == pytest.approx(1.0)


def test_ap_interpolations_known_curve():
    # recall [.5, 1], precision [1, .5]
    r = np.asarray([0.5, 1.0])
    p = np.asarray([1.0, 0.5])
    # 11-point: recalls 0..0.5 -> max p where r >= t: 1.0 (6 pts), .5 (5 pts)
    assert average_precision(r, p, "11_points") == pytest.approx((6 * 1.0 + 5 * 0.5) / 11)
    assert average_precision(r, p, "all_points") == pytest.approx(0.5 * 1.0 + 0.5 * 0.5)


def test_multi_image_accumulation():
    ev = DetectionEvaluator(num_classes=1, interpolation="all_points")
    g1 = np.asarray([box(0, 0)], np.float32)
    # image 1: TP@0.9; image 2: miss (no detection) -> recall caps at 0.5.
    ev.add_image(g1, np.asarray([0.9]), np.asarray([1]), g1, np.asarray([1]))
    ev.add_image(np.zeros((0, 4)), np.zeros(0), np.zeros(0, int), g1, np.asarray([1]))
    assert ev.summarize()["mAP"] == pytest.approx(0.5)


def test_class_names_in_summary():
    ev = DetectionEvaluator(num_classes=2, class_names=("cat", "dog"))
    gt = np.asarray([box(0, 0)], np.float32)
    ev.add_image(gt, np.asarray([0.9]), np.asarray([1]), gt, np.asarray([1]))
    s = ev.summarize()
    assert "AP/cat" in s and "AP/dog" in s
    assert np.isnan(s["AP/dog"])  # no dog GT anywhere
    assert s["mAP"] == pytest.approx(1.0)  # nan classes excluded


def test_coco_style_evaluator():
    from tpudet.eval.metrics import CocoStyleEvaluator

    ev = CocoStyleEvaluator(num_classes=1)
    gt = np.asarray([box(0, 0, 20.0)], np.float32)
    # IoU = (17*20)/(20*20) = 0.85: TP at thresholds 0.50..0.85 (8 of 10).
    pred = np.asarray([[0.0, 0.0, 17.0, 20.0]], np.float32)
    ev.add_image(pred, np.asarray([0.9]), np.asarray([1]), gt, np.asarray([1]))
    s = ev.summarize()
    assert s["mAP@0.5"] == pytest.approx(1.0)
    assert s["mAP@0.75"] == pytest.approx(1.0)
    assert s["mAP"] == pytest.approx(0.8)


def test_101_point_interpolation():
    # PR: [(r=0.5, p=1.0), (r=1.0, p=0.5)] -> envelope 1.0 up to r=0.5,
    # then 0.5 to r=1.0. 101-pt mean: 51 pts at 1.0, 50 pts at 0.5.
    recall = np.asarray([0.5, 1.0])
    precision = np.asarray([1.0, 0.5])
    ap = average_precision(recall, precision, "101_points")
    assert ap == pytest.approx((51 * 1.0 + 50 * 0.5) / 101)


def test_coco_area_range_ap():
    """Size-stratified AP: small GT only counts in the small bank; an
    unmatched out-of-range detection is ignored there, not a false
    positive."""
    from tpudet.eval.metrics import CocoStyleEvaluator

    ev = CocoStyleEvaluator(num_classes=1)
    gt = np.asarray([[0, 0, 20, 20], [100, 100, 228, 228]], np.float32)
    preds = np.asarray([[0, 0, 20, 20], [100, 100, 228, 228]], np.float32)
    ev.add_image(preds, np.asarray([0.9, 0.8]), np.asarray([1, 1]),
                 gt, np.asarray([1, 1]))
    s = ev.summarize()
    assert s["mAP"] == pytest.approx(1.0)
    # In the small bank the large det is unmatched but out-of-range ->
    # ignored; the small pair is a clean TP.
    assert s["mAP_small"] == pytest.approx(1.0)
    assert s["mAP_large"] == pytest.approx(1.0)
    assert s["mAP_medium"] == pytest.approx(0.0)  # no medium GT
    assert s["AR"] == pytest.approx(1.0)
    assert s["AR_small"] == pytest.approx(1.0)


def test_coco_mode_prefers_real_gt():
    """COCO matching: a detection clearing the threshold on both an ignored
    and a real GT must match the real one (VOC's best-IoU rule would match
    the ignored GT and silently drop the detection, deflating recall)."""
    # Real GT and difficult GT heavily overlapping; det has higher IoU with
    # the difficult one but >0.5 with both.
    gt = np.asarray([[0, 0, 20, 20], [0, 0, 22, 20]], np.float32)
    difficult = np.asarray([False, True])
    det = np.asarray([[0, 0, 22, 20]], np.float32)  # IoU 1.0 w/ ignored

    voc = DetectionEvaluator(1, iou_thresh=0.5, mode="voc")
    voc.add_image(det, np.asarray([0.9]), np.asarray([1]),
                  gt, np.asarray([1, 1]), gt_difficult=difficult)
    assert voc.summarize()["mAP"] == pytest.approx(0.0)  # det dropped

    coco = DetectionEvaluator(1, iou_thresh=0.5, mode="coco",
                              interpolation="101_points")
    coco.add_image(det, np.asarray([0.9]), np.asarray([1]),
                   gt, np.asarray([1, 1]), gt_difficult=difficult)
    assert coco.summarize()["mAP"] == pytest.approx(1.0)  # matched real GT


def test_coco_mode_order_independent_ignored_gt():
    """pycocotools matches a threshold-clearing real GT regardless of an
    ignored GT's (higher) IoU or array position — matching must not depend
    on GT order."""
    det = np.asarray([[0, 0, 22, 20]], np.float32)
    for ignored_first in (True, False):
        if ignored_first:
            gt = np.asarray([[0, 0, 22, 20], [0, 0, 20, 20]], np.float32)
            difficult = np.asarray([True, False])
        else:
            gt = np.asarray([[0, 0, 20, 20], [0, 0, 22, 20]], np.float32)
            difficult = np.asarray([False, True])
        ev = DetectionEvaluator(1, iou_thresh=0.5, mode="coco",
                                interpolation="101_points")
        ev.add_image(det, np.asarray([0.9]), np.asarray([1]),
                     gt, np.asarray([1, 1]), gt_difficult=difficult)
        assert ev.summarize()["mAP"] == pytest.approx(1.0), ignored_first


def test_voc_devkit_duplicate_on_best_iou_gt_is_fp():
    """PASCAL devkit: a detection takes its single best-IoU GT even if that
    GT is already matched — it does NOT fall back to a lower-IoU unmatched
    GT (pycocotools would)."""
    gt = np.asarray([[0, 0, 20, 20], [0, 0, 26, 20]], np.float32)
    # Both detections' best IoU is gt0; det2 also clears 0.5 with gt1.
    dets = np.asarray([[0, 0, 20, 20], [0, 0, 21, 20]], np.float32)
    scores = np.asarray([0.9, 0.8])
    voc = DetectionEvaluator(1, iou_thresh=0.5, mode="voc",
                             interpolation="all_points")
    voc.add_image(dets, scores, np.asarray([1, 1]), gt, np.asarray([1, 1]))
    s = voc.summarize()
    # TP at 0.9 (recall 0.5), duplicate FP at 0.8 -> AP = 0.5.
    assert s["mAP"] == pytest.approx(0.5)
    coco = DetectionEvaluator(1, iou_thresh=0.5, mode="coco",
                              interpolation="all_points")
    coco.add_image(dets, scores, np.asarray([1, 1]), gt, np.asarray([1, 1]))
    # pycocotools: det2 falls onto unmatched gt1 (IoU 21/26 > 0.5) -> 2 TPs.
    assert coco.summarize()["mAP"] == pytest.approx(1.0)


def test_crowd_iou_uses_detection_area():
    """IoU against a crowd GT is intersection over the DETECTION's area: a
    small correct detection inside a big crowd region is ignored (dropped),
    not a false positive — even though union-IoU would be far below 0.5."""
    crowd_gt = np.asarray([[0, 0, 100, 100]], np.float32)
    det = np.asarray([[10, 10, 20, 20]], np.float32)  # union-IoU 0.01
    ev = DetectionEvaluator(1, iou_thresh=0.5, mode="coco",
                            interpolation="101_points")
    ev.add_image(det, np.asarray([0.9]), np.asarray([1]),
                 crowd_gt, np.asarray([1]),
                 gt_difficult=np.asarray([True]),
                 gt_crowd=np.asarray([True]))
    s = ev.summarize()
    # No positives anywhere (crowd is ignored), and no FP recorded.
    assert s["mAP"] == 0.0
    assert ev._scores[0] == []  # detection dropped, not an FP


def test_crowd_gt_absorbs_multiple_detections():
    """A crowd region stays matchable: every detection inside it is ignored,
    while a non-crowd ignored GT absorbs only one."""
    gt = np.asarray([[0, 0, 100, 100]], np.float32)
    dets = np.asarray([[10, 10, 30, 30], [50, 50, 80, 80]], np.float32)
    scores = np.asarray([0.9, 0.8])
    ev = DetectionEvaluator(1, iou_thresh=0.5, mode="coco")
    ev.add_image(dets, scores, np.asarray([1, 1]), gt, np.asarray([1]),
                 gt_difficult=np.asarray([True]),
                 gt_crowd=np.asarray([True]))
    assert ev._scores[0] == []  # both dropped
    # Same scene, ignored but NOT crowd: union-IoU is tiny, neither det
    # matches, and both become FPs (area_range=None keeps them in range).
    ev2 = DetectionEvaluator(1, iou_thresh=0.5, mode="coco")
    ev2.add_image(dets, scores, np.asarray([1, 1]), gt, np.asarray([1]),
                  gt_difficult=np.asarray([True]))
    assert ev2._tps[0] == [False, False]


def test_coco_style_evaluator_accepts_crowd():
    from tpudet.eval.metrics import CocoStyleEvaluator

    ev = CocoStyleEvaluator(num_classes=1)
    gt = np.asarray([[0, 0, 40, 40], [60, 60, 200, 200]], np.float32)
    dets = np.asarray([[0, 0, 40, 40], [100, 100, 150, 150]], np.float32)
    ev.add_image(dets, np.asarray([0.9, 0.8]), np.asarray([1, 1]),
                 gt, np.asarray([1, 1]),
                 gt_difficult=np.asarray([False, True]),
                 gt_crowd=np.asarray([False, True]))
    s = ev.summarize()
    # The real GT is a perfect TP; the det inside the crowd is ignored.
    assert s["mAP"] == pytest.approx(1.0)
    assert s["AR"] == pytest.approx(1.0)


def _pycocotools_match_oracle(d_boxes, g_boxes, g_ignore, g_crowd, d_oor, t):
    """Literal port of pycocotools COCOeval.evaluateImg matching (the
    sorted-GT sequential loop with the IoU ratchet), reduced to per-
    detection outcome codes: 1=TP, 0=FP, -1=ignored."""
    from tpudet.eval.metrics import _iou_matrix

    D, G = len(d_boxes), len(g_boxes)
    gtind = np.argsort(g_ignore.astype(int), kind="mergesort")
    g_boxes = g_boxes[gtind]
    gig = g_ignore[gtind]
    gcr = g_crowd[gtind]
    ious = _iou_matrix(d_boxes, g_boxes, gcr)
    gtm = np.full(G, -1)
    codes = np.zeros(D, np.int8)
    for dind in range(D):
        iou = min(t, 1 - 1e-10)
        m = -1
        for gind in range(G):
            if gtm[gind] >= 0 and not gcr[gind]:
                continue
            if m > -1 and not gig[m] and gig[gind]:
                break
            if ious[dind, gind] < iou:
                continue
            iou = ious[dind, gind]
            m = gind
        if m == -1:
            codes[dind] = -1 if d_oor[dind] else 0
        else:
            gtm[m] = dind
            codes[dind] = -1 if gig[m] else 1
    return codes


def test_coco_matching_fuzz_vs_pycocotools_port():
    """2000 random crowded scenes: _match_dets must agree exactly with the
    literal pycocotools matching loop (incl. crowd-IoU, crowd rematching,
    ignore preference, tie-breaking, area-range det ignoring)."""
    from tpudet.eval.metrics import _iou_matrix, _match_dets

    rng = np.random.default_rng(1234)
    for it in range(2000):
        D, G = rng.integers(0, 10), rng.integers(0, 10)

        def rand_boxes(n):
            xy = rng.uniform(0, 60, (n, 2))
            wh = rng.uniform(2, 50, (n, 2))
            return np.concatenate([xy, xy + wh], 1)

        d, g = rand_boxes(D), rand_boxes(G)
        if G and D and rng.random() < 0.7:  # force heavy overlap
            d = g[rng.integers(0, G, D)] + rng.normal(0, 3, (D, 4))
        crowd = rng.random(G) < 0.3
        ignore = (rng.random(G) < 0.4) | crowd
        d_oor = rng.random(D) < 0.3
        t = float(rng.choice([0.5, 0.75, 0.95]))
        iou = _iou_matrix(d, g, crowd) if G else None
        ours = _match_dets(iou, ignore, crowd, d_oor, t, "coco")
        ref = _pycocotools_match_oracle(d, g, ignore, crowd, d_oor, t)
        np.testing.assert_array_equal(ours, ref, err_msg=f"scene {it}")


def test_coco_gt_area_field_binning():
    """pycocotools bins GT by the annotation 'area' field (segment area),
    not box area: a 40x40 box whose segment area is 500 (< 32^2) is SMALL
    GT even though its box area is medium. Detections keep box-area
    binning. -1 entries fall back to box area (VOC has no area field)."""
    from tpudet.eval.metrics import CocoStyleEvaluator

    gt = np.asarray([[0, 0, 40, 40]], np.float32)  # box area 1600 (medium)
    pred = np.asarray([[0, 0, 40, 40]], np.float32)

    # Without gt_area: medium GT -> TP lands in the medium bank.
    ev = CocoStyleEvaluator(num_classes=1)
    ev.add_image(pred, np.asarray([0.9]), np.asarray([1]),
                 gt, np.asarray([1]))
    s = ev.summarize()
    assert s["mAP_medium"] == pytest.approx(1.0)
    assert s["AR_small"] == pytest.approx(0.0)

    # Segment area 500 -> small GT bank; in the medium bank the GT is
    # ignored and the matched detection is dropped (not an FP).
    ev = CocoStyleEvaluator(num_classes=1)
    ev.add_image(pred, np.asarray([0.9]), np.asarray([1]),
                 gt, np.asarray([1]), gt_area=np.asarray([500.0]))
    s = ev.summarize()
    assert s["mAP_small"] == pytest.approx(1.0)
    assert s["AR_small"] == pytest.approx(1.0)
    assert s["mAP_medium"] == pytest.approx(0.0)  # no medium GT anywhere

    # -1 sentinel == absent: identical to the no-gt_area call.
    ev = CocoStyleEvaluator(num_classes=1)
    ev.add_image(pred, np.asarray([0.9]), np.asarray([1]),
                 gt, np.asarray([1]), gt_area=np.asarray([-1.0]))
    s = ev.summarize()
    assert s["mAP_medium"] == pytest.approx(1.0)


def test_prepare_example_carries_gt_area():
    from tpudet.config import DataConfig
    from tpudet.data.preprocess import prepare_example

    cfg = DataConfig(min_size=64, max_size=64, canvas_height=64,
                     canvas_width=64, max_gt_boxes=4)
    img = np.zeros((64, 64, 3), np.uint8)
    boxes = np.asarray([[0, 0, 10, 10]], np.float32)
    classes = np.asarray([1], np.int32)
    out = prepare_example(cfg, img, boxes, classes,
                          area=np.asarray([42.0], np.float32))
    assert out["gt_area"][0] == pytest.approx(42.0)
    assert np.all(out["gt_area"][1:] == -1.0)
    # Absent area -> all sentinel.
    out = prepare_example(cfg, img, boxes, classes)
    assert np.all(out["gt_area"] == -1.0)


def test_proposal_recall_hand_built():
    """Hand-built scene with known recall at each (k, IoU) cell."""
    from tpudet.eval.metrics import ProposalRecallEvaluator

    ev = ProposalRecallEvaluator(iou_thresholds=(0.5, 0.7), topk=(2, 10))
    gt = np.array([[0, 0, 10, 10], [100, 100, 120, 120]], np.float32)
    # Rank 1: exact hit on GT1. Rank 2: junk. Rank 3 (outside top-2): a
    # ~0.57-IoU hit on GT2 ([100,100,120,113.33] vs the 20x20 GT).
    props = np.array([
        [0, 0, 10, 10],
        [500, 500, 510, 510],
        [100, 100, 120, 113.34],
    ], np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    ev.add_image(props, scores, None, gt, None)
    s = ev.summarize()
    assert s["recall@2_iou0.5"] == pytest.approx(0.5)
    assert s["recall@10_iou0.5"] == pytest.approx(1.0)
    assert s["recall@10_iou0.7"] == pytest.approx(0.5)  # 0.57 < 0.7
    assert s["num_gt"] == 2.0
    assert s["avg_proposals_per_image"] == pytest.approx(3.0)


def test_proposal_recall_ignores_difficult_and_crowd():
    from tpudet.eval.metrics import ProposalRecallEvaluator

    ev = ProposalRecallEvaluator(iou_thresholds=(0.5,), topk=(5,))
    gt = np.array([[0, 0, 10, 10], [50, 50, 60, 60], [90, 90, 95, 95]],
                  np.float32)
    props = np.array([[0, 0, 10, 10]], np.float32)
    ev.add_image(props, np.array([1.0]), None, gt, None,
                 gt_difficult=np.array([False, True, False]),
                 gt_crowd=np.array([False, False, True]))
    s = ev.summarize()
    # Only GT1 counts; it is hit -> recall 1.0 with denominator 1.
    assert s["num_gt"] == 1.0
    assert s["recall@5_iou0.5"] == pytest.approx(1.0)
