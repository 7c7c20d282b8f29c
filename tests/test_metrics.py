"""Metric stack tests: PQ on hand-computed scenes, SSC confusion, ECE."""

import numpy as np

from pasco_tpu.metrics.pq import (
    PQStat,
    find_matched_segments,
    mask_labels_to_panoptic,
    pq_update,
)
from pasco_tpu.metrics.ssc import SSCMetrics, binary_calibration_error
from pasco_tpu.metrics.uncertainty import UncertaintyMetrics


def test_pq_perfect_prediction():
    pan = np.zeros((8, 8, 2), np.int32)
    pan[:4, :4] = 1   # thing instance, class 1
    pan[4:, 4:] = 2   # stuff segment, class 9
    segs = [
        {"id": 1, "isthing": True, "category_id": 1},
        {"id": 2, "isthing": False, "category_id": 9},
    ]
    pq = PQStat()
    pq_update(pq, segs, segs, pan, pan, thing_ids=(1,))
    res, _ = pq.pq_average(None, 0, (1,))
    assert res["pq"] == 1.0 and res["sq"] == 1.0 and res["rq"] == 1.0
    assert res["pq_dagger"] == 1.0


def test_pq_half_overlap_is_fn_fp():
    gt = np.zeros((10, 10, 1), np.int32)
    gt[:4, :] = 1
    pred = np.zeros_like(gt)
    pred[2:6, :] = 1   # IoU = 2/6 = 0.33 < 0.5 -> no TP
    segs_gt = [{"id": 1, "isthing": True, "category_id": 1}]
    segs_pred = [{"id": 1, "isthing": True, "category_id": 1}]
    pq = PQStat()
    pq_update(pq, segs_gt, segs_pred, gt, pred, thing_ids=(1,))
    cat = pq[1]
    assert cat.tp == 0 and cat.fn == 1 and cat.fp == 1


def test_pq_dagger_uses_all_stuff_matches():
    """A stuff segment with IoU 0.4 counts toward PQ-dagger but not PQ."""
    gt = np.zeros((10, 10, 1), np.int32)
    gt[:5, :] = 1
    pred = np.zeros_like(gt)
    pred[2:7, :] = 1   # IoU = 3/7 ~ 0.43
    segs = [{"id": 1, "isthing": False, "category_id": 9}]
    pq = PQStat()
    pq_update(pq, segs, segs, gt, pred, thing_ids=(1,))
    res, _ = pq.pq_average(None, 0, (1,))
    assert res["pq"] == 0.0
    assert abs(res["pq_dagger"] - 3 / 7) < 1e-6


def test_mask_labels_to_panoptic_merges_stuff():
    masks = np.zeros((3, 4, 4, 1), bool)
    masks[0, 0] = True
    masks[1, 1] = True
    masks[2, 2] = True
    labels = np.array([9, 9, 1])  # two stuff masks of same class + a thing
    pan, segs = mask_labels_to_panoptic(labels, masks, thing_ids=(1,))
    assert len(segs) == 2           # merged stuff + thing
    assert pan[0, 0, 0] == pan[1, 0, 0]  # same merged stuff id


def test_find_matched_segments_hungarian():
    gt = np.zeros((6, 6, 1), np.int32)
    gt[:3] = 1
    gt[3:] = 2
    pred = np.zeros_like(gt)
    pred[:3] = 2
    pred[3:] = 1
    segs_gt = [
        {"id": 1, "category_id": 1},
        {"id": 2, "category_id": 9},
    ]
    segs_pred = [
        {"id": 1, "category_id": 9},
        {"id": 2, "category_id": 1},
    ]
    matched = find_matched_segments(segs_gt, segs_pred, gt, pred, threshold=0.2)
    assert sorted(matched) == [(1, 2), (2, 1)]


def test_ssc_metrics_simple():
    m = SSCMetrics(3)
    gt = np.array([[0, 1, 2, 255, 1]])
    pred = np.array([[0, 1, 1, 2, 1]])
    m.add_batch(pred, gt)
    stats = m.get_stats()
    # Known voxels: gt [0,1,2,1] vs pred [0,1,1,1]
    # completion: binary occ gt [0,1,1,1] pred [0,1,1,1] -> perfect
    assert stats["iou"] == 1.0
    # class 1: tp=2, fp=1, fn=0 -> iou 2/3; class 2: tp=0 -> 0
    assert abs(stats["iou_ssc"][1] - 2 / 3) < 1e-4
    assert stats["iou_ssc"][2] < 1e-4


def test_binary_calibration_error_perfect():
    conf = np.array([0.95, 0.85, 0.75])
    acc = np.array([1.0, 1.0, 1.0])
    # ECE = mean |acc - conf| per bin; all correct with conf<1 -> >0
    e = binary_calibration_error(conf, acc)
    assert 0.0 < e < 0.3
    assert binary_calibration_error(np.array([]), np.array([])) == 0.0


def test_uncertainty_metrics_flow():
    u = UncertaintyMetrics()
    pan_gt = np.zeros((4, 4, 1), np.int32)
    pan_gt[:2] = 1
    pan_pred = pan_gt.copy()
    conf = np.ones((4, 4, 1), np.float32) * 0.9
    gt_info = [{"id": 1, "category_id": 1}]
    pred_info = [
        {
            "id": 1,
            "category_id": 1,
            "confidence": 0.9,
            "all_class_probs": np.array([0.05, 0.9, 0.05]),
        }
    ]
    u.compute_ece_panop(
        pan_pred, pred_info, conf, [(1, 1)], pan_gt, gt_info, n_classes=2
    )
    stats = u.get_stats()
    assert stats["count"] == 1
    assert stats["ins_nll"] < 0.2
