"""AP evaluator tests on canned detections with hand-computed answers."""

import numpy as np

from pqdet_tpu.evaluation.evaluator import (AP_IOU_THRESHOLDS, APResult,
                                            Evaluator, format_ap_table)


class _Cfg:
    class dataset:
        classes = ['a', 'b']

    class system:
        num_workers = 1


def _ev():
    return Evaluator(predict=None, dataset=None, config=_Cfg)


def test_perfect_detection():
    ev = _ev()
    gt = np.array([[10, 10, 50, 50, 0]], np.float32)
    det = np.array([[10, 10, 50, 50, 0.9, 0]], np.float32)
    ev.add_labels('f1', gt, np.zeros(1))
    ev.add_detections('f1', det)
    res = ev.compute_ap()
    np.testing.assert_allclose(res.raw[0], 1.0)
    assert res.raw[1].sum() == 0  # class b: no detections, no GT
    assert np.isclose(res.AP, 0.5)  # mean over both classes


def test_partial_iou_threshold_sweep():
    """Detection overlapping GT with IoU ~0.67: TP below, FP above."""
    ev = _ev()
    gt = np.array([[0, 0, 99, 99, 0]], np.float32)   # +1 convention: 100x100
    det = np.array([[0, 0, 99, 66.333, 0.9, 0]], np.float32)
    ev.add_labels('f1', gt, np.zeros(1))
    ev.add_detections('f1', det)
    res = ev.compute_ap()
    iou = (100 * 68.333) / (100 * 100 + 100 * 68.333 - 100 * 68.333)
    expect = (AP_IOU_THRESHOLDS <= iou).astype(float)
    np.testing.assert_allclose(res.raw[0], expect)


def test_duplicate_detection_is_fp():
    ev = _ev()
    gt = np.array([[10, 10, 50, 50, 0]], np.float32)
    det = np.array([[10, 10, 50, 50, 0.9, 0],
                    [10, 10, 50, 50, 0.8, 0]], np.float32)
    ev.add_labels('f1', gt, np.zeros(1))
    ev.add_detections('f1', det)
    res = ev.compute_ap()
    # rec stays 1.0, prec drops to 0.5 at the duplicate -> envelope keeps AP 1
    np.testing.assert_allclose(res.raw[0], 1.0)


def test_missed_gt_halves_recall():
    ev = _ev()
    gt = np.array([[10, 10, 50, 50, 0], [200, 200, 240, 240, 0]], np.float32)
    det = np.array([[10, 10, 50, 50, 0.9, 0]], np.float32)
    ev.add_labels('f1', gt, np.zeros(2))
    ev.add_detections('f1', det)
    res = ev.compute_ap()
    np.testing.assert_allclose(res.raw[0], 0.5)


def test_detection_matching_difficult_is_ignored():
    ev = _ev()
    gt = np.array([[10, 10, 50, 50, 0]], np.float32)
    det = np.array([[10, 10, 50, 50, 0.9, 0]], np.float32)
    ev.add_labels('f1', gt, np.ones(1))  # difficult
    ev.add_detections('f1', det)
    res = ev.compute_ap()
    # matched a difficult box: dropped entirely; gt_count is 0 too
    np.testing.assert_allclose(res.raw[0], 0.0)


def test_unmatched_det_dropped_when_difficult_present():
    """Reference quirk (evaluator.py:110): pick_index=-1 indexes the last
    (difficult) GT, so an unmatched detection is dropped, not an FP."""
    ev = _ev()
    gt = np.array([[10, 10, 50, 50, 0], [200, 200, 240, 240, 0]], np.float32)
    diffs = np.array([0, 1])
    # one perfect match + one detection in empty space
    det = np.array([[10, 10, 50, 50, 0.9, 0],
                    [500, 500, 540, 540, 0.8, 0]], np.float32)
    ev.add_labels('f1', gt, diffs)
    ev.add_detections('f1', det)
    res = ev.compute_ap()
    # the stray detection is ignored -> AP stays 1.0
    np.testing.assert_allclose(res.raw[0], 1.0)


def test_unmatched_det_is_fp_without_difficult():
    ev = _ev()
    gt = np.array([[10, 10, 50, 50, 0]], np.float32)
    det = np.array([[500, 500, 540, 540, 0.95, 0],   # stray, HIGHER score
                    [10, 10, 50, 50, 0.9, 0]], np.float32)
    ev.add_labels('f1', gt, np.zeros(1))
    ev.add_detections('f1', det)
    res = ev.compute_ap()
    # precision at the TP is 1/2, envelope gives AP = 0.5
    np.testing.assert_allclose(res.raw[0], 0.5)


def test_score_ordering_across_files():
    """Detections sort globally per class by score before matching."""
    ev = _ev()
    for f in ('f1', 'f2'):
        ev.add_labels(f, np.array([[10, 10, 50, 50, 0]], np.float32), np.zeros(1))
    # low-score stray first by insertion, but ordering puts real dets first
    ev.add_detections('f1', np.array([[500, 500, 540, 540, 0.3, 0]], np.float32))
    ev.add_detections('f1', np.array([[10, 10, 50, 50, 0.9, 0]], np.float32))
    ev.add_detections('f2', np.array([[10, 10, 50, 50, 0.8, 0]], np.float32))
    res = ev.compute_ap()
    # rec hits 1.0 with prec 1.0 before the stray appears -> AP 1.0
    np.testing.assert_allclose(res.raw[0], 1.0)


def test_multiclass_independent():
    ev = _ev()
    gt = np.array([[10, 10, 50, 50, 0], [100, 100, 150, 150, 1]], np.float32)
    det = np.array([[10, 10, 50, 50, 0.9, 0],
                    [100, 100, 150, 150, 0.9, 1]], np.float32)
    ev.add_labels('f1', gt, np.zeros(2))
    ev.add_detections('f1', det)
    res = ev.compute_ap()
    np.testing.assert_allclose(res.raw, 1.0)
    assert np.isclose(res.AP, 1.0)


def test_format_table():
    res = APResult(np.full(10, 0.5), np.array([0.5, 0.5]), 0.5,
                   np.full((2, 10), 0.5), ['a', 'b'], AP_IOU_THRESHOLDS)
    table = format_ap_table(res)
    assert 'mAPs' in table and '50.00' in table
    assert 'a' in table.splitlines()[1]
