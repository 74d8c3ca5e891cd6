"""ctypes binding for the native AP matcher."""

from __future__ import annotations

import ctypes

import numpy as np

_lib = None
_load_failed = False


def available() -> bool:
    global _lib, _load_failed
    if _lib is None and not _load_failed:
        try:
            from pqdet_tpu.native import load
            _lib = load('ap_matcher')
            _lib.match_class.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_uint8),
            ]
            _lib.match_class.restype = None
        except Exception:
            _load_failed = True
    return _lib is not None


def match_class(det_boxes: np.ndarray, det_set: np.ndarray,
                gt_boxes: np.ndarray, gt_diff: np.ndarray,
                set_offsets: np.ndarray, thresholds: np.ndarray):
    """Run the native greedy matcher; returns (tp, fp) of shape
    (n_iou, n_det) float64. Inputs must follow the layout documented in
    ap_matcher.cpp."""
    assert available()
    n_det = len(det_boxes)
    n_iou = len(thresholds)
    total_gt = len(gt_boxes)
    det_boxes = np.ascontiguousarray(det_boxes, np.float32)
    det_set = np.ascontiguousarray(det_set, np.int32)
    gt_boxes = np.ascontiguousarray(gt_boxes.reshape(-1, 4), np.float32) \
        if total_gt else np.zeros((1, 4), np.float32)
    gt_diff_c = np.ascontiguousarray(gt_diff, np.uint8) if total_gt \
        else np.zeros(1, np.uint8)
    set_offsets = np.ascontiguousarray(set_offsets, np.int32)
    thresholds = np.ascontiguousarray(thresholds, np.float64)
    seen = np.zeros((n_iou, max(total_gt, 1)), np.uint8)
    tp = np.zeros((n_iou, max(n_det, 1)), np.uint8)
    fp = np.zeros((n_iou, max(n_det, 1)), np.uint8)

    def ptr(arr, ct):
        return arr.ctypes.data_as(ctypes.POINTER(ct))

    _lib.match_class(
        ptr(det_boxes, ctypes.c_float), ptr(det_set, ctypes.c_int32),
        n_det,
        ptr(gt_boxes, ctypes.c_float), ptr(gt_diff_c, ctypes.c_uint8),
        ptr(set_offsets, ctypes.c_int32),
        ptr(thresholds, ctypes.c_double), n_iou, total_gt,
        ptr(seen, ctypes.c_uint8), ptr(tp, ctypes.c_uint8),
        ptr(fp, ctypes.c_uint8))
    return tp[:, :n_det].astype(np.float64), fp[:, :n_det].astype(np.float64)
