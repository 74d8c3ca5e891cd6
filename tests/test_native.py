"""Native AP matcher: equivalence with the pure-Python path on randomized
scenarios."""

import numpy as np
import pytest

from pqdet_tpu.evaluation.evaluator import Evaluator
from pqdet_tpu.native import matcher as native_matcher


class _Cfg:
    class dataset:
        classes = ['a', 'b', 'c']

    class system:
        num_workers = 1


def _random_scenario(seed):
    rng = np.random.RandomState(seed)
    ev = Evaluator(predict=None, dataset=None, config=_Cfg)
    n_files = rng.randint(2, 6)
    for f in range(n_files):
        n_gt = rng.randint(1, 8)
        lt = rng.rand(n_gt, 2) * 200
        wh = rng.rand(n_gt, 2) * 60 + 10
        cls = rng.randint(0, 3, size=(n_gt, 1))
        boxes = np.concatenate([lt, lt + wh, cls], -1).astype(np.float32)
        diffs = (rng.rand(n_gt) < 0.3).astype(np.float64)
        ev.add_labels(f'f{f}', boxes, diffs)
        # detections: some near GT, some random, duplicated scores included
        n_det = rng.randint(1, 12)
        det_lt = rng.rand(n_det, 2) * 220
        det_wh = rng.rand(n_det, 2) * 60 + 10
        jitter = rng.randn(n_det, 4) * 4
        near = np.concatenate([lt, lt + wh], -1)[rng.randint(0, n_gt, n_det)] + jitter
        use_near = rng.rand(n_det) < 0.6
        det_boxes = np.where(use_near[:, None], near,
                             np.concatenate([det_lt, det_lt + det_wh], -1))
        scores = np.round(rng.rand(n_det), 2)  # rounded -> score ties
        det_cls = rng.randint(0, 3, n_det)
        dets = np.concatenate([det_boxes, scores[:, None],
                               det_cls[:, None]], -1).astype(np.float32)
        ev.add_detections(f'f{f}', dets)
    return ev


@pytest.mark.skipif(not native_matcher.available(), reason='no native toolchain')
@pytest.mark.parametrize('seed', range(8))
def test_native_matches_python(seed):
    ev = _random_scenario(seed)
    for cls in list(ev._detections):
        tp_n, fp_n = ev._match_class_native(cls, native_matcher)
        # python path mutates label.seen — rebuild the scenario for it
        ev2 = _random_scenario(seed)
        tp_p, fp_p = ev2._match_class_python(cls)
        np.testing.assert_array_equal(tp_n, tp_p)
        np.testing.assert_array_equal(fp_n, fp_p)


@pytest.mark.skipif(not native_matcher.available(), reason='no native toolchain')
def test_native_full_ap_equivalence():
    ev_native = _random_scenario(123)
    res_native = ev_native.compute_ap()

    # force python fallback by monkeypatching availability
    ev_py = _random_scenario(123)
    import pqdet_tpu.native.matcher as m
    saved = m.available
    try:
        m.available = lambda: False
        res_py = ev_py.compute_ap()
    finally:
        m.available = saved
    np.testing.assert_allclose(res_native.raw, res_py.raw)
    assert np.isclose(res_native.AP, res_py.AP)


def test_native_builds():
    assert native_matcher.available(), 'g++ toolchain expected in this image'
