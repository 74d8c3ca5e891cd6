"""Differential evaluation against the actual torch reference.

Runs the SAME weights through both full evaluation pipelines — ours
(evaluation/predict.py + evaluation/evaluator.py) and the reference's
(dataset eval augment -> DetectionModel -> recover_bboxes -> torch_nms ->
eval/evaluator.py AP) — over the same image list, then reports per-image
detection parity and the AP delta. This is the end-to-end proof that
recover -> NMS -> greedy matching semantics are equivalent (reference
eval/evaluator.py:44-175), covering everything the unit parity tests stop
short of.

    python -m pqdet_tpu.cli.diffeval --weight m.ckpt --yaml exp.yaml \
        [--limit 500] [--out report.json]

Requires the reference tree (PQDET_REFERENCE, default /root/reference) and
torch; torchvision/yacs are stubbed functionally by utils/reference_bridge.
"""

from __future__ import annotations

import argparse
import io
import json

import numpy as np


def _match_detections(a: np.ndarray, b: np.ndarray, box_tol: float = 1.0,
                      score_tol: float = 1e-3):
    """Greedy one-to-one matching of two (M, 6) detection arrays
    [x1,y1,x2,y2,score,cls]; returns (matched, extra_a, extra_b)."""
    used = np.zeros(len(b), bool)
    matched = 0
    for row in a:
        best, best_d = -1, None
        for j in range(len(b)):
            if used[j] or int(b[j, 5]) != int(row[5]):
                continue
            if abs(b[j, 4] - row[4]) > score_tol:
                continue
            d = np.abs(b[j, :4] - row[:4]).max()
            if d <= box_tol and (best_d is None or d < best_d):
                best, best_d = j, d
        if best >= 0:
            used[best] = True
            matched += 1
    return matched, len(a) - matched, len(b) - int(used.sum())


def run_diffeval(cfg, weight: str, limit: int = 0, ref_path: str = None):
    """Returns a report dict (see keys below); asserts nothing — callers
    decide thresholds.

    TPU f32 convs default to one-pass bf16 precision; the torch reference
    computes exact f32. Pin HIGHEST so per-detection parity is meaningful
    (without it every score differs ~1e-3 and the greedy matcher reports
    near-zero match rate even though AP agrees to <0.005). Restored on
    exit so library callers (tests) don't leak precision globally."""
    import jax
    prev = jax.config.jax_default_matmul_precision
    jax.config.update('jax_default_matmul_precision', 'highest')
    try:
        return _run_diffeval(cfg, weight, limit, ref_path)
    finally:
        jax.config.update('jax_default_matmul_precision', prev)


def _run_diffeval(cfg, weight: str, limit: int, ref_path: str):
    import torch
    import jax
    from pqdet_tpu.config import size_fix
    from pqdet_tpu.data.eval_data import EvalData
    from pqdet_tpu.evaluation.evaluator import Evaluator
    from pqdet_tpu.evaluation.predict import (build_predict_pipeline,
                                              make_batch_predict)
    from pqdet_tpu.exporters.torch_convert import convert_to_torch_state_dict
    from pqdet_tpu.model.factory import build_detector, inference_params
    from pqdet_tpu.utils import reference_bridge

    ref = reference_bridge.import_reference(
        ref_path or reference_bridge.DEFAULT_REF)

    # host-side float normalization, bit-matching the torch reference's own
    # preprocessing (the on-device path differs by one FMA rounding, which
    # would blur the exact per-detection parity this harness asserts)
    cfg = cfg.clone().defrost()
    cfg.eval.host_normalize = True
    if limit:
        cfg.eval.partial = limit
    cfg.freeze()

    # ---- ours -----------------------------------------------------------
    network, params, state, info = build_detector(None, weight_path=weight)
    fused = inference_params(network, params, state)  # f32 for comparison
    run = build_predict_pipeline(network, cfg)
    predict = make_batch_predict(run, fused)
    data = EvalData(cfg)

    ours_dets = {}

    def capture_predict(batch):
        dets = predict(batch)
        for i in range(batch['count']):
            ours_dets[batch['file_name'][i]] = dets[i]
        return dets

    ap_ours = Evaluator(capture_predict, data, cfg).evaluate()

    # ---- reference ------------------------------------------------------
    ref_model = ref.interpreter.DetectionModel(io.StringIO(info['cfg_text']))
    sd = convert_to_torch_state_dict(params, state, network)
    ref_model.load_state_dict({k: torch.from_numpy(np.array(v))
                               for k, v in sd.items()})
    ref_model.eval()

    rcfg = ref.CfgNode()
    rcfg.eval = ref.CfgNode()
    rcfg.eval.score_threshold = cfg.eval.score_threshold
    rcfg.eval.iou_threshold = cfg.eval.iou_threshold
    rcfg.eval.input_size = cfg.eval.input_size
    rcfg.eval.batch_size = cfg.eval.batch_size
    rcfg.eval.partial = cfg.eval.partial
    rcfg.dataset = ref.CfgNode()
    rcfg.dataset.name = cfg.dataset.name
    rcfg.dataset.eval_txt_file = cfg.dataset.eval_txt_file
    rcfg.dataset.classes = list(cfg.dataset.classes)

    import sys
    sys.path.insert(0, ref_path or reference_bridge.DEFAULT_REF)
    try:
        from dataset.eval_dataset import EvalDataset as RefEvalDataset  # noqa
    finally:
        sys.path.remove(ref_path or reference_bridge.DEFAULT_REF)
    ref_data = RefEvalDataset(rcfg)

    ref_dets = {}
    ref_eval = ref.evaluator.Evaluator(lambda t: ref_model(t), ref_data, rcfg)
    orig_add = ref_eval.add_detections

    def capture_add(file_name, bboxes):
        ref_dets[file_name] = np.asarray(bboxes)
        return orig_add(file_name, bboxes)

    ref_eval.add_detections = capture_add
    ap_ref = ref_eval.evaluate()

    # ---- compare --------------------------------------------------------
    per_image = []
    total_m = total_a = total_b = 0
    for name, ours in ours_dets.items():
        theirs = ref_dets.get(name, np.zeros((0, 6), np.float32))
        if theirs.ndim != 2 or theirs.size == 0:
            theirs = np.zeros((0, 6), np.float32)
        m, ea, eb = _match_detections(ours, theirs)
        total_m += m
        total_a += ea
        total_b += eb
        per_image.append({'file': name, 'matched': m, 'extra_ours': ea,
                          'extra_ref': eb})

    report = {
        'images': len(ours_dets),
        'detections_matched': total_m,
        'extra_ours': total_a,
        'extra_ref': total_b,
        'match_rate': total_m / max(total_m + total_a + total_b, 1),
        'AP_ours': float(ap_ours.AP),
        'AP_ref': float(ap_ref.AP),
        'AP50_ours': float(ap_ours.mAPs[0]),
        'AP50_ref': float(ap_ref.mAPs[0]),
        'AP_delta': abs(float(ap_ours.AP) - float(ap_ref.AP)),
        'AP50_delta': abs(float(ap_ours.mAPs[0]) - float(ap_ref.mAPs[0])),
        'per_image_mismatches': [r for r in per_image
                                 if r['extra_ours'] or r['extra_ref']][:50],
    }
    return report


def main():
    parser = argparse.ArgumentParser(description='differential eval vs the '
                                                 'torch reference')
    parser.add_argument('--weight', required=True)
    parser.add_argument('--yaml', default=None)
    parser.add_argument('--limit', type=int, default=0)
    parser.add_argument('--out', default='')
    parser.add_argument('--reference', default=None)
    args, rest = parser.parse_known_args()

    from pqdet_tpu.config import load_config
    cfg = load_config(args.yaml, rest)
    report = run_diffeval(cfg, args.weight, args.limit, args.reference)
    text = json.dumps(report, indent=2)
    print(text)
    if args.out:
        with open(args.out, 'w') as fw:
            fw.write(text)


if __name__ == '__main__':
    main()
