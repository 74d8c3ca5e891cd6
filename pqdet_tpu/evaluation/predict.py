"""The shared inference pipeline: forward -> recover -> NMS, jitted once.

Single source of truth for the eval/predict wiring used by the trainer's
per-epoch evaluation, the bench CLI, the prune CLI and single-image
predict (previously four near-identical copies).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from pqdet_tpu.config import size_fix
from pqdet_tpu.data.samples import RECOVER_AFFINE_REGISTER
from pqdet_tpu.ops.postprocess import nms_batch, nms_to_numpy, recover_bboxes
from pqdet_tpu.ops.preprocess import device_normalize


def build_predict_pipeline(network, cfg, compute_dtype=None,
                           apply_fn: Optional[Callable] = None,
                           fused_ir: Optional[dict] = None):
    """Returns jitted ``run(params, images, shapes) -> NMSResult``.

    ``apply_fn(params, images) -> (B, N, 5+C)`` overrides the forward (used
    for the int8 executor); default is the fused fp network apply.
    ``fused_ir`` (ops.pallas_fused.prepare_fused_ir table) swaps the
    inverted-residual chains for the VMEM-resident Pallas kernel.
    """
    affine = RECOVER_AFFINE_REGISTER[cfg.dataset.name.lower()]
    input_size = np.array(size_fix(cfg.eval.input_size), np.float32)
    score_thr = cfg.eval.score_threshold
    iou_thr = cfg.eval.iou_threshold
    max_det = cfg.eval.max_detections
    pool_factor = getattr(cfg.eval, 'pool_factor', 4)
    method = getattr(cfg.eval, 'nms_method', 'nms')
    sigma = getattr(cfg.eval, 'nms_sigma', 0.3)

    if apply_fn is None:
        s2d = int(getattr(cfg.eval, 's2d_stem', 0))

        def apply_fn(params, images):
            preds, _ = network.apply(params, {}, images,
                                     compute_dtype=compute_dtype,
                                     fused_ir=fused_ir, s2d_stem=s2d)
            return preds

    @jax.jit
    def run(params, images, shapes):
        # uint8 eval batches normalize on device; float inputs (an
        # eval.host_normalize chain, or hand-built arrays) pass through
        preds = apply_fn(params, device_normalize(images))
        recovered = recover_bboxes(preds, jnp.asarray(input_size), shapes,
                                   affine=affine)
        return nms_batch(recovered, score_thr, iou_thr, max_det,
                         pool_factor, method, sigma)

    return run


def make_batch_predict(run, params) -> Callable[[Dict], List[np.ndarray]]:
    """Wrap a pipeline into the Evaluator's predict contract:
    batch dict -> list of per-image (M, 6) numpy detections.

    Two saturation modes are detected and loudly warned about, once per
    eval each (the torch reference's NMS output is unbounded,
    tools.py:540-566, so either cap silently drops detections on crowded
    images relative to it):

    - pool overflow: more above-threshold (box, class) pairs than
      ``max_detections * pool_factor`` — candidates beyond the pool never
      enter NMS. Fix: raise ``eval.pool_factor``.
    - output saturation: an image KEPT exactly ``max_detections`` boxes,
      i.e. the fixed-size output is full and further survivors were
      dropped (round-3 diffeval lost 64 detections on 3 max-crowding
      images this way). Fix: raise ``eval.max_detections``.
    """
    warned = {'overflow': False, 'saturated': False}

    def predict(batch):
        res = run(params, jnp.asarray(batch['image']),
                  jnp.asarray(batch['shape']))
        res = jax.tree.map(np.asarray, res)  # one device->host transfer
        n = batch['count']
        max_det = res.valid.shape[1]
        n_over = int(res.overflow[:n].sum())
        if n_over and not warned['overflow']:
            warned['overflow'] = True
            print(f'WARNING: NMS candidate pool overflowed on {n_over} '
                  f'image(s) in a batch (pool = eval.max_detections * '
                  f'eval.pool_factor top-scored candidates; the rest '
                  f'never enter NMS). Double eval.pool_factor.')
        n_sat = int((res.valid[:n].sum(axis=1) == max_det).sum())
        if n_sat and not warned['saturated']:
            warned['saturated'] = True
            print(f'WARNING: NMS output saturated on {n_sat} image(s) in '
                  f'a batch — exactly eval.max_detections={max_det} boxes '
                  f'kept, so lower-scored survivors were dropped (the '
                  f'reference pipeline is unbounded). Raise '
                  f'eval.max_detections (e.g. {2 * max_det}).')
        return [nms_to_numpy(jax.tree.map(lambda x: x[i], res))
                for i in range(n)]
    return predict
