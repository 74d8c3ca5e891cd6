"""YOLO per-scale loss in pure JAX.

Numerical parity with the reference loss (model/loss.py:22-115):
- bbox loss selectable: giou / diou / ciou / iou / smooth-l1 (beta=1/9)
- confidence loss: focal(alpha=0.75, gamma=2) * BCE, background mask from
  max-IoU(pred, gt boxes) < ignore_thresh
- class loss: 2 * focal(alpha=0.5, gamma=2) * BCE
- everything weighted by the mixup-weight channel, summed over the grid and
  meaned over the batch.

GT boxes come padded to a static length; zero-padding rows have IoU ~0 with
any prediction so they never clear ignore_thresh — the same trick the
reference's ragged collate padding relies on (dataset/train_dataset.py:16-43).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from pqdet_tpu.ops import boxes as box_ops

# hardcoded gains, reference model/loss.py:35-41
BBOX_LOSS_GAIN = 1.0
CONF_LOSS_GAIN = 1.0
CLS_LOSS_GAIN = 2.0
CONF_LOSS_ALPHA = 0.75
CLS_LOSS_ALPHA = 0.5
CONF_LOSS_BETA = 2.0
CLS_LOSS_BETA = 2.0

# torch BCELoss clamps each log term at -100
_BCE_CLAMP = 100.0


def bce(pred, target):
    """Elementwise binary cross entropy on probabilities, with torch's
    -100 log clamp (log(0) = -inf saturates to the clamp, grad 0)."""
    log_p = jnp.maximum(jnp.log(pred), -_BCE_CLAMP)
    log_1p = jnp.maximum(jnp.log1p(-pred), -_BCE_CLAMP)
    return -(target * log_p + (1.0 - target) * log_1p)


def focal(target, actual, alpha=0.5, gamma=2.0):
    # reference model/loss.py:17-20
    alpha_t = 2.0 * jnp.abs(target - 1.0 + alpha)
    return alpha_t * jnp.power(jnp.abs(target - actual), gamma)


def smooth_l1(pred, target, beta=1.0 / 9.0):
    # reference model/loss.py:7-15 (mean over last dim, keepdims)
    n = jnp.abs(pred - target)
    loss = jnp.where(n < beta, 0.5 * n * n / beta, n - 0.5 * beta)
    return jnp.mean(loss, axis=-1, keepdims=True)


_IOU_LOSS = {
    'giou': box_ops.giou,
    'diou': box_ops.diou,
    'ciou': box_ops.ciou,
    'iou': box_ops.iou,
}


def loss_per_scale(pred: jnp.ndarray, label: jnp.ndarray, gt_boxes: jnp.ndarray,
                   stride: int, num_classes: int, bbox_loss_type: str = 'giou',
                   ignore_thresh: float = 0.5, l1_loss_gain: float = 0.1,
                   bbox_loss_gain: float = BBOX_LOSS_GAIN,
                   conf_loss_gain: float = CONF_LOSS_GAIN,
                   cls_loss_gain: float = CLS_LOSS_GAIN,
                   conf_loss_alpha: float = CONF_LOSS_ALPHA,
                   cls_loss_alpha: float = CLS_LOSS_ALPHA,
                   conf_loss_beta: float = CONF_LOSS_BETA,
                   cls_loss_beta: float = CLS_LOSS_BETA):
    """Compute (loss, bbox_loss, conf_loss, prob_loss) for one scale.

    pred:     (B, H, W, A, 5+C) decoded predictions
    label:    (B, H, W, A, 6+C) [x1 y1 x2 y2, objectness, C smoothed one-hot,
              mixup weight]
    gt_boxes: (B, N, 4) zero-padded raw GT corner boxes for this scale
    """
    pred = pred.astype(jnp.float32)
    label = label.astype(jnp.float32)
    gt_boxes = gt_boxes.astype(jnp.float32)

    h, w = pred.shape[1:3]
    in_area = float(stride * h) * float(stride * w)

    pred_coor = pred[..., 0:4]
    pred_conf = pred[..., 4:5]
    pred_prob = pred[..., 5:]

    label_coor = label[..., 0:4]
    respond_bbox = label[..., 4:5]
    label_prob = label[..., 5:5 + num_classes]
    label_mixw = label[..., -1:]

    bbox_wh = label_coor[..., 2:] - label_coor[..., :2]
    bbox_loss_scale = 2.0 - bbox_wh[..., 0:1] * bbox_wh[..., 1:2] / in_area

    if bbox_loss_type == 'l1':
        bbox_loss = respond_bbox * bbox_loss_scale * \
            smooth_l1(pred_coor, label_coor) * l1_loss_gain
    elif bbox_loss_type in _IOU_LOSS:
        quality = _IOU_LOSS[bbox_loss_type](pred_coor, label_coor)[..., None]
        bbox_loss = respond_bbox * bbox_loss_scale * (1.0 - quality)
    else:
        raise NotImplementedError(bbox_loss_type)
    bbox_loss = bbox_loss * bbox_loss_gain

    # background mask: anchors whose best IoU against any raw GT box is below
    # ignore_thresh (reference model/loss.py:85-90). stop_gradient: the
    # (B, H, W, A, N) matrix only feeds a comparison (zero gradient in the
    # reference too — torch comparisons don't backprop), so guarantee XLA
    # never materialises its adjoint instead of relying on DCE.
    pair_iou = box_ops.iou(
        jax.lax.stop_gradient(pred_coor)[:, :, :, :, None, :],
        gt_boxes[:, None, None, None, :, :])
    max_iou = jnp.max(pair_iou, axis=-1)[..., None]
    respond_bgd = (1.0 - respond_bbox) * (max_iou < ignore_thresh).astype(jnp.float32)

    conf_focal = focal(respond_bbox, pred_conf, alpha=conf_loss_alpha, gamma=conf_loss_beta)
    conf_bce = bce(pred_conf, respond_bbox)
    conf_loss = conf_loss_gain * conf_focal * (
        respond_bbox * conf_bce + respond_bgd * conf_bce)

    class_focal = focal(label_prob, pred_prob, alpha=cls_loss_alpha, gamma=cls_loss_beta)
    prob_loss = cls_loss_gain * class_focal * respond_bbox * bce(pred_prob, label_prob)

    def _reduce(x):
        return jnp.mean(jnp.sum(x * label_mixw, axis=(1, 2, 3, 4)), axis=0, keepdims=True)

    bbox_loss = _reduce(bbox_loss)
    conf_loss = _reduce(conf_loss)
    prob_loss = _reduce(prob_loss)
    total = bbox_loss + conf_loss + prob_loss
    return total, bbox_loss, conf_loss, prob_loss


def sum_scale_losses(per_scale) -> Dict[str, jnp.ndarray]:
    """Combine per-head loss 4-tuples into the reference's loss dict
    (model/interpreter.py:77-85)."""
    totals = [sum(parts) for parts in zip(*per_scale)]
    per_branch = [ls[1] + ls[2] + ls[3] for ls in per_scale]
    return {
        'loss': totals[0],
        'giou_loss': totals[1],
        'conf_loss': totals[2],
        'class_loss': totals[3],
        'loss_per_branch': per_branch,
    }
