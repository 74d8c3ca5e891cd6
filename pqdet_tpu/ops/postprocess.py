"""On-device post-processing: box recovery + fixed-shape batched NMS.

The reference recovers boxes with an inverse-letterbox affine then calls
torchvision's ``batched_nms`` per image with a host round-trip
(dataset/base_sample.py:98-139, tools.py:540-566). Here both stages are pure
fixed-shape JAX: recovery is vectorised over the batch, and NMS selects a
static top-K candidate set and runs greedy class-offset suppression with an
IoU matrix — no dynamic shapes, no host sync, jit/vmap/pmap friendly.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from pqdet_tpu.ops.boxes import iou


# ----------------------------------------------------------------- recovery

def letterbox_affine(input_size, original_size):
    """Inverse-affine parameters for letterbox-resized inputs (VOC/COCO,
    dataset/voc_sample.py:92-95). Returns (delta(B,2) in (h,w) order,
    ratio(B,1))."""
    ratio = jnp.min(input_size / original_size, axis=-1, keepdims=True)  # (B,1)
    delta = jnp.floor((input_size - jnp.round(ratio * original_size)) / 2)
    return delta, ratio


def ratio_pad_affine(input_size, original_size, resize_ratio: float = 1.25,
                     divisor: int = 32):
    """Inverse-affine for ResizeRatio+PadNearestDivisor eval inputs
    (VisDrone, dataset/visdrone_sample.py:84-88).

    NOTE: intentionally diverges from the reference's
    `_visdrone_affine_bboxes`, which inverts the UNROUNDED 1.25*size — the
    forward pipeline resizes to round(1.25*size) then pads the ROUNDED size
    to the divisor, so the reference's recovered boxes drift by up to
    ~12 original-image pixels when 1.25*dim straddles a divisor boundary.
    This inverse mirrors the forward ops exactly (round-half-even like
    python round, floor-div padding split).
    """
    resized = jnp.round(resize_ratio * original_size)       # ResizeRatio
    padded = jnp.ceil(resized / divisor) * divisor          # PadNearestDivisor
    delta = jnp.floor((padded - resized) / 2)
    ratio = jnp.full(original_size.shape[:-1] + (1,), resize_ratio,
                     original_size.dtype)
    return delta, ratio


def recover_bboxes(pred, input_size, original_size, affine=letterbox_affine):
    """(B, N, 5+C) decoded preds -> (B, N, 4+C) original-image boxes with
    conf folded into the class scores (reference
    recover_bboxes_prediction, dataset/base_sample.py:98-139).

    input_size: (2,) model input (h, w); original_size: (B, 2) image (h, w).
    """
    num_classes = pred.shape[-1] - 5
    coor = pred[..., 0:4]
    conf = pred[..., 4:5]
    prob = pred[..., 5:]

    delta, ratio = affine(input_size, original_size)
    # delta is (h, w): x coords subtract delta[..., 1], y subtract delta[..., 0]
    delta_xyxy = delta[..., [1, 0, 1, 0]][..., None, :]
    coor = (coor - delta_xyxy) / ratio[..., None, :]

    max_xy = (original_size - 1.0)[..., [1, 0]][..., None, :]
    xymin = jnp.maximum(coor[..., :2], 0.0)
    xymax = jnp.minimum(coor[..., 2:], max_xy)
    scores = prob * conf
    return jnp.concatenate([xymin, xymax, scores], axis=-1)


# ---------------------------------------------------------------------- NMS

class NMSResult(NamedTuple):
    boxes: jnp.ndarray    # (K, 4) original-image coordinates
    scores: jnp.ndarray   # (K,)
    classes: jnp.ndarray  # (K,) int32
    valid: jnp.ndarray    # (K,) bool — kept & above threshold
    overflow: jnp.ndarray  # () bool — pool clipped above-threshold candidates


def nms_single(boxes_scores: jnp.ndarray, score_threshold: float,
               iou_threshold: float, max_outputs: int = 256,
               pool_factor: int = 4, method: str = 'nms',
               sigma: float = 0.3) -> NMSResult:
    """Greedy class-offset NMS for one image, fixed output size.

    boxes_scores: (N, 4+C) from recover_bboxes. Every (box, class) pair with
    score > threshold is a candidate (a box can survive for several classes),
    matching torch_nms -> torchvision batched_nms (tools.py:540-566).

    Suppression runs over a candidate POOL of ``max_outputs * pool_factor``
    top-scored pairs (the reference suppresses every above-threshold pair;
    a pool only as large as the output would wrongly drop candidates that
    outrank the threshold but would only surface after suppression removes
    higher-scored duplicates). The kept detections are then compacted,
    score-ordered, into the fixed-size output. ``overflow`` reports when more
    than the pool's worth of (box, class) pairs cleared the threshold — i.e.
    the fixed-shape result may differ from suppressing the full set; callers
    should log it and raise ``pool_factor`` if it ever fires.

    ``method='soft-nms'`` implements the reference's Gaussian soft-NMS
    (tools.py:507-538): sequentially pick the highest-scoring live candidate,
    decay every other same-class candidate by exp(-iou^2/sigma), drop those
    falling below score_threshold, repeat. Because decay only touches
    same-class boxes, a global argmax loop is pick-for-pick identical to the
    reference's per-class loops; output scores are the decayed pick-time
    scores, ordered by pick.
    """
    boxes = boxes_scores[:, :4]
    scores = boxes_scores[:, 4:]
    n, c = scores.shape
    k = min(max(max_outputs * pool_factor, max_outputs), n * c)

    flat = scores.reshape(-1)
    top_scores, top_idx = jax.lax.top_k(flat, k)
    box_idx = top_idx // c
    classes = top_idx % c
    cand = boxes[box_idx]
    valid = top_scores > score_threshold
    overflow = jnp.sum(flat > score_threshold) > k

    if method == 'soft-nms':
        return _soft_nms_pool(cand, classes, top_scores, valid, overflow,
                              score_threshold, sigma, max_outputs, k)
    assert method == 'nms', method

    # separate classes by shifting boxes with a data-dependent offset
    span = jnp.max(boxes) + 1.0
    shifted = cand + (classes.astype(cand.dtype) * span)[:, None]
    iou_mat = iou(shifted[:, None, :], shifted[None, :, :])  # (k, k)

    # strictly-upper-triangular suppression adjacency: j suppresses i when
    # j has higher rank (j < i) and IoU > threshold
    order = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0).squeeze(-1)
    sup = (iou_mat > iou_threshold) & (order[:, None] < order[None, :])  # (j, i)

    # exact greedy NMS as a fixed point: keep[i] = valid[i] and no KEPT
    # higher-ranked j suppresses i. Iterating from keep=valid converges to
    # the sequential-greedy solution in O(longest suppression chain) steps
    # (each pass finalises one more level of the chain), which is far
    # shallower than the K-step sequential loop the reference's batched_nms
    # runs natively.
    def cond(state):
        keep, prev, it = state
        return (it < k) & jnp.any(keep != prev)

    def body(state):
        keep, _, it = state
        suppressed = jnp.any(sup & keep[:, None], axis=0)
        return valid & ~suppressed, keep, it + 1

    keep0 = valid
    keep, _, _ = jax.lax.while_loop(
        cond, body, (valid & ~jnp.any(sup & keep0[:, None], axis=0),
                     keep0, jnp.int32(0)))

    # compact the kept candidates (already score-descending) into the fixed
    # output size: stable argsort on ~keep moves kept rows first in order
    m = min(max_outputs, k)
    sel = jnp.argsort(~keep, stable=True)[:m]
    return NMSResult(cand[sel], top_scores[sel], classes[sel], keep[sel],
                     overflow)


def _soft_nms_pool(cand, classes, top_scores, valid, overflow,
                   score_threshold, sigma, max_outputs, k):
    """Fixed-shape Gaussian soft-NMS over the candidate pool (see nms_single)."""
    iou_mat = iou(cand[:, None, :], cand[None, :, :])               # (k, k)
    same = classes[:, None] == classes[None, :]
    decay = jnp.where(same, jnp.exp(-(iou_mat ** 2) / sigma), 1.0)  # (k, k)
    m = min(max_outputs, k)

    def body(t, state):
        cur, picked, pick_scores, pick_rank = state
        alive = valid & ~picked & (cur > score_threshold)
        i = jnp.argmax(jnp.where(alive, cur, -jnp.inf))
        has = jnp.any(alive)
        onehot = (jnp.arange(k) == i) & has
        picked = picked | onehot
        pick_scores = jnp.where(onehot, cur, pick_scores)
        pick_rank = jnp.where(onehot, t, pick_rank)
        # decay un-picked same-class candidates by the picked row's weights
        cur = jnp.where(has & ~picked, cur * decay[i], cur)
        return cur, picked, pick_scores, pick_rank

    init = (top_scores, jnp.zeros((k,), bool), jnp.zeros((k,), top_scores.dtype),
            jnp.full((k,), k, jnp.int32))
    _, picked, pick_scores, pick_rank = jax.lax.fori_loop(0, m, body, init)

    sel = jnp.argsort(pick_rank)[:m]   # pick order; un-picked (rank k) last
    return NMSResult(cand[sel], pick_scores[sel], classes[sel], picked[sel],
                     overflow)


def nms_batch(boxes_scores: jnp.ndarray, score_threshold: float,
              iou_threshold: float, max_outputs: int = 256,
              pool_factor: int = 4, method: str = 'nms',
              sigma: float = 0.3) -> NMSResult:
    """vmapped NMS over a batch: (B, N, 4+C) -> NMSResult with leading B."""
    return jax.vmap(
        lambda bs: nms_single(bs, score_threshold, iou_threshold, max_outputs,
                              pool_factor, method, sigma)
    )(boxes_scores)


def nms_to_numpy(result: NMSResult):
    """Convert one image's NMSResult to the reference's (M, 6) ndarray
    [x1, y1, x2, y2, score, class] with only valid rows (host side)."""
    import numpy as np
    keep = np.asarray(result.valid)
    out = np.concatenate([
        np.asarray(result.boxes)[keep],
        np.asarray(result.scores)[keep, None],
        np.asarray(result.classes)[keep, None].astype(np.float32),
    ], axis=1)
    return out
