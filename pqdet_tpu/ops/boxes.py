"""Box geometry ops: the IoU family in JAX (+numpy twins for the host-side
label pipeline). Semantics match the reference implementations
(tools.py:335-505): corner-format (xmin, ymin, xmax, ymax) boxes, broadcast
over leading dims, last dim is the coordinate dim.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def _areas(boxes):
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def iou(boxes1, boxes2):
    """Plain IoU (reference iou_calc3, tools.py:357-376). Degenerate overlap
    yields 0; division is unguarded exactly like the reference."""
    area1, area2 = _areas(boxes1), _areas(boxes2)
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1 + area2 - inter
    return inter / union


def _iou_union_enclose(boxes1, boxes2):
    area1, area2 = _areas(boxes1), _areas(boxes2)
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1 + area2 - inter
    enc_lt = jnp.minimum(boxes1[..., :2], boxes2[..., :2])
    enc_rb = jnp.maximum(boxes1[..., 2:], boxes2[..., 2:])
    enc_wh = jnp.maximum(enc_rb - enc_lt, 0.0)
    enclose = enc_wh[..., 0] * enc_wh[..., 1]
    return inter / union, union, enclose, enc_lt, enc_rb


def giou(boxes1, boxes2):
    """Generalised IoU (reference tools.py:378-404)."""
    i, union, enclose, _, _ = _iou_union_enclose(boxes1, boxes2)
    return i - (enclose - union) / enclose


def _center_distance_terms(boxes1, boxes2, enc_lt, enc_rb):
    c1 = (boxes1[..., :2] + boxes1[..., 2:]) / 2
    c2 = (boxes2[..., :2] + boxes2[..., 2:]) / 2
    d_center = jnp.sum(jnp.square(c1 - c2), axis=-1)
    d_enclose = jnp.sum(jnp.square(enc_lt - enc_rb), axis=-1)
    return d_center, d_enclose


def diou(boxes1, boxes2):
    """Distance IoU. NOTE: reproduces the reference's signed form
    GIOU + d_center/d_enclose (tools.py:406-437) for loss parity."""
    i, union, enclose, enc_lt, enc_rb = _iou_union_enclose(boxes1, boxes2)
    g = i - (enclose - union) / enclose
    d_center, d_enclose = _center_distance_terms(boxes1, boxes2, enc_lt, enc_rb)
    return g + d_center / d_enclose


def ciou(boxes1, boxes2):
    """Complete IoU (reference tools.py:439-477); the aspect-ratio weight
    alpha is treated as a constant (stop_gradient), like the reference's
    torch.no_grad block."""
    w1 = boxes1[..., 2] - boxes1[..., 0]
    h1 = boxes1[..., 3] - boxes1[..., 1]
    w2 = boxes2[..., 2] - boxes2[..., 0]
    h2 = boxes2[..., 3] - boxes2[..., 1]
    i, union, enclose, enc_lt, enc_rb = _iou_union_enclose(boxes1, boxes2)
    g = i - (enclose - union) / enclose
    d_center, d_enclose = _center_distance_terms(boxes1, boxes2, enc_lt, enc_rb)
    # arctan2(w, h) == arctan(w/h) for h > 0 but stays finite for the
    # zero-padded label boxes (the reference's arctan(w/h) NaNs there,
    # tools.py:472)
    v = (4.0 / (math.pi ** 2)) * jnp.square(jnp.arctan2(w1, h1) - jnp.arctan2(w2, h2))
    alpha = jax.lax.stop_gradient(v / (1.0 - i + v))
    return g + d_center / d_enclose + alpha * v


# ------------------------------------------------------------- numpy twins
# (host-side label assignment / legacy NMS; reference tools.py:335-355,479-505)

def iou_np(boxes1: np.ndarray, boxes2: np.ndarray) -> np.ndarray:
    area1 = (boxes1[..., 2] - boxes1[..., 0]) * (boxes1[..., 3] - boxes1[..., 1])
    area2 = (boxes2[..., 2] - boxes2[..., 0]) * (boxes2[..., 3] - boxes2[..., 1])
    lt = np.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = np.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = np.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1 + area2 - inter
    return inter / np.maximum(union, 1e-14)


def iou_xywh_np(boxes1: np.ndarray, boxes2: np.ndarray) -> np.ndarray:
    """IoU of (cx, cy, w, h) boxes (reference iou_xywh_numpy, tools.py:479)."""
    area1 = boxes1[..., 2] * boxes1[..., 3]
    area2 = boxes2[..., 2] * boxes2[..., 3]
    b1 = np.concatenate([boxes1[..., :2] - boxes1[..., 2:] * 0.5,
                         boxes1[..., :2] + boxes1[..., 2:] * 0.5], axis=-1)
    b2 = np.concatenate([boxes2[..., :2] - boxes2[..., 2:] * 0.5,
                         boxes2[..., :2] + boxes2[..., 2:] * 0.5], axis=-1)
    lt = np.maximum(b1[..., :2], b2[..., :2])
    rb = np.minimum(b1[..., 2:], b2[..., 2:])
    wh = np.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (area1 + area2 - inter)
