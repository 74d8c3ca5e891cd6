"""On-device YOLO label assignment.

The reference builds per-scale label grids on the HOST inside DataLoader
workers (dataset/train_dataset.py:109-150 create_label) and ships them to
the device — for bs=16@512 that is ~27 MB of mostly-zero float32 grids per
batch, plus per-sample grid zeroing/scatter time on the loading cores.

TPU-natively the batch carries only the padded raw GT boxes
(B, max_gt, 6) ≈ 25 KB, and the grids are materialised inside the jitted
train step from those boxes: a handful of scatter/gather ops per scale,
fused by XLA, negligible against the conv time. Host->device bytes for the
whole batch drop ~4x (together with the uint8 image path ~8x vs round 2)
and the loader sheds its hottest non-decode cost.

Semantics are assign_labels' (data/train_data.py) exactly — same smoothed
one-hot, same anchor-IoU threshold with global argmax fallback, same
LAST-box-wins overwrite at contended (cell, anchor) slots (scatter-max of
the box index), same per-scale padded box lists in box order — proven by
tests/test_data.py::test_device_label_assignment_parity. One deliberate
difference: the device path sees only the first ``max_gt`` boxes (the
batch is padded to that), where the host path grids all N; for crowded
datasets raise model.max_gt_boxes (the host path warns at the same
boundary).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def assign_labels_device(gt: jnp.ndarray, input_size: Tuple[int, int],
                         strides: Sequence[int], anchors,
                         num_classes: int, gt_per_grid: int = 3,
                         iou_threshold: float = 0.3,
                         deta: float = 0.01):
    """Padded GT boxes -> per-scale label grids + per-scale padded box lists.

    gt: (B, G, 6) float32 [x1, y1, x2, y2, class, mixup_weight]; padding
    rows are all-zero (degenerate boxes are masked out by x2 > x1 etc.).
    Returns a 6-tuple matching the host pipeline's batch['targets']:
    3 grids (B, H/s, W/s, A, 6+C) then 3 box lists (B, G, 4).
    """
    H, W = int(input_size[0]), int(input_size[1])
    strides_f = jnp.asarray(np.asarray(strides, np.float32))
    anchors_f = jnp.asarray(np.asarray(anchors, np.float32))  # (S*A, 2)
    S = len(strides)
    A = gt_per_grid
    C = num_classes
    G = gt.shape[1]

    def one(gt_i):                                     # (G, 6)
        coor = gt_i[:, :4]
        valid = (coor[:, 2] > coor[:, 0]) & (coor[:, 3] > coor[:, 1])
        cls_idx = gt_i[:, 4].astype(jnp.int32)
        mixw = gt_i[:, 5]
        cxy = (coor[:, 2:4] + coor[:, :2]) * 0.5       # (G, 2)
        wh = coor[:, 2:4] - coor[:, :2]                # (G, 2)

        # smoothed one-hot (train_data.py smooth_onehot semantics)
        onehot = jnp.full((G, C), deta / C, jnp.float32)
        onehot = onehot.at[jnp.arange(G), jnp.clip(cls_idx, 0, C - 1)] \
            .add(1.0 - deta)

        xy_idx = jnp.floor(cxy[:, None, :] / strides_f[None, :, None]
                           ).astype(jnp.int32)         # (G, S, 2)
        centers = (xy_idx.astype(jnp.float32) + 0.5) * strides_f[None, :, None]

        # IoU(box, anchor-at-center), all (G, S*A) pairs — identical
        # arithmetic to the numpy host path for bit-equal threshold calls
        a_cxy = jnp.repeat(centers, A, axis=1)         # (G, S*A, 2)
        a_wh = jnp.broadcast_to(anchors_f[None], (G, S * A, 2))
        b_min = cxy[:, None] - wh[:, None] * 0.5
        b_max = cxy[:, None] + wh[:, None] * 0.5
        a_min = a_cxy - a_wh * 0.5
        a_max = a_cxy + a_wh * 0.5
        inter = jnp.prod(jnp.clip(jnp.minimum(b_max, a_max)
                                  - jnp.maximum(b_min, a_min), 0, None),
                         axis=-1)
        union = (wh[:, 0] * wh[:, 1])[:, None] + a_wh[..., 0] * a_wh[..., 1] \
            - inter
        ious = inter / jnp.maximum(union, 1e-12)       # (G, S*A)

        mask = ious > iou_threshold
        none_hit = ~mask.any(axis=1)
        fallback = jax.nn.one_hot(jnp.argmax(ious, axis=1), S * A,
                                  dtype=jnp.bool_)
        mask = (mask | (none_hit[:, None] & fallback)) & valid[:, None]

        entries = jnp.concatenate(
            [coor, jnp.ones((G, 1), jnp.float32), onehot, mixw[:, None]],
            axis=1)                                    # (G, 6+C)
        # background cell: all zero except the mixup-weight channel
        background = jnp.zeros((6 + C,), jnp.float32).at[-1].set(1.0)

        labels, boxlists = [], []
        gidx = jnp.arange(G, dtype=jnp.int32)
        for s in range(S):
            h, w = H // int(strides[s]), W // int(strides[s])
            x, y = xy_idx[:, s, 0], xy_idx[:, s, 1]
            inb = (0 <= y) & (y < h) & (0 <= x) & (x < w)
            m = mask[:, s * A:(s + 1) * A] & inb[:, None]        # (G, A)
            pos = (y * w + x)[:, None] * A + jnp.arange(A)[None]  # (G, A)
            pos = jnp.where(m, pos, h * w * A)                    # OOB drop
            # LAST-box-wins == highest box index wins -> scatter-max of g
            winner = jnp.full((h * w * A,), -1, jnp.int32)
            winner = winner.at[pos.reshape(-1)].max(
                jnp.broadcast_to(gidx[:, None], (G, A)).reshape(-1),
                mode='drop')
            grid = jnp.where(winner[:, None] >= 0,
                             entries[jnp.clip(winner, 0)], background[None])
            labels.append(grid.reshape(h, w, A, 6 + C))

            # per-scale padded box list, box order preserved
            hit = m.any(axis=1)
            slot = jnp.cumsum(hit.astype(jnp.int32)) - 1
            slot = jnp.where(hit, slot, G)                        # OOB drop
            boxes = jnp.zeros((G, 4), jnp.float32).at[slot].set(
                coor, mode='drop')
            boxlists.append(boxes)
        return tuple(labels) + tuple(boxlists)

    outs = jax.vmap(one)(gt)
    return tuple(outs)


def label_assigner_from_config(config):
    """(gt, (H, W)) -> targets closure bound to the model's anchor/stride
    config, for dtype/key-dispatched use inside train steps."""
    import numpy as np
    strides = [int(s) for s in config.model.strides]
    anchors = np.asarray(config.model.anchors, np.float32)
    nc = len(config.dataset.classes)
    gpg = int(config.model.gt_per_grid)
    thr = float(config.model.anchors_iou_threshold)

    def fn(gt, input_size):
        return assign_labels_device(gt, input_size, strides, anchors, nc,
                                    gt_per_grid=gpg, iou_threshold=thr)
    return fn
