"""Recovery + NMS vs independent numpy greedy oracles."""

import numpy as np
import jax.numpy as jnp

from pqdet_tpu.ops.postprocess import (letterbox_affine, nms_batch, nms_single,
                                       nms_to_numpy, recover_bboxes)


def _greedy_nms_oracle(boxes, scores, score_thr, iou_thr):
    """Class-aware greedy NMS over (N,4) boxes and (N,C) scores."""
    n, c = scores.shape
    cands = []
    for i in range(n):
        for cl in range(c):
            if scores[i, cl] > score_thr:
                cands.append((scores[i, cl], i, cl))
    cands.sort(key=lambda t: -t[0])
    kept = []
    for s, i, cl in cands:
        ok = True
        for (ks, ki, kcl) in kept:
            if kcl != cl:
                continue
            a, b = boxes[i], boxes[ki]
            lt = np.maximum(a[:2], b[:2])
            rb = np.minimum(a[2:], b[2:])
            wh = np.maximum(rb - lt, 0)
            inter = wh[0] * wh[1]
            union = ((a[2] - a[0]) * (a[3] - a[1]) +
                     (b[2] - b[0]) * (b[3] - b[1]) - inter)
            if inter / union > iou_thr:
                ok = False
                break
        if ok:
            kept.append((s, i, cl))
    return kept


def _random_boxes(n, c, seed=0, size=200.0):
    rng = np.random.RandomState(seed)
    lt = rng.rand(n, 2) * (size - 40)
    wh = rng.rand(n, 2) * 40 + 5
    boxes = np.concatenate([lt, lt + wh], -1).astype(np.float32)
    scores = (rng.rand(n, c) ** 2).astype(np.float32)
    return boxes, scores


def test_nms_matches_greedy_oracle():
    for seed in range(3):
        boxes, scores = _random_boxes(64, 5, seed=seed)
        bs = jnp.array(np.concatenate([boxes, scores], -1))
        res = nms_single(bs, 0.3, 0.45, max_outputs=320)
        mine = nms_to_numpy(res)
        oracle = _greedy_nms_oracle(boxes, scores, 0.3, 0.45)
        assert len(mine) == len(oracle), f'{len(mine)} vs {len(oracle)}'
        # same (box index, class) set with same score ordering
        oracle_set = {(i, cl) for _, i, cl in oracle}
        for row in mine:
            match = [(i, cl) for s, i, cl in oracle
                     if cl == int(row[5]) and abs(s - row[4]) < 1e-6]
            assert match, f'unmatched row {row}'
        np.testing.assert_allclose(mine[:, 4], sorted([s for s, _, _ in oracle],
                                                      reverse=True), rtol=1e-6)


def test_nms_batch_shape():
    boxes, scores = _random_boxes(32, 4)
    bs = jnp.array(np.concatenate([boxes, scores], -1))[None].repeat(2, 0)
    res = nms_batch(bs, 0.3, 0.45, max_outputs=64)
    assert res.boxes.shape == (2, 64, 4)
    assert res.valid.shape == (2, 64)


def test_nms_no_candidates():
    boxes, scores = _random_boxes(16, 3)
    scores[:] = 0.0
    bs = jnp.array(np.concatenate([boxes, scores], -1))
    res = nms_single(bs, 0.3, 0.45, max_outputs=32)
    assert not bool(res.valid.any())
    assert nms_to_numpy(res).shape == (0, 6)


def test_recover_letterbox_roundtrip():
    """Boxes letterboxed into the input frame must map back to original
    coordinates (up to the floor/round of the forward letterbox)."""
    rng = np.random.RandomState(0)
    input_size = np.array([512.0, 512.0], np.float32)
    orig = np.array([[375.0, 500.0], [333.0, 250.0]], np.float32)  # (B,2) h,w
    ratio = np.min(input_size / orig, axis=-1, keepdims=True)
    delta = np.floor((input_size - np.round(ratio * orig)) / 2)  # (B,2) h,w

    n = 20
    orig_boxes = np.zeros((2, n, 4), np.float32)
    for b in range(2):
        lt = rng.rand(n, 2) * (orig[b, ::-1] * 0.6)
        wh = rng.rand(n, 2) * 50 + 10
        orig_boxes[b] = np.concatenate([lt, np.minimum(lt + wh, orig[b, ::-1] - 1)], -1)
    # forward letterbox into network frame
    net_boxes = orig_boxes * np.repeat(ratio, 4, -1)[:, None, :] \
        + delta[:, [1, 0, 1, 0]][:, None, :]
    pred = np.concatenate([
        net_boxes,
        np.full((2, n, 1), 0.8, np.float32),
        np.full((2, n, 3), 0.5, np.float32)], -1)

    out = recover_bboxes(jnp.array(pred), jnp.array(input_size), jnp.array(orig))
    np.testing.assert_allclose(np.asarray(out)[..., :4], orig_boxes, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out)[..., 4:], 0.4, rtol=1e-6)


def test_recover_clamps():
    input_size = jnp.array([64.0, 64.0])
    orig = jnp.array([[48.0, 64.0]])
    pred = jnp.array([[[-50.0, -50.0, 500.0, 500.0, 1.0, 1.0]]])
    out = np.asarray(recover_bboxes(pred, input_size, orig))
    assert out[0, 0, 0] >= 0 and out[0, 0, 1] >= 0
    assert out[0, 0, 2] <= 63 and out[0, 0, 3] <= 47
