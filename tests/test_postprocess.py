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


def _soft_nms_oracle(boxes, scores_flat, classes, score_thr, sigma):
    """Mirror of the reference's gaussian soft-NMS (tools.py:507-538) over a
    (box, class) candidate list: per class, pick argmax, decay the rest by
    exp(-iou^2/sigma), drop below-threshold, repeat."""
    picked = []
    for cl in sorted(set(classes.tolist())):
        idx = [i for i in range(len(classes)) if classes[i] == cl
               and scores_flat[i] > score_thr]
        cur = {i: float(scores_flat[i]) for i in idx}
        while cur:
            i = max(cur, key=cur.get)
            picked.append((i, cur[i]))
            del cur[i]
            a = boxes[i]
            for j in list(cur):
                b = boxes[j]
                lt = np.maximum(a[:2], b[:2])
                rb = np.minimum(a[2:], b[2:])
                wh = np.maximum(rb - lt, 0)
                inter = wh[0] * wh[1]
                union = ((a[2] - a[0]) * (a[3] - a[1]) +
                         (b[2] - b[0]) * (b[3] - b[1]) - inter)
                cur[j] *= np.exp(-(inter / union) ** 2 / sigma)
                if cur[j] <= score_thr:
                    del cur[j]
    return picked


def test_soft_nms_matches_reference_semantics():
    for seed in range(3):
        boxes, scores = _random_boxes(48, 4, seed=seed)
        bs = jnp.array(np.concatenate([boxes, scores], -1))
        res = nms_single(bs, 0.25, 0.45, max_outputs=256, method='soft-nms',
                         sigma=0.3)
        mine = nms_to_numpy(res)
        # oracle over the same (box, class) candidate universe
        n, c = scores.shape
        flat = scores.reshape(-1)
        classes = np.arange(n * c) % c
        box_of = np.arange(n * c) // c
        oracle = _soft_nms_oracle(boxes[box_of], flat, classes, 0.25, 0.3)
        assert len(mine) == len(oracle), f'{len(mine)} vs {len(oracle)}'
        oracle_scores = sorted((s for _, s in oracle), reverse=True)
        np.testing.assert_allclose(sorted(mine[:, 4], reverse=True),
                                   oracle_scores, rtol=1e-5)
        oracle_keys = {(int(box_of[i]), int(classes[i])) for i, _ in oracle}
        mine_keys = set()
        for row in mine:
            # map the output box back to its source index by coordinates
            src = int(np.argmin(np.abs(boxes - row[:4]).sum(-1)))
            mine_keys.add((src, int(row[5])))
        assert mine_keys == oracle_keys


def test_nms_real_scale_voc():
    """The real eval shape: 16128 anchors x 20 classes at score_thr 0.1
    (reference onnx_exporter.py:374, config.py:117). Checks the fixed pool
    does not clip (overflow False) and the kept set matches the greedy
    oracle run over every above-threshold pair."""
    rng = np.random.RandomState(7)
    n, c = 16128, 20
    lt = rng.rand(n, 2) * 460
    wh = rng.rand(n, 2) * 120 + 8
    boxes = np.concatenate([lt, lt + wh], -1).astype(np.float32)
    # realistic post-sigmoid score profile: conf*prob is tiny for nearly all
    # anchors, with a few hundred confident detections
    scores = (rng.rand(n, c) ** 8 * 0.1).astype(np.float32)
    hot = rng.choice(n, 300, replace=False)
    scores[hot, rng.randint(0, c, 300)] = rng.rand(300) * 0.9 + 0.1

    bs = jnp.array(np.concatenate([boxes, scores], -1))
    # 512 outputs so the oracle's full kept set (~300 here) fits: the cap is
    # a separate, documented truncation; this test isolates pool coverage
    res = nms_single(bs, 0.1, 0.45, max_outputs=512, pool_factor=4)
    assert not bool(res.overflow), 'pool must cover VOC-scale candidates'
    mine = nms_to_numpy(res)
    oracle = _greedy_nms_oracle(boxes, scores, 0.1, 0.45)
    assert len(mine) == len(oracle)
    np.testing.assert_allclose(mine[:, 4],
                               sorted([s for s, _, _ in oracle], reverse=True),
                               rtol=1e-6)


def test_nms_overflow_flag():
    """More above-threshold pairs than the pool -> overflow fires and the
    kept set is the top-scored subset (documented clipping telemetry)."""
    boxes, scores = _random_boxes(64, 5, seed=1)
    scores[:] = 0.9  # every pair above threshold: 320 pairs > pool 16*2=32
    bs = jnp.array(np.concatenate([boxes, scores], -1))
    res = nms_single(bs, 0.3, 0.45, max_outputs=16, pool_factor=2)
    assert bool(res.overflow)
    res2 = nms_single(bs, 0.3, 0.45, max_outputs=512, pool_factor=4)
    assert not bool(res2.overflow)


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


def test_nms_crowding_300_objects_saturates_then_fits():
    """Crowding regression (round-3 diffeval lost 64 detections on 3
    max-crowding images at the eval.max_detections=256 cap): 320 disjoint
    confident objects saturate a 256-slot output exactly, and a bumped cap
    keeps every one (the torch reference pipeline is unbounded,
    tools.py:540-566)."""
    n, c = 320, 20
    boxes = np.zeros((n, 4), np.float32)
    scores = np.zeros((n, c), np.float32)
    rng = np.random.RandomState(0)
    for i in range(n):
        # disjoint 8x8 grid cells on a 512 canvas: 18x18 cells > 320
        r, col = divmod(i, 18)
        x, y = col * 28.0, r * 28.0
        boxes[i] = [x + 1, y + 1, x + 25, y + 25]
        scores[i, i % c] = 0.5 + 0.4 * rng.rand()
    bs = jnp.array(np.concatenate([boxes, scores], -1))

    sat = nms_single(bs, 0.1, 0.45, max_outputs=256, pool_factor=4)
    assert int(np.asarray(sat.valid).sum()) == 256  # output cap hit

    fit = nms_single(bs, 0.1, 0.45, max_outputs=512, pool_factor=4)
    assert int(np.asarray(fit.valid).sum()) == n  # every object kept
    kept = nms_to_numpy(fit)
    assert kept.shape[0] == n


def test_batch_predict_saturation_warning(capsys):
    """make_batch_predict must loudly flag a saturated fixed-size NMS
    output (kept == eval.max_detections) with the suggested bump."""
    from pqdet_tpu.evaluation.predict import make_batch_predict
    from pqdet_tpu.ops.postprocess import NMSResult

    def fake_run(params, images, shapes, k=256, full=True):
        nkeep = k if full else k // 2
        valid = np.arange(k) < nkeep
        return NMSResult(
            boxes=jnp.zeros((1, k, 4), jnp.float32),
            scores=jnp.where(jnp.asarray(valid), 0.9, 0.0)[None, :],
            classes=jnp.zeros((1, k), jnp.int32),
            valid=jnp.asarray(valid)[None, :],
            overflow=jnp.zeros((1,), bool))

    batch = {'image': np.zeros((1, 8, 8, 3), np.uint8),
             'shape': np.array([[8.0, 8.0]], np.float32), 'count': 1}

    predict = make_batch_predict(fake_run, params=None)
    dets = predict(batch)
    out = capsys.readouterr().out
    assert 'Raise eval.max_detections' in out and '512' in out
    assert dets[0].shape == (256, 6)

    predict2 = make_batch_predict(
        lambda p, i, s: fake_run(p, i, s, full=False), params=None)
    predict2(batch)
    assert 'max_detections' not in capsys.readouterr().out
