"""YOLO decode + loss numerics against independent numpy oracles."""

import numpy as np
import jax
import jax.numpy as jnp

from pqdet_tpu.model.decode import decode
from pqdet_tpu.model.loss import bce, focal, loss_per_scale, smooth_l1
from pqdet_tpu.ops import boxes as box_ops


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def test_decode_oracle():
    b, h, w, a, nc, stride = 2, 4, 3, 3, 5, 16
    rng = np.random.RandomState(0)
    raw = rng.randn(b, h, w, a * (5 + nc)).astype(np.float32)
    out = np.asarray(decode(jnp.array(raw), nc, stride))
    assert out.shape == (b, h, w, a, 5 + nc)
    r = raw.reshape(b, h, w, a, 5 + nc)
    for y in range(h):
        for x in range(w):
            cx, cy = x + 0.5, y + 0.5
            np.testing.assert_allclose(
                out[:, y, x, :, 0], (cx - np.exp(r[:, y, x, :, 0])) * stride,
                rtol=1e-4, atol=1e-4)
            np.testing.assert_allclose(
                out[:, y, x, :, 1], (cy - np.exp(r[:, y, x, :, 1])) * stride,
                rtol=1e-4, atol=1e-4)
            np.testing.assert_allclose(
                out[:, y, x, :, 2], (cx + np.exp(r[:, y, x, :, 2])) * stride,
                rtol=1e-4, atol=1e-4)
            np.testing.assert_allclose(
                out[:, y, x, :, 3], (cy + np.exp(r[:, y, x, :, 3])) * stride,
                rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(out[..., 4:], _sigmoid(r[..., 4:]), rtol=1e-5)


def test_iou_family_basics():
    a = jnp.array([[0., 0., 10., 10.]])
    b = jnp.array([[0., 0., 10., 10.]])
    assert np.isclose(float(box_ops.iou(a, b)[0]), 1.0)
    assert np.isclose(float(box_ops.giou(a, b)[0]), 1.0)
    c = jnp.array([[20., 20., 30., 30.]])  # disjoint
    assert np.isclose(float(box_ops.iou(a, c)[0]), 0.0)
    # giou of disjoint boxes is negative
    assert float(box_ops.giou(a, c)[0]) < 0.0
    # half overlap
    d = jnp.array([[5., 0., 15., 10.]])
    assert np.isclose(float(box_ops.iou(a, d)[0]), 50.0 / 150.0)


def test_iou_np_matches_jax():
    rng = np.random.RandomState(1)
    lt = rng.rand(20, 2) * 50
    wh = rng.rand(20, 2) * 30 + 1
    boxes1 = np.concatenate([lt, lt + wh], -1).astype(np.float32)
    lt2 = rng.rand(20, 2) * 50
    wh2 = rng.rand(20, 2) * 30 + 1
    boxes2 = np.concatenate([lt2, lt2 + wh2], -1).astype(np.float32)
    np.testing.assert_allclose(
        box_ops.iou_np(boxes1, boxes2),
        np.asarray(box_ops.iou(jnp.array(boxes1), jnp.array(boxes2))),
        rtol=1e-5)


def test_bce_focal_smooth_l1():
    p = jnp.array([0.1, 0.5, 0.9, 1.0, 0.0])
    t = jnp.array([0.0, 1.0, 1.0, 1.0, 0.0])
    out = np.asarray(bce(p, t))
    expect = -np.array([np.log(0.9), np.log(0.5), np.log(0.9), 0.0, 0.0])
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-6)

    # focal: alpha_t = 2|t-1+a|, weight |t-p|^g
    f = np.asarray(focal(jnp.array([1.0, 0.0]), jnp.array([0.7, 0.2]),
                         alpha=0.75, gamma=2))
    np.testing.assert_allclose(f, [2 * 0.75 * 0.09, 2 * 0.25 * 0.04], rtol=1e-5)

    beta = 1.0 / 9.0
    x = jnp.array([[0.05, 0.5, -2.0, 0.0]])
    s = np.asarray(smooth_l1(x, jnp.zeros_like(x)))
    expect_el = np.array([0.5 * 0.05 ** 2 / beta, 0.5 - 0.5 * beta,
                          2.0 - 0.5 * beta, 0.0])
    np.testing.assert_allclose(s, [[expect_el.mean()]], rtol=1e-5)


def _make_loss_inputs(seed=0, b=2, h=4, w=4, a=3, nc=6, n_gt=5, stride=16):
    rng = np.random.RandomState(seed)
    pred = np.zeros((b, h, w, a, 5 + nc), np.float32)
    # plausible decoded boxes around the grid
    cx = rng.rand(b, h, w, a) * w * stride
    cy = rng.rand(b, h, w, a) * h * stride
    bw = rng.rand(b, h, w, a) * 20 + 2
    bh = rng.rand(b, h, w, a) * 20 + 2
    pred[..., 0] = cx - bw / 2
    pred[..., 1] = cy - bh / 2
    pred[..., 2] = cx + bw / 2
    pred[..., 3] = cy + bh / 2
    pred[..., 4] = rng.rand(b, h, w, a)
    pred[..., 5:] = rng.rand(b, h, w, a, nc)

    label = np.zeros((b, h, w, a, 6 + nc), np.float32)
    label[..., -1] = 1.0  # mixup weight
    # a few positives
    for bi in range(b):
        for _ in range(3):
            y, x, ai = rng.randint(h), rng.randint(w), rng.randint(a)
            gx1, gy1 = rng.rand(2) * 20
            gw, gh = rng.rand(2) * 30 + 5
            label[bi, y, x, ai, :4] = [gx1, gy1, gx1 + gw, gy1 + gh]
            label[bi, y, x, ai, 4] = 1.0
            label[bi, y, x, ai, 5 + rng.randint(nc)] = 0.9
    gt = np.zeros((b, n_gt, 4), np.float32)
    gt[:, :2] = rng.rand(b, 2, 4) * 40
    gt[:, :2, 2:] += 20
    return pred, label, gt


def _loss_oracle(pred, label, gt, stride, nc, ignore_thresh=0.5):
    """Straight numpy transcription of the published loss formulas."""
    in_area = (stride * pred.shape[1]) * (stride * pred.shape[2])
    pc, pconf, pprob = pred[..., :4], pred[..., 4:5], pred[..., 5:]
    lc, resp = label[..., :4], label[..., 4:5]
    lprob, mixw = label[..., 5:5 + nc], label[..., -1:]
    wh = lc[..., 2:] - lc[..., :2]
    scale = 2.0 - wh[..., 0:1] * wh[..., 1:2] / in_area

    g = np.asarray(box_ops.giou(jnp.array(pc), jnp.array(lc)))[..., None]
    bbox_loss = resp * scale * (1 - g)

    pair = box_ops.iou_np(pc[:, :, :, :, None, :], gt[:, None, None, None, :, :])
    max_iou = pair.max(-1)[..., None]
    bgd = (1 - resp) * (max_iou < ignore_thresh)

    def nbce(p, t):
        return -(t * np.maximum(np.log(np.maximum(p, 0)), -100) +
                 (1 - t) * np.maximum(np.log(np.maximum(1 - p, 0)), -100))

    cf = 2 * np.abs(resp - 1 + 0.75) * np.abs(resp - pconf) ** 2
    conf_loss = cf * (resp * nbce(pconf, resp) + bgd * nbce(pconf, resp))
    clf = 2 * np.abs(lprob - 1 + 0.5) * np.abs(lprob - pprob) ** 2
    prob_loss = 2.0 * clf * resp * nbce(pprob, lprob)

    red = lambda v: (v * mixw).sum(axis=(1, 2, 3, 4)).mean(keepdims=True)
    return red(bbox_loss), red(conf_loss), red(prob_loss)


def test_loss_per_scale_vs_oracle():
    nc, stride = 6, 16
    pred, label, gt = _make_loss_inputs(nc=nc, stride=stride)
    total, bl, cl, pl = loss_per_scale(
        jnp.array(pred), jnp.array(label), jnp.array(gt),
        stride=stride, num_classes=nc, bbox_loss_type='giou')
    obl, ocl, opl = _loss_oracle(pred, label, gt, stride, nc)
    np.testing.assert_allclose(np.asarray(bl), obl, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(cl), ocl, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(pl), opl, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(total), obl + ocl + opl, rtol=1e-4)


def test_loss_grads_finite():
    nc, stride = 6, 16
    pred, label, gt = _make_loss_inputs(nc=nc, stride=stride)

    for loss_type in ['giou', 'diou', 'ciou', 'iou', 'l1']:
        def f(p):
            return loss_per_scale(p, jnp.array(label), jnp.array(gt),
                                  stride=stride, num_classes=nc,
                                  bbox_loss_type=loss_type)[0][0]
        g = jax.grad(f)(jnp.array(pred))
        assert np.isfinite(np.asarray(g)).all(), loss_type
