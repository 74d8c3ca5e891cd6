"""On-device augmentation (ops/augment_device.py) vs the host chain
(data/augment.py). Mosaic/mixup/flips/color-jitter claim exact (or
+-1-rounding) parity on letterboxed sources; zoom-crop is the documented
approximation and is checked against its own geometry invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pqdet_tpu.data import augment
from pqdet_tpu.ops import augment_device as ad


def _boxes(rows, g=8):
    out = np.zeros((g, 6), np.float32)
    rows = np.asarray(rows, np.float32).reshape(-1, 6)
    out[:len(rows)] = rows
    return out


def _valid_rows(b):
    return b[(b[:, 2] > b[:, 0]) & (b[:, 3] > b[:, 1])]


def _rand_img(rng, s):
    return (rng.random((s, s, 3)) * 255).astype(np.uint8)


def test_hflip_matches_host():
    rng = np.random.default_rng(0)
    img = _rand_img(rng, 64)
    boxes = np.array([[4, 8, 20, 30, 2, 1.0], [40, 2, 60, 62, 5, 1.0]],
                     np.float32)
    himg, hbox = augment.RandomHFlip(p=1.1)(img.copy(), boxes.copy())
    dimg, dbox = jax.jit(ad.hflip)(
        jnp.asarray(img[None], jnp.float32), jnp.asarray(_boxes(boxes)[None]),
        jnp.array([True]))
    np.testing.assert_array_equal(np.asarray(dimg[0], np.uint8), himg)
    np.testing.assert_allclose(_valid_rows(np.asarray(dbox[0]))[:, :5],
                               hbox[:, :5], atol=1e-5)
    # apply=False is the identity
    dimg2, dbox2 = jax.jit(ad.hflip)(
        jnp.asarray(img[None], jnp.float32), jnp.asarray(_boxes(boxes)[None]),
        jnp.array([False]))
    np.testing.assert_array_equal(np.asarray(dimg2[0], np.uint8), img)
    np.testing.assert_array_equal(np.asarray(dbox2[0]), _boxes(boxes))


def test_vflip_matches_host():
    rng = np.random.default_rng(1)
    img = _rand_img(rng, 48)
    boxes = np.array([[4, 8, 20, 30, 2, 1.0]], np.float32)
    himg, hbox = augment.RandomVFlip(p=1.1)(img.copy(), boxes.copy())
    dimg, dbox = jax.jit(ad.vflip)(
        jnp.asarray(img[None], jnp.float32), jnp.asarray(_boxes(boxes)[None]),
        jnp.array([True]))
    np.testing.assert_array_equal(np.asarray(dimg[0], np.uint8), himg)
    np.testing.assert_allclose(_valid_rows(np.asarray(dbox[0]))[:, :5],
                               hbox[:, :5], atol=1e-5)


def test_mosaic_place_matches_host_exactly():
    """With input-size sources the host Mosaic never resamples or exposes
    canvas pad, so the device gather must reproduce it bit-for-bit (same
    (xc, yc)) and box-for-box."""
    S, G = 64, 6
    rng = np.random.default_rng(2)
    imgs = [_rand_img(rng, S) for _ in range(4)]
    boxes = [np.array([[6, 6, 30, 28, k, 1.0],
                       [33 + k, 10, 60, 40 + k, 2, 1.0]], np.float32)
             for k in range(4)]

    for seed in range(5):
        np.random.seed(seed)
        sampled = iter(list(zip(imgs[1:], [b[:, :5].copy() for b in boxes[1:]])))
        host_mosaic = augment.Mosaic(lambda: next(sampled), size=(S, S), p=1.1)
        himg, hbox = host_mosaic(imgs[0].copy(), boxes[0][:, :5].copy())
        # recover the (xc, yc) the host drew: replay the RNG stream
        np.random.seed(seed)
        np.random.random()                       # the p draw
        xc = int(np.random.uniform(S * 0.5, S * 1.5))
        yc = int(np.random.uniform(S * 0.5, S * 1.5))

        img4 = jnp.asarray(np.stack(imgs)[None], jnp.float32)
        box4 = jnp.asarray(np.stack([_boxes(b, G) for b in boxes])[None])
        dimg, dbox = jax.jit(ad.mosaic_place)(
            img4, box4, jnp.array([xc]), jnp.array([yc]))
        np.testing.assert_array_equal(np.asarray(dimg[0], np.uint8), himg,
                                      err_msg=f'seed {seed}')
        got = _valid_rows(np.asarray(dbox[0]))
        want = _valid_rows(np.concatenate(
            [hbox, np.ones((len(hbox), 1), np.float32)], axis=1))
        # same box set (device keeps source-major order, host placement too)
        got = got[np.lexsort(got[:, :4].T)]
        want = want[np.lexsort(want[:, :4].T)]
        np.testing.assert_allclose(got[:, :5], want[:, :5], atol=1e-3,
                                   err_msg=f'seed {seed}')


def test_mixup_matches_host_blend():
    S = 32
    rng = np.random.default_rng(3)
    a, b = _rand_img(rng, S), _rand_img(rng, S)
    ab = np.array([[2, 2, 20, 20, 1, 1.0]], np.float32)
    bb = np.array([[5, 6, 22, 28, 3, 1.0]], np.float32)
    lam = 0.37
    himg = np.asarray(
        np.clip(np.round(a.astype(np.float64) * lam
                         + b.astype(np.float64) * (1 - lam)), 0, 255),
        np.uint8)
    dimg, dbox = jax.jit(ad.mixup)(
        jnp.asarray(a[None], jnp.float32), jnp.asarray(_boxes(ab)[None]),
        jnp.asarray(b[None], jnp.float32), jnp.asarray(_boxes(bb)[None]),
        jnp.array([lam]), jnp.array([True]))
    # cv2.addWeighted and float-round can differ by 1 on .5 boundaries
    assert np.abs(np.asarray(dimg[0]) - himg).max() <= 1
    rows = _valid_rows(np.asarray(dbox[0]))
    assert len(rows) == 2
    np.testing.assert_allclose(sorted(rows[:, 5]), sorted([lam, 1 - lam]),
                               atol=1e-6)
    # not applied: weight 1, no partner rows
    _, dbox2 = jax.jit(ad.mixup)(
        jnp.asarray(a[None], jnp.float32), jnp.asarray(_boxes(ab)[None]),
        jnp.asarray(b[None], jnp.float32), jnp.asarray(_boxes(bb)[None]),
        jnp.array([lam]), jnp.array([False]))
    rows2 = _valid_rows(np.asarray(dbox2[0]))
    assert len(rows2) == 1 and rows2[0, 5] == 1.0


def test_color_jitter_formulas_match_host():
    """Pin each op formula against the host's integer arithmetic on the
    same factors (the device draws its own factors in production; here we
    bypass the sampling and compare op-by-op)."""
    rng = np.random.default_rng(4)
    # integer-valued floats: the device chain keeps the uint8 value domain
    # (rounds after every value-changing stage) like the host's int32 math
    img = _rand_img(rng, 40).astype(np.float32)
    assert (img == np.round(img)).all()

    # brightness
    for b in (-20.0, 13.0):
        host = np.clip(img.astype(np.int32) + int(round(b)), 0, 255)
        dev = np.clip(img + round(b), 0., 255.)
        np.testing.assert_array_equal(dev.astype(np.int32), host)
    # contrast (astype(int32) truncation == floor for non-negatives);
    # f32 vs the host's f64 product can land across an integer boundary
    for c in (0.83, 1.17):
        host = np.clip(img.astype(np.int32) * c, 0, 255).astype(np.int32)
        dev = np.floor(np.clip(img * c, 0., 255.))
        assert np.abs(dev.astype(np.int32) - host).max() <= 1
    # saturation incl. the cv2 fixed-point gray
    import cv2
    gray = cv2.cvtColor(img.astype(np.uint8), cv2.COLOR_RGB2GRAY)
    dgray = np.asarray(ad._cv2_gray(jnp.asarray(img)))
    np.testing.assert_array_equal(dgray.astype(np.uint8), gray)
    for s in (0.4, 1.7):
        host = np.clip(s * img.astype(np.int32) + (1 - s) * gray[..., None],
                       0, 255).astype(np.int32)
        dev = np.floor(np.clip(s * img + (1 - s) * dgray[..., None], 0., 255.))
        assert np.abs(dev - host).max() <= 1  # f32 vs f64 rounding at .0 edges


def test_zoom_crop_geometry():
    """Boxes survive (never cut), stay in range, and keep their relative
    content: the pixel at each box center must come from inside the
    original box region."""
    S, G = 96, 8
    rng = np.random.default_rng(5)
    img = np.zeros((S, S, 3), np.uint8)
    img[20:40, 30:50] = 200  # a bright block == the GT box content
    boxes = _boxes([[30, 20, 50, 40, 1, 1.0]], G)

    out_i, out_b = jax.jit(
        lambda i, b, r, a: ad.zoom_crop(i, b, r, a))(
        jnp.asarray(img[None], jnp.float32), jnp.asarray(boxes[None]),
        jax.random.PRNGKey(7), jnp.array([True]))
    ob = _valid_rows(np.asarray(out_b[0]))
    assert len(ob) == 1
    x1, y1, x2, y2 = ob[0, :4]
    assert 0 <= x1 < x2 <= S and 0 <= y1 < y2 <= S
    # the box grew or kept its size (zoom-in never shrinks content)
    assert (x2 - x1) >= 20 - 1e-3 and (y2 - y1) >= 20 - 1e-3
    cx, cy = int((x1 + x2) / 2), int((y1 + y2) / 2)
    assert np.asarray(out_i[0])[cy, cx, 0] > 150  # content followed the box


def test_device_augment_chain_shapes_and_determinism():
    B, S, G = 8, 64, 8
    rng = np.random.default_rng(6)
    imgs = np.stack([_rand_img(rng, S) for _ in range(B)])
    gt = np.zeros((B, G, 6), np.float32)
    gt[:, 0] = [8, 8, 28, 30, 2, 1.0]
    gt[:, 1] = [33, 12, 55, 44, 4, 1.0]
    p = ad.AugmentParams(hflip_p=0.5, vflip_p=0.25, crop_p=0.75,
                         color_p=0.5, mosaic_p=0.5, mixup_p=0.5)
    f = jax.jit(lambda i, g, r: ad.device_augment(i, g, r, p))
    key = jax.random.PRNGKey(11)
    i1, b1 = f(jnp.asarray(imgs), jnp.asarray(gt), key)
    i2, b2 = f(jnp.asarray(imgs), jnp.asarray(gt), key)
    assert i1.dtype == jnp.uint8
    assert b1.shape == (B, 5 * G, 6)  # mosaic 4x + mixup partner rows
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))
    # a different key gives a different batch
    i3, _ = f(jnp.asarray(imgs), jnp.asarray(gt), jax.random.PRNGKey(12))
    assert np.abs(np.asarray(i3, np.int32) - np.asarray(i1, np.int32)).max() > 0
    # all boxes in range, weights of valid rows in (0, 1]
    b1 = np.asarray(b1)
    val = (b1[..., 2] > b1[..., 0]) & (b1[..., 3] > b1[..., 1])
    assert (b1[..., :4] >= 0).all() and (b1[..., :4] <= S).all()
    assert ((b1[..., 5] > 0) & (b1[..., 5] <= 1))[val].all()


def test_device_augment_fresh_partners():
    """augment.fresh_partners: partner rows come from the supplied fresh
    gather instead of in-batch permutations; the chain stays valid and,
    with flips/crop/jitter off and mosaic forced, the mosaic composes
    EXACTLY the supplied partner images (mosaic_place parity)."""
    B, S, G = 4, 64, 8
    rng = np.random.default_rng(9)
    imgs = np.stack([_rand_img(rng, S) for _ in range(B)])
    gt = np.zeros((B, G, 6), np.float32)
    gt[:, 0] = [8, 8, 28, 30, 2, 1.0]
    partners = np.stack([_rand_img(rng, S) for _ in range(4 * B)])
    pgt = np.zeros((4 * B, G, 6), np.float32)
    pgt[:, 0] = [10, 12, 30, 40, 1, 1.0]

    # full chain: shapes + determinism + validity
    p = ad.AugmentParams(hflip_p=0.5, vflip_p=0.25, crop_p=0.75,
                         color_p=0.5, mosaic_p=0.5, mixup_p=0.5)
    f = jax.jit(lambda i, g, r, pi, pg:
                ad.device_augment(i, g, r, p, partner_images=pi,
                                  partner_gt=pg))
    key = jax.random.PRNGKey(3)
    i1, b1 = f(jnp.asarray(imgs), jnp.asarray(gt), key,
               jnp.asarray(partners), jnp.asarray(pgt))
    assert i1.dtype == jnp.uint8 and b1.shape == (B, 5 * G, 6)
    i2, b2 = f(jnp.asarray(imgs), jnp.asarray(gt), key,
               jnp.asarray(partners), jnp.asarray(pgt))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

    # mosaic-only, forced: output == mosaic_place of (main, p0, p1, p2)
    pm = ad.AugmentParams(hflip_p=0.0, vflip_p=0.0, crop_p=0.0,
                          color_p=0.0, mosaic_p=1.0, mixup_p=0.0)
    keys = jax.random.split(key, 12)
    kx, ky = jax.random.split(keys[6])
    xc = jax.random.randint(kx, (B,), S // 2, S + S // 2)
    yc = jax.random.randint(ky, (B,), S // 2, S + S // 2)
    mi = partners[:3 * B]
    images4 = jnp.stack([jnp.asarray(imgs, jnp.float32),
                         jnp.asarray(mi[:B], jnp.float32),
                         jnp.asarray(mi[B:2 * B], jnp.float32),
                         jnp.asarray(mi[2 * B:], jnp.float32)], axis=1)
    boxes4 = jnp.stack([jnp.asarray(gt)] + [jnp.asarray(pgt[k * B:(k + 1) * B])
                                            for k in range(3)], axis=1)
    ref_i, _ = ad.mosaic_place(images4, boxes4, xc, yc)
    out_i, out_b = jax.jit(lambda i, g, r, pi, pg:
                           ad.device_augment(i, g, r, pm, partner_images=pi,
                                             partner_gt=pg))(
        jnp.asarray(imgs), jnp.asarray(gt), key,
        jnp.asarray(partners), jnp.asarray(pgt))
    np.testing.assert_array_equal(
        np.asarray(out_i), np.asarray(jnp.clip(jnp.round(ref_i), 0, 255)
                                      ).astype(np.uint8))


def test_device_augment_off_probabilities_are_identity():
    B, S, G = 2, 32, 4
    rng = np.random.default_rng(7)
    imgs = np.stack([_rand_img(rng, S) for _ in range(B)])
    gt = np.zeros((B, G, 6), np.float32)
    gt[:, 0] = [4, 4, 12, 14, 1, 1.0]
    p = ad.AugmentParams(hflip_p=0.0, vflip_p=0.0, crop_p=0.0, color_p=0.0,
                         mosaic_p=0.0, mixup_p=0.0)
    out_i, out_b = jax.jit(lambda i, g, r: ad.device_augment(i, g, r, p))(
        jnp.asarray(imgs), jnp.asarray(gt), jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(out_i), imgs)
    np.testing.assert_array_equal(np.asarray(out_b), gt)


def test_train_step_with_device_augment_runs_sharded():
    """The full production path under the 8-device mesh: uint8 batch +
    padded GT through device augment -> normalize -> label assign ->
    loss/grads; loss finite and params move. Mosaic/mixup partner gathers
    cross shard boundaries, so this also proves the collectives compile."""
    from pqdet_tpu.model.network import DetectionNetwork
    from pqdet_tpu.parallel.mesh import make_mesh, replicate_pytree, \
        shard_batch_pytree
    from pqdet_tpu.train.schedule import cosine_warmup
    from pqdet_tpu.train.step import jit_train_step, make_optimizer, \
        make_train_step
    from pqdet_tpu.ops.labels import assign_labels_device
    from pqdet_tpu.zoo.builder import CfgBuilder

    b = CfgBuilder()
    b.conv(8, size=3, stride=2)
    b.conv(16, size=3, stride=2)
    t8 = b.conv(16, size=3, stride=2)
    t16 = b.conv(24, size=3, stride=2)
    b.conv(32, size=3, stride=2)
    b.conv(27, size=1, bn=False, activation='linear')
    b.yolo(4)
    b.route(t16)
    b.conv(27, size=1, bn=False, activation='linear')
    b.yolo(4)
    b.route(t8)
    b.conv(27, size=1, bn=False, activation='linear')
    b.yolo(4)
    net = DetectionNetwork.from_cfg(b.text())
    params, state = net.init(jax.random.PRNGKey(0))
    opt = make_optimizer(cosine_warmup(1e-3, 1e-6, 1, 1000))

    strides = np.array([8, 16, 32])
    anchors = np.array([[10, 13], [16, 30], [33, 23], [30, 61], [62, 45],
                        [59, 119], [116, 90], [156, 198], [373, 326]],
                       np.float32)

    def label_fn(g, size):
        return assign_labels_device(g, size, strides, anchors, 4)

    p = ad.AugmentParams(hflip_p=0.5, crop_p=0.75, mosaic_p=0.5, mixup_p=0.5)

    def augment_fn(images, g, r):
        return ad.device_augment(images, g, r, p)

    step = make_train_step(net, opt, label_fn=label_fn, augment_fn=augment_fn)
    mesh = make_mesh(8)
    jstep = jit_train_step(step, mesh)

    rng = np.random.default_rng(8)
    imgs = (rng.random((8, 64, 64, 3)) * 255).astype(np.uint8)
    gt = np.zeros((8, 8, 6), np.float32)
    gt[:, 0] = [6, 6, 30, 30, 1, 1.0]
    gt[:, 1] = [34, 20, 60, 50, 2, 1.0]
    batch = shard_batch_pytree(mesh, {'image': imgs, 'gt': gt})
    params_np = jax.device_get(params)  # donation may recycle the originals
    params_r, state_r, opt_state = replicate_pytree(
        mesh, (params, state, opt.init(params)))
    p2, s2, o2, metrics = jstep(params_r, state_r, opt_state, batch,
                                jax.random.PRNGKey(1))
    loss = float(metrics['loss'])
    assert np.isfinite(loss) and loss > 0
    # step 0 is inside warmup (lr 0); take a second step so params move
    batch = shard_batch_pytree(mesh, {'image': imgs, 'gt': gt})
    p2, s2, o2, metrics = jstep(p2, s2, o2, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics['loss']))
    moved = any(
        bool(leaf) for leaf in jax.tree.leaves(
            jax.tree.map(lambda a, c: bool(np.abs(a - c).max() > 0),
                         params_np, jax.device_get(p2))))
    assert moved


def test_letterbox_warp_matches_host_crop_resize():
    """Force the same crop rect through the host SafeCrop-slice + Resize
    letterbox and the device warp: pixels must agree within cv2's
    fixed-point interpolation rounding (<= 2 levels)."""
    S = 96
    rng = np.random.default_rng(9)
    img = _rand_img(rng, S)
    for (x0, y0, x1, y1) in [(10, 4, 80, 90), (0, 0, 96, 96), (33, 17, 60, 45)]:
        crop = img[y0:y1, x0:x1]
        himg, _ = augment.Resize((S, S))(crop.copy(), [])
        cw, ch = float(x1 - x0), float(y1 - y0)
        ratio = min(S / cw, S / ch)
        rw, rh = round(ratio * cw), round(ratio * ch)
        dl, du = (S - rw) // 2, (S - rh) // 2
        dev = np.asarray(jax.jit(ad._letterbox_warp)(
            jnp.asarray(img, jnp.float32), float(x0), float(y0), cw, ch,
            float(rw), float(rh), float(dl), float(du)))
        assert np.abs(np.round(dev) - himg.astype(np.float64)).max() <= 2, \
            f'rect {(x0, y0, x1, y1)}'


def test_letterbox_warp_mm_equals_gather():
    """The MXU interpolation-matmul warp computes the same bilinear math
    as the per-pixel gather warp (f32 reassociation noise only)."""
    S = 96
    rng = np.random.default_rng(10)
    img = jnp.asarray(_rand_img(rng, S), jnp.float32)
    for (x0, y0, x1, y1) in [(10, 4, 80, 90), (0, 0, 96, 96), (33, 17, 60, 45)]:
        cw, ch = float(x1 - x0), float(y1 - y0)
        ratio = min(S / cw, S / ch)
        rw, rh = round(ratio * cw), round(ratio * ch)
        dl, du = (S - rw) // 2, (S - rh) // 2
        a = np.asarray(jax.jit(ad._letterbox_warp)(
            img, float(x0), float(y0), cw, ch, float(rw), float(rh),
            float(dl), float(du)))
        b = np.asarray(jax.jit(ad._letterbox_warp_mm)(
            img, float(x0), float(y0), cw, ch, float(rw), float(rh),
            float(dl), float(du)))
        assert np.abs(a - b).max() < 0.01, f'rect {(x0, y0, x1, y1)}'
