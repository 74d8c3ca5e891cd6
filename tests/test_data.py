"""Data pipeline tests on synthetic VOC/COCO/VisDrone fixtures."""

import os

import cv2
import numpy as np
import pytest

from pqdet_tpu.config import load_config
from pqdet_tpu.data import augment
from pqdet_tpu.data.eval_data import EvalData
from pqdet_tpu.data.train_data import (TrainData, assign_labels, epoch_batches,
                                       make_batch, smooth_onehot)

CLASSES = ['cat', 'dog', 'bird']


def _write_voc_fixture(root, n=6, seed=0):
    rng = np.random.RandomState(seed)
    img_dir = os.path.join(root, 'JPEGImages')
    ann_dir = os.path.join(root, 'Annotations')
    os.makedirs(img_dir), os.makedirs(ann_dir)
    paths = []
    for i in range(n):
        h, w = int(rng.randint(200, 400)), int(rng.randint(200, 400))
        img = rng.randint(0, 255, (h, w, 3), np.uint8)
        p = os.path.join(img_dir, f'im{i}.jpg')
        cv2.imwrite(p, img)
        objs = []
        for _ in range(rng.randint(1, 4)):
            x1, y1 = rng.randint(0, w - 60), rng.randint(0, h - 60)
            bw, bh = rng.randint(30, 60), rng.randint(30, 60)
            cls = CLASSES[rng.randint(len(CLASSES))]
            diff = int(rng.rand() < 0.2)
            objs.append(f'''<object><name>{cls}</name><difficult>{diff}</difficult>
<bndbox><xmin>{x1}</xmin><ymin>{y1}</ymin><xmax>{x1+bw}</xmax><ymax>{y1+bh}</ymax></bndbox></object>''')
        xml = f'<annotation>{"".join(objs)}</annotation>'
        with open(os.path.join(ann_dir, f'im{i}.xml'), 'w') as fw:
            fw.write(xml)
        paths.append(p)
    txt = os.path.join(root, 'list.txt')
    with open(txt, 'w') as fw:
        fw.write('\n'.join(paths))
    return txt


@pytest.fixture
def voc_cfg(tmp_path):
    txt = _write_voc_fixture(str(tmp_path))
    cfg = load_config(opts=[
        'dataset.train_txt_file', txt,
        'dataset.eval_txt_file', txt,
        'dataset.classes', '[cat, dog, bird]',
        'train.batch_size', '2',
        'train.input_sizes', '[64, 96]',
        'eval.batch_size', '4',
        'eval.input_size', '96',
        'model.max_gt_boxes', '16',
    ])
    return cfg


def test_smooth_onehot():
    oh = smooth_onehot(4, 2, deta=0.01)
    assert np.isclose(oh.sum(), 1.0)
    assert np.isclose(oh[2], 0.99 + 0.01 / 4)
    assert np.isclose(oh[0], 0.01 / 4)


def test_assign_labels_basic():
    strides = np.array([8, 16, 32])
    anchors = np.array([[10, 13], [16, 30], [33, 23], [30, 61], [62, 45],
                        [59, 119], [116, 90], [156, 198], [373, 326]], np.float32)
    # a 30x60 box centered at (100, 100) with mixup weight .7
    bboxes = np.array([[85, 70, 115, 130, 1, 0.7]], np.float32)
    labels, padded = assign_labels(bboxes, (256, 256), strides, anchors,
                                   num_classes=3, max_gt=8)
    total_pos = sum(int((l[..., 4] > 0).sum()) for l in labels)
    assert total_pos >= 1
    # assigned cell at the box center for any positive scale
    for s, lab in zip(strides, labels):
        pos = np.argwhere(lab[..., 4] > 0)
        for y, x, a in pos:
            assert x == 100 // s and y == 100 // s
            np.testing.assert_allclose(lab[y, x, a, :4], bboxes[0, :4])
            assert np.isclose(lab[y, x, a, -1], 0.7)
            # class 1 smoothed one-hot
            assert lab[y, x, a, 5 + 1] > 0.9
    # raw boxes padded to static size
    for arr in padded:
        assert arr.shape == (8, 4)


def test_assign_labels_fallback():
    """A box matching no anchor above threshold still gets its argmax anchor."""
    strides = np.array([8, 16, 32])
    anchors = np.array([[400, 400]] * 9, np.float32)  # nothing matches a tiny box
    bboxes = np.array([[10, 10, 20, 20, 0, 1.0]], np.float32)
    labels, _ = assign_labels(bboxes, (64, 64), strides, anchors, num_classes=3)
    total_pos = sum(int((l[..., 4] > 0).sum()) for l in labels)
    assert total_pos == 1


def test_train_data_epoch(voc_cfg):
    """Default (device-label) pipeline: batches carry uint8 images + padded
    raw GT boxes; grids build on device (ops/labels.py)."""
    data = TrainData(voc_cfg)
    assert data.length == 6
    assert len(data) == 6  # 3 batches * batch 2
    sizes = set()
    for batch in epoch_batches(data, num_workers=2):
        b, h, w, c = batch['image'].shape
        assert (b, c) == (2, 3)
        assert batch['image'].dtype == np.uint8
        sizes.add((h, w))
        assert batch['gt'].shape == (2, 16, 6)
        assert (batch['gt'][..., 2] >= batch['gt'][..., 0]).all()
    # first batch forced to the largest size
    assert (96, 96) in sizes


def test_train_data_epoch_host_labels(voc_cfg):
    """system.label_assign=host: reference-style grids built in the loader."""
    cfg = voc_cfg.clone().defrost()
    cfg.system.label_assign = 'host'
    cfg.freeze()
    data = TrainData(cfg)
    for batch in epoch_batches(data, num_workers=2):
        b, h, w, c = batch['image'].shape
        assert (b, c) == (2, 3)
        assert len(batch['targets']) == 6
        for lab, s in zip(batch['targets'][:3], (8, 16, 32)):
            assert lab.shape[1:3] == (h // s, w // s)
            assert np.all(lab[..., -1] != 0)  # mixup weight set everywhere
        for gt in batch['targets'][3:]:
            assert gt.shape == (2, 16, 4)


def test_train_data_reshuffle(voc_cfg):
    data = TrainData(voc_cfg)
    first = list(data._indexes)
    data.init_shuffle()
    # with replacement; overwhelmingly likely to differ
    assert len(data._indexes) == len(first)


def test_eval_data(voc_cfg):
    data = EvalData(voc_cfg)
    assert data.length == 6
    batches = list(data.batches(2))
    assert len(batches) == 2
    b0 = batches[0]
    assert b0['image'].shape == (4, 96, 96, 3)
    assert b0['count'] == 4
    assert len(b0['file_name']) == 4
    # final ragged batch zero-padded to full batch
    b1 = batches[1]
    assert b1['image'].shape == (4, 96, 96, 3)
    assert b1['count'] == 2
    # difficult flags come through
    assert all(len(d) == len(b) for d, b in zip(b0['difficult'], b0['bboxes']))


def test_eval_uint8_matches_host_normalize(voc_cfg):
    """The uint8 eval path (device-side normalize in the predict pipeline)
    must produce the same detections as eval.host_normalize within the FMA
    rounding noise: same valid counts, boxes to 1e-2 px, scores to 1e-4."""
    import jax
    from pqdet_tpu.evaluation.predict import build_predict_pipeline
    from pqdet_tpu.model.network import DetectionNetwork, fuse_params
    from tests.test_train_step import get_mesh_cfg

    net = DetectionNetwork.from_cfg(get_mesh_cfg())
    params, state = net.init(jax.random.PRNGKey(0))
    fused = fuse_params(net, params, state)

    cfg_dev = voc_cfg.clone().defrost()
    cfg_dev.eval.input_size = 96
    cfg_dev.eval.score_threshold = 0.05
    cfg_dev.freeze()
    cfg_host = cfg_dev.clone().defrost()
    cfg_host.eval.host_normalize = True
    cfg_host.freeze()

    b_dev = EvalData(cfg_dev).batch(0)
    b_host = EvalData(cfg_host).batch(0)
    assert b_dev['image'].dtype == np.uint8
    assert b_host['image'].dtype == np.float32

    run = build_predict_pipeline(net, cfg_dev)
    import jax.numpy as jnp
    r_dev = run(fused, jnp.asarray(b_dev['image']),
                jnp.asarray(b_dev['shape']))
    r_host = run(fused, jnp.asarray(b_host['image']),
                 jnp.asarray(b_host['shape']))
    nv_dev = np.asarray(r_dev.valid).sum(-1)
    nv_host = np.asarray(r_host.valid).sum(-1)
    np.testing.assert_array_equal(nv_dev, nv_host)
    v = np.asarray(r_dev.valid)
    np.testing.assert_allclose(np.asarray(r_dev.boxes)[v],
                               np.asarray(r_host.boxes)[v], atol=1e-2)
    np.testing.assert_allclose(np.asarray(r_dev.scores)[v],
                               np.asarray(r_host.scores)[v], atol=1e-4)


def test_letterbox_resize_augment():
    img = np.full((100, 200, 3), 50, np.uint8)
    boxes = np.array([[20, 10, 60, 50, 0]], np.float32)
    out, bb = augment.Resize((64, 64))(img, boxes.copy())
    assert out.shape == (64, 64, 3)
    ratio = 64 / 200
    du = (64 - round(100 * ratio)) // 2
    np.testing.assert_allclose(bb[0, :4],
                               [20 * ratio, 10 * ratio + du,
                                60 * ratio, 50 * ratio + du], atol=1e-4)
    # padding value present top/bottom
    assert (out[0] == 128).all() and (out[-1] == 128).all()


def test_hflip_augment():
    img = np.zeros((10, 20, 3), np.uint8)
    boxes = np.array([[2, 1, 6, 5, 0]], np.float32)
    _, bb = augment.RandomHFlip(p=1.1)(img, boxes.copy())
    np.testing.assert_allclose(bb[0, :4], [14, 1, 18, 5])


def test_mixup_weight_column():
    sampler = lambda: (np.zeros((8, 8, 3), np.float32),
                       np.array([[1, 1, 4, 4, 0]], np.float32))
    mix = augment.Mixup(sampler, p=1.1, beta=1.5)
    img = np.ones((8, 8, 3), np.float32)
    boxes = np.array([[0, 0, 3, 3, 1]], np.float32)
    out, bb = mix(img, boxes)
    assert bb.shape[1] == 6
    assert np.isclose(bb[:, 5].sum(), 1.0)  # lam + (1 - lam)


def test_mosaic_shapes():
    rng = np.random.RandomState(0)

    def sampler():
        return (rng.randint(0, 255, (80, 90, 3), np.uint8),
                np.array([[10, 10, 70, 70, 1]], np.float32))

    img, boxes = sampler()
    out, bb = augment.Mosaic(sampler, size=(64, 64), p=1.1)(img, boxes)
    assert out.shape == (64, 64, 3)
    if len(bb):
        assert (bb[:, :4] >= 0).all()
        assert (bb[:, [0, 2]] <= 64).all() and (bb[:, [1, 3]] <= 64).all()


def _mosaic_reference(sampler, size, pad_val, img, bboxes):
    """The textbook 2x-canvas mosaic (materialise (2ih, 2iw), paste, crop
    the center window) — the oracle for the direct-window paste in
    augment.Mosaic. Consumes the same np.random draws in the same order."""
    np.random.random()  # consume the p-gate draw like Mosaic.__call__
    ih, iw = size
    xc = int(np.random.uniform(iw * 0.5, iw * 1.5))
    yc = int(np.random.uniform(ih * 0.5, ih * 1.5))
    canvas = np.full((ih * 2, iw * 2, 3), pad_val, np.uint8)
    others = [sampler() for _ in range(3)]
    all_imgs = [(img, bboxes)] + list(others)
    originals = np.concatenate([b for _, b in all_imgs if len(b)] or
                               [np.zeros((0, 5), np.float32)], axis=0)
    placed = []
    for i, (image, bbs) in enumerate(all_imgs):
        h, w = image.shape[:2]
        if i == 0:
            xa = (max(xc - w, 0), max(yc - h, 0), xc, yc)
            xb = (w - (xa[2] - xa[0]), h - (xa[3] - xa[1]), w, h)
        elif i == 1:
            xa = (xc, max(yc - h, 0), min(xc + w, iw * 2), yc)
            xb = (0, h - (xa[3] - xa[1]), min(w, xa[2] - xa[0]), h)
        elif i == 2:
            xa = (max(xc - w, 0), yc, xc, min(ih * 2, yc + h))
            xb = (w - (xa[2] - xa[0]), 0, max(xc, w), min(xa[3] - xa[1], h))
        else:
            xa = (xc, yc, min(xc + w, iw * 2), min(ih * 2, yc + h))
            xb = (0, 0, min(w, xa[2] - xa[0]), min(xa[3] - xa[1], h))
        canvas[xa[1]:xa[3], xa[0]:xa[2]] = image[xb[1]:xb[3], xb[0]:xb[2]]
        if len(bbs):
            bbs = bbs.copy()
            bbs[:, [0, 2]] = np.clip(bbs[:, [0, 2]], xb[0], xb[2]) + xa[0] - xb[0]
            bbs[:, [1, 3]] = np.clip(bbs[:, [1, 3]], xb[1], xb[3]) + xa[1] - xb[1]
            placed.append(bbs)
    merged = np.concatenate(placed, axis=0) if placed \
        else np.zeros((0, 5), np.float32)
    if len(merged):
        merged[:, [0, 2]] = np.clip(merged[:, [0, 2]] - iw / 2, 0, iw)
        merged[:, [1, 3]] = np.clip(merged[:, [1, 3]] - ih / 2, 0, ih)
    canvas = canvas[ih // 2: ih // 2 + ih, iw // 2: iw // 2 + iw]
    if len(merged):
        from pqdet_tpu.data.augment import filter_degenerate_boxes
        merged = filter_degenerate_boxes(originals, merged,
                                         iou_threshold=0.2, area_threshold=25)
    return canvas, merged


def test_mosaic_direct_paste_parity():
    """Mosaic's direct-window paste (no 2x canvas) must equal the textbook
    2x-canvas implementation pixel-for-pixel and box-for-box across random
    piece sizes (incl. pieces bigger/smaller than the window and odd
    sizes)."""
    for trial in range(20):
        seed = 100 + trial
        rng = np.random.RandomState(seed)

        def make():
            h, w = rng.randint(20, 140), rng.randint(20, 140)
            im = rng.randint(0, 255, (h, w, 3)).astype(np.uint8)
            n = rng.randint(0, 4)
            bb = np.zeros((n, 5), np.float32)
            if n:
                xy = rng.rand(n, 2) * [w - 8, h - 8]
                wh = rng.rand(n, 2) * 30 + 4
                bb[:, :2] = xy
                bb[:, 2:4] = np.minimum(xy + wh, [w, h])
                bb[:, 4] = rng.randint(0, 3, n)
            return im, bb

        size = (int(rng.choice([63, 64, 96])), int(rng.choice([64, 81, 96])))
        pieces = [make() for _ in range(8)]
        img0, bb0 = make()

        it_a = iter(pieces)
        np.random.seed(seed)
        out_a, box_a = augment.Mosaic(lambda: next(it_a), size=size,
                                      p=1.1)(img0, bb0.copy())
        it_b = iter(pieces)
        np.random.seed(seed)
        out_b, box_b = _mosaic_reference(lambda: next(it_b), size, 128,
                                         img0, bb0.copy())
        np.testing.assert_array_equal(out_a, out_b, err_msg=f'trial {trial}')
        np.testing.assert_array_equal(box_a, box_b, err_msg=f'trial {trial}')


def test_mosaic_enabled_pipeline(voc_cfg):
    """mosaic_p > 0 composes mosaic+mixup in uint8 (normalization happens
    on DEVICE, ops/preprocess.py) and still produces well-formed batches."""
    cfg = voc_cfg.clone().defrost()
    cfg.augment.mosaic_p = 1.0
    cfg.system.label_assign = 'host'
    cfg.freeze()
    data = TrainData(cfg)
    img, labels, padded = data.get(0)
    # raw uint8 out of the host chain: device_normalize handles the affine
    assert img.dtype == np.uint8
    assert len(labels) == 3
    # mixup weight column filled
    for lab in labels:
        assert (lab[..., -1] != 0).all()
    # device-label mode of the same pipeline: (image, padded gt boxes)
    img2, gt = TrainData(voc_cfg).get(0)
    assert img2.dtype == np.uint8 and gt.shape == (16, 6)


def test_device_normalize_parity(voc_cfg):
    """The device-side normalization (dtype-dispatched in the train step)
    must produce EXACTLY the host Normalize's f32 values on a uint8 train
    image, and pass floats through untouched."""
    import jax.numpy as jnp
    from pqdet_tpu.ops.preprocess import device_normalize

    data = TrainData(voc_cfg)
    img, _ = data.get(0)  # device-label mode: (image, gt)
    assert img.dtype == np.uint8  # the pipeline ships raw uint8
    host, _ = augment.Normalize()(img.copy(), [])
    dev = np.asarray(device_normalize(jnp.asarray(img)))
    assert host.dtype == dev.dtype == np.float32
    np.testing.assert_array_equal(host, dev)
    # float input = already normalized on host -> passthrough
    out = device_normalize(jnp.asarray(host))
    np.testing.assert_array_equal(np.asarray(out), host)


def test_synth_clutter_generator(tmp_path):
    """The discriminative benchmark generator emits a valid VOC layout that
    the train pipeline consumes: 20 classes, crowding, occlusion capped at
    partial visibility (no fully-buried boxes)."""
    from pqdet_tpu.data.scripts.synth_clutter import CLASSES as CC
    from pqdet_tpu.data.scripts.synth_clutter import _coverage, generate

    assert len(CC) == 20
    root = str(tmp_path / 'clutter')
    paths = generate(root, n=6, size=160, seed=0)
    assert len(paths) == 6
    assert os.path.exists(os.path.join(root, 'train.txt'))

    cfg = load_config(opts=[
        'dataset.train_txt_file', os.path.join(root, 'train.txt'),
        'dataset.classes', '[' + ', '.join(CC) + ']',
        'train.batch_size', '2',
        'train.input_sizes', '[96]',
        'model.max_gt_boxes', '32',
        'system.label_assign', 'host',
    ])
    data = TrainData(cfg)
    batch = next(iter(epoch_batches(data, num_workers=2)))
    assert batch['image'].shape[0] == 2
    assert batch['image'].shape[-1] == 3
    assert np.isfinite(batch['image']).all()
    # some scale has at least one positive assignment across the batch
    assert sum(float(t[..., 4:5].sum()) for t in batch['targets'][:3]) > 0

    # a fully-buried box must be caught by the coverage test
    assert _coverage((0, 0, 100, 100), (10, 10, 20, 20)) == 1.0


def _assign_labels_loop(bboxes, input_size, strides, anchors, num_classes,
                        gt_per_grid=3, iou_threshold=0.3, max_gt=64):
    """The original sequential per-box implementation, kept verbatim as the
    parity oracle for the vectorised assign_labels (reference
    train_dataset.py:109-150 semantics incl. later-box-wins overwrites)."""
    from pqdet_tpu.ops.boxes import iou_xywh_np

    out_sizes = [(input_size[0] // s, input_size[1] // s) for s in strides]
    labels = [np.zeros((h, w, gt_per_grid, 6 + num_classes), np.float32)
              for h, w in out_sizes]
    for lab in labels:
        lab[..., -1] = 1.0
    raw = [[] for _ in strides]
    for bbox in bboxes:
        coor = bbox[:4]
        cls_idx = int(bbox[4])
        mixw = bbox[5]
        xywh = np.concatenate([(coor[2:] + coor[:2]) * 0.5,
                               coor[2:] - coor[:2]])
        onehot = smooth_onehot(num_classes, cls_idx)
        xy_idx = (xywh[:2][:, None] // strides).astype(np.int32).T
        centers = (xy_idx.astype(np.float32) + 0.5) * strides[:, None]
        anchor_boxes = np.concatenate(
            [np.repeat(centers, gt_per_grid, axis=0), anchors], axis=-1)
        ious = iou_xywh_np(xywh, anchor_boxes)
        mask = ious > iou_threshold
        if not mask.any():
            mask[ious.argmax()] = True
        entry = np.concatenate([coor, [1.0], onehot, [mixw]])
        scales_hit = set()
        for i in np.nonzero(mask)[0]:
            scale, anchor = divmod(i, gt_per_grid)
            x, y = xy_idx[scale]
            h, w = out_sizes[scale]
            if 0 <= y < h and 0 <= x < w:
                labels[scale][y, x, anchor, :] = entry
                scales_hit.add(scale)
        for scale in scales_hit:
            raw[scale].append(coor)
    padded = []
    for boxes in raw:
        arr = np.zeros((max_gt, 4), np.float32)
        if boxes:
            stacked = np.stack(boxes)[:max_gt]
            arr[:len(stacked)] = stacked
        padded.append(arr)
    return labels, padded


def test_assign_labels_vectorised_parity():
    """Vectorised assign_labels == the sequential loop bit-for-bit over
    crowded random scenes (contended cells exercise the later-box-wins
    overwrite order; tiny/huge boxes exercise the argmax fallback and
    out-of-bounds centers)."""
    strides = np.array([8, 16, 32])
    anchors = np.array([[10, 13], [16, 30], [33, 23], [30, 61], [62, 45],
                        [59, 119], [116, 90], [156, 198], [373, 326]],
                       np.float32)
    nc = 7
    rng = np.random.RandomState(5)
    for trial in range(12):
        n = rng.randint(0, 40)
        size = (rng.choice([320, 416]), rng.choice([320, 416]))
        cxy = rng.rand(n, 2) * np.array(size)[::-1] * 1.05 - 5  # some OOB
        wh = np.exp(rng.uniform(np.log(2), np.log(300), (n, 2)))
        boxes = np.concatenate([
            cxy - wh / 2, cxy + wh / 2,
            rng.randint(0, nc, (n, 1)).astype(np.float64),
            rng.rand(n, 1)], axis=1).astype(np.float32)
        la, pa = assign_labels(boxes, size, strides, anchors, nc, max_gt=24)
        lb, pb = _assign_labels_loop(boxes, size, strides, anchors, nc,
                                     max_gt=24)
        for a, b in zip(la + pa, lb + pb):
            np.testing.assert_array_equal(a, b)


def test_device_label_assignment_parity():
    """On-device label assignment (ops/labels.py, built inside the jit
    step from the padded GT boxes) == host assign_labels bit-for-bit:
    same crowded scenes, contended (cell, anchor) slots (LAST-box-wins),
    argmax fallback, out-of-bounds centers, and zero-row padding."""
    import jax.numpy as jnp
    from pqdet_tpu.ops.labels import assign_labels_device

    strides = np.array([8, 16, 32])
    anchors = np.array([[10, 13], [16, 30], [33, 23], [30, 61], [62, 45],
                        [59, 119], [116, 90], [156, 198], [373, 326]],
                       np.float32)
    nc, max_gt = 7, 24
    rng = np.random.RandomState(7)
    for trial in range(10):
        n = rng.randint(0, max_gt + 1)   # device path grids <= max_gt boxes
        size = (int(rng.choice([320, 416])), int(rng.choice([320, 416])))
        cxy = rng.rand(n, 2) * np.array(size)[::-1] * 1.05 - 5  # some OOB
        wh = np.exp(rng.uniform(np.log(2), np.log(300), (n, 2)))
        boxes = np.concatenate([
            cxy - wh / 2, cxy + wh / 2,
            rng.randint(0, nc, (n, 1)).astype(np.float64),
            rng.rand(n, 1)], axis=1).astype(np.float32)
        la, pa = assign_labels(boxes, size, strides, anchors, nc,
                               max_gt=max_gt)
        gt = np.zeros((1, max_gt, 6), np.float32)
        gt[0, :n] = boxes
        outs = assign_labels_device(jnp.asarray(gt), size, strides, anchors,
                                    nc, gt_per_grid=3, iou_threshold=0.3)
        for host, dev in zip(la + pa, outs):
            np.testing.assert_array_equal(host, np.asarray(dev)[0],
                                          err_msg=f'trial {trial} n={n}')


def test_image_cache_isolation(tmp_path):
    """dataset.cache_images hands out COPIES: augment ops that mutate in
    place (CutOut writes into crop views) must not corrupt the cache."""
    from pqdet_tpu.data.samples import VOCSampleGetter
    g = VOCSampleGetter(mode='train', classes=CLASSES, cache_images=True)
    p = str(tmp_path / 'x.jpg')
    cv2.imwrite(p, np.random.RandomState(0).randint(0, 255, (40, 40, 3),
                                                    dtype=np.int64).astype(np.uint8))
    a = g.image(p)
    orig = a[0, 0, 0]
    a[0, 0, 0] = 255 - orig  # mutate the handed-out copy
    assert g.image(p)[0, 0, 0] == orig
    assert len(g._img_cache) == 1


def test_process_loader_epoch(voc_cfg):
    """ProcessLoader (spawned workers + shared-memory slabs) yields the
    same batch count/shapes/size plan as the thread loader and sane
    label content."""
    from pqdet_tpu.data.train_data import ProcessLoader
    cfg = voc_cfg.clone().defrost()
    cfg.system.label_assign = 'host'
    cfg.freeze()
    data = TrainData(cfg)
    plan_sizes = [tuple(s) for s in data._sizes]
    loader = ProcessLoader(data, num_workers=2, prefetch=2)
    try:
        seen = []
        for batch in loader.epoch():
            b, h, w, c = batch['image'].shape
            assert (b, c) == (2, 3)
            assert batch['image'].dtype == np.uint8
            seen.append((h, w))
            assert len(batch['targets']) == 6
            for lab, s in zip(batch['targets'][:3], (8, 16, 32)):
                assert lab.shape[1:3] == (h // s, w // s)
                assert np.all(lab[..., -1] != 0)  # mixup weight everywhere
            for gt in batch['targets'][3:]:
                assert gt.shape == (2, 16, 4)
        assert seen == plan_sizes  # multi-scale plan preserved exactly
        # slabs are reusable across epochs
        assert sum(1 for _ in loader.epoch()) == len(plan_sizes)
    finally:
        loader.close()


def test_process_loader_abandoned_epoch_reclaims_slabs(voc_cfg):
    """Abandoning the epoch generator mid-epoch (train-loop exception, e.g.
    the NaN guard) must return in-flight slab names to the free list —
    each leak would shrink the pool until submit() pops from empty."""
    from pqdet_tpu.data.train_data import ProcessLoader
    data = TrainData(voc_cfg)
    loader = ProcessLoader(data, num_workers=2, prefetch=2)
    try:
        n_slabs = len(loader._free)
        for _ in range(3):  # abandon after one batch, repeatedly
            gen = loader.epoch()
            next(gen)
            gen.close()  # GeneratorExit -> finally must reclaim
            assert len(loader._free) == n_slabs
        # and a full epoch still works afterwards
        assert sum(1 for _ in loader.epoch()) == len(data._sizes)
        assert len(loader._free) == n_slabs
    finally:
        loader.close()


def test_process_loader_device_labels(voc_cfg):
    """ProcessLoader in the default device-label mode: uint8 image slab +
    raw GT boxes."""
    from pqdet_tpu.data.train_data import ProcessLoader
    data = TrainData(voc_cfg)
    loader = ProcessLoader(data, num_workers=2, prefetch=2)
    try:
        n = 0
        for batch in loader.epoch():
            assert batch['image'].dtype == np.uint8
            assert batch['gt'].shape == (2, 16, 6)
            assert batch['gt'].dtype == np.float32
            n += 1
        assert n == len(data._sizes)
    finally:
        loader.close()


def test_device_cache_batches_match_loader(voc_cfg):
    """dataset.device_cache: gathered-from-HBM batches must equal the
    loader path bit-for-bit at the cached (max) size, and produce
    correctly-shaped scaled batches at smaller multi-scale sizes."""
    import jax
    from pqdet_tpu.train.trainer import Trainer

    cfg = voc_cfg.clone().defrost()
    cfg.dataset.device_cache = True
    cfg.augment.device = True
    cfg.train.max_epochs = 1
    cfg.freeze()
    tr = Trainer(cfg)
    tr.init_all()
    assert tr._device_cache is not None
    data = tr.train_data

    seen_sizes = set()
    for k, (batch, steps) in enumerate(tr._device_batches()):
        s = int(data._sizes[k][0])
        seen_sizes.add(s)
        assert batch['image'].shape[1:3] == (s, s)
        assert batch['gt'].shape[1:] == (16, 6)
        if s == tr._device_cache['smax']:
            # bit-parity with the loader's own sample builder
            rows = data.batch_indices()[k]
            imgs, gts = [], []
            for i in rows:
                img, gt = data.build_sample(data._indexes[i], (s, s))
                imgs.append(img), gts.append(gt)
            np.testing.assert_array_equal(np.asarray(batch['image']),
                                          np.stack(imgs))
            np.testing.assert_array_equal(np.asarray(batch['gt']),
                                          np.stack(gts))
        else:
            # boxes scale with the resize ratio
            r = s / tr._device_cache['smax']
            rows = data.batch_indices()[k]
            _, gt0 = data.build_sample(data._indexes[rows[0]],
                                      (tr._device_cache['smax'],) * 2)
            np.testing.assert_allclose(np.asarray(batch['gt'][0, :, :4]),
                                       gt0[:, :4] * r, atol=1e-4)
        if k >= 3:
            break
    assert len(seen_sizes) >= 1
