"""Integration tests for the NAS search and hyper-evolution drivers, plus
the VisDrone data path (csv labels, ratio+pad eval, per-image batches)."""

import json
import os

import cv2
import numpy as np
import pytest

from pqdet_tpu.config import load_config
from tests.test_data import _write_voc_fixture

TINY_HEADS = '''
[net]
channels=3
[convolutional]
filters=8
size=3
pad=1
stride=2
batch_normalize=1
activation=leaky
[convolutional]
filters=16
size=3
pad=1
stride=2
batch_normalize=1
activation=leaky
[convolutional]
filters=16
size=3
pad=1
stride=2
batch_normalize=1
activation=leaky
[convolutional]
filters={pred}
size=1
pad=1
activation=linear
[yolo]
classes={nc}
[route]
layers=-3
[convolutional]
filters=24
size=3
pad=1
stride=2
batch_normalize=1
activation=leaky
[convolutional]
filters={pred}
size=1
pad=1
activation=linear
[yolo]
classes={nc}
[route]
layers=-3
[convolutional]
filters=24
size=3
pad=1
stride=2
batch_normalize=1
activation=leaky
[convolutional]
filters={pred}
size=1
pad=1
activation=linear
[yolo]
classes={nc}
'''


def _tiny_cfg_text(nc=3):
    return TINY_HEADS.format(nc=nc, pred=3 * (5 + nc))


@pytest.fixture
def small_cfg(tmp_path):
    txt = _write_voc_fixture(str(tmp_path), n=4)
    return load_config(opts=[
        'dataset.train_txt_file', txt,
        'dataset.eval_txt_file', txt,
        'dataset.classes', '[cat, dog, bird]',
        'model.max_gt_boxes', '8',
        'train.batch_size', '2',
        'train.input_sizes', '[64]',
        'train.warmup_epochs', '0.5',
        'eval.after', '0',
        'eval.batch_size', '2',
        'eval.input_size', '64',
        'eval.max_detections', '16',
        'weight.dir', str(tmp_path / 'w'),
        'system.num_workers', '2',
        'system.compute_dtype', 'float32',
    ])


@pytest.mark.slow
def test_run_nas_returns_ap(small_cfg, tmp_path):
    """Trainer.run_nas short-trains a candidate cfg and returns an AP."""
    from pqdet_tpu.train.trainer import Trainer
    trainer = Trainer(small_cfg)
    ap = trainer.run_nas(_tiny_cfg_text())
    assert 0.0 <= float(ap) <= 1.0


@pytest.mark.slow
def test_evoluter_rounds(small_cfg, tmp_path, monkeypatch):
    """Two evolution rounds produce fitness records with injected hypers."""
    from pqdet_tpu.nas.evolute import Evoluter
    cfg = small_cfg.clone().defrost()
    cfg.model.cfg_path = ''
    cfg.freeze()
    log = str(tmp_path / 'evo.json')

    ev = Evoluter(cfg, rounds=2, log_path=log, seed=0)
    # evolution needs a model cfg: route through the base config clone
    ev.base_config = small_cfg.clone().defrost()
    cfg_file = tmp_path / 'tiny.cfg'
    cfg_file.write_text(_tiny_cfg_text())
    ev.base_config.model.cfg_path = str(cfg_file)
    ev.base_config.freeze()
    records = ev.run()
    assert len(records) == 2
    assert all(0.0 <= r['fitness'] <= 1.0 for r in records)
    assert os.path.exists(log)
    saved = json.load(open(log))['data']
    assert len(saved) == 2
    assert saved[0]['hyper'] != saved[1]['hyper']


def _write_visdrone_fixture(root, n=3, seed=0):
    rng = np.random.RandomState(seed)
    img_dir = os.path.join(root, 'images')
    ann_dir = os.path.join(root, 'annotations')
    os.makedirs(img_dir), os.makedirs(ann_dir)
    paths = []
    for i in range(n):
        h, w = 96, 128  # uniform sizes (visdrone eval batches stack)
        img = rng.randint(0, 255, (h, w, 3), np.uint8)
        p = os.path.join(img_dir, f'v{i}.jpg')
        cv2.imwrite(p, img)
        lines = []
        for _ in range(rng.randint(2, 5)):
            x, y = rng.randint(0, w - 30), rng.randint(0, h - 30)
            bw, bh = rng.randint(10, 25), rng.randint(10, 25)
            score = int(rng.rand() < 0.8)
            cat = rng.randint(1, 11)  # valid categories 1..10
            lines.append(f'{x},{y},{bw},{bh},{score},{cat},0,0')
        lines.append('5,5,10,10,1,0,0,0')   # ignored-region category: dropped
        lines.append('5,5,10,10,1,11,0,0')  # others category: dropped
        with open(os.path.join(ann_dir, f'v{i}.txt'), 'w') as fw:
            fw.write('\n'.join(lines))
        paths.append(p)
    txt = os.path.join(root, 'list.txt')
    with open(txt, 'w') as fw:
        fw.write('\n'.join(paths))
    return txt


def test_visdrone_pipeline(tmp_path):
    from pqdet_tpu.data.eval_data import EvalData
    from pqdet_tpu.data.samples import VisDroneSampleGetter
    from pqdet_tpu.data.train_data import TrainData

    txt = _write_visdrone_fixture(str(tmp_path))
    classes = ['pedestrian', 'people', 'bicycle', 'car', 'van', 'truck',
               'tricycle', 'awning-tricycle', 'bus', 'motor']
    cfg = load_config(opts=[
        'dataset.name', 'visdrone',
        'dataset.train_txt_file', txt,
        'dataset.eval_txt_file', txt,
        'dataset.classes', '[%s]' % ', '.join(classes),
        'model.max_gt_boxes', '16',
        'train.batch_size', '3',
        'train.input_sizes', '[64]',
        'eval.batch_size', '1',
    ])
    # labels: categories 0/11 dropped, score->difficult mapping
    getter = VisDroneSampleGetter(mode='eval', classes=classes)
    bbs, diffs = getter.label(txt.replace('list.txt', 'images/v0.jpg'))
    assert len(bbs) and (bbs[:, 4] < 10).all() and (bbs[:, 4] >= 0).all()
    assert set(np.unique(diffs)) <= {0, 1}

    # train pipeline end to end (RandomCrop 416 + Resize); device-label
    # mode is the default: (uint8 image, padded gt boxes)
    data = TrainData(cfg)
    img, gt = data.get(0)
    assert img.shape == (64, 64, 3) and img.dtype == np.uint8
    assert gt.shape[1] == 6

    # eval path: ResizeRatio(1.25) + PadNearestDivisor -> 96*1.25=120 -> 128
    edata = EvalData(cfg)
    batch = edata.batch(0)
    assert batch['image'].shape == (1, 128, 160, 3)
    assert batch['count'] == 1


def test_visdrone_recover_matches_forward_pipeline():
    """ratio_pad_affine must exactly invert ResizeRatio+PadNearestDivisor,
    including the rounding the reference gets wrong (STATUS.md)."""
    import jax.numpy as jnp
    from pqdet_tpu.data import augment
    from pqdet_tpu.ops.postprocess import ratio_pad_affine, recover_bboxes

    rng = np.random.RandomState(0)
    for h, w in [(96, 128), (794, 1333), (540, 960), (767, 1365)]:
        img = np.zeros((h, w, 3), np.uint8)
        boxes = np.array([[10.0, 12.0, 60.0, 70.0, 0]], np.float32)
        chain = augment.Compose([augment.ResizeRatio(1.25),
                                 augment.PadNearestDivisor()])
        out_img, out_boxes = chain(img, boxes.copy())

        pred = np.zeros((1, 1, 15), np.float32)
        pred[0, 0, :4] = out_boxes[0, :4]
        pred[0, 0, 4] = 1.0
        rec = recover_bboxes(jnp.asarray(pred),
                             jnp.asarray(np.array(out_img.shape[:2], np.float32)),
                             jnp.asarray(np.array([[h, w]], np.float32)),
                             affine=ratio_pad_affine)
        np.testing.assert_allclose(np.asarray(rec)[0, 0, :4], boxes[0, :4],
                                   atol=0.8, err_msg=f'{h}x{w}')


def test_ladder_newest_ckpt_naming(tmp_path, monkeypatch):
    """newest_ckpt must rank every Trainer naming scheme by epoch: plain
    'model-<e>[-AP]', the prune fine-tune's 'pruned-<ratio>-model-<e>-AP'
    (regression: the old 'pruned' substring filter excluded ALL fine-tune
    checkpoints and int('30') ranked by ratio), and skip only the raw
    '<ckpt>-pruned.ckpt' artifact cli.prune writes next to its input."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        'run_ladder', os.path.join(os.path.dirname(__file__), '..',
                                   'tools', 'run_ladder.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(mod, 'W', str(tmp_path))

    d = tmp_path / 'exp'
    d.mkdir()
    for name in ['pruned-30-model-2-0.5000.ckpt', 'pruned-30-model-11-0.6000.ckpt',
                 'model-3-0.7-pruned.ckpt']:
        (d / name).touch()
    assert os.path.basename(mod.newest_ckpt('exp')).startswith(
        'pruned-30-model-11')

    d2 = tmp_path / 'exp2'
    d2.mkdir()
    for name in ['model-4.ckpt', 'model-10-0.4790.ckpt', 'model-9-0.9.ckpt']:
        (d2 / name).touch()
    assert 'model-10' in os.path.basename(mod.newest_ckpt('exp2'))
