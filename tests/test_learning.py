"""End-to-end LEARNING test: the full pipeline (data -> assignment -> loss
-> sharded train step -> eval -> AP) must actually fit an easy synthetic
task, not just run. Bright squares on dark backgrounds, one class."""

import os

import cv2
import numpy as np
import pytest

from pqdet_tpu.config import load_config

CFG = '''
[net]
channels=3
[convolutional]
filters=16
size=3
pad=1
stride=2
batch_normalize=1
activation=leaky
[convolutional]
filters=24
size=3
pad=1
stride=2
batch_normalize=1
activation=leaky
[convolutional]
filters=32
size=3
pad=1
stride=2
batch_normalize=1
activation=leaky
[convolutional]
filters=18
size=1
pad=1
activation=linear
[yolo]
classes=1
[route]
layers=-3
[convolutional]
filters=48
size=3
pad=1
stride=2
batch_normalize=1
activation=leaky
[convolutional]
filters=18
size=1
pad=1
activation=linear
[yolo]
classes=1
[route]
layers=-3
[convolutional]
filters=48
size=3
pad=1
stride=2
batch_normalize=1
activation=leaky
[convolutional]
filters=18
size=1
pad=1
activation=linear
[yolo]
classes=1
'''


def _make_square_dataset(root, n=24, size=96, seed=0):
    """VOC-layout dataset: one bright square per dark image."""
    rng = np.random.RandomState(seed)
    img_dir = os.path.join(root, 'JPEGImages')
    ann_dir = os.path.join(root, 'Annotations')
    os.makedirs(img_dir), os.makedirs(ann_dir)
    paths = []
    for i in range(n):
        img = rng.randint(0, 40, (size, size, 3), np.uint8)
        side = rng.randint(28, 44)
        x1 = rng.randint(0, size - side)
        y1 = rng.randint(0, size - side)
        img[y1:y1 + side, x1:x1 + side] = rng.randint(200, 255, 3)
        p = os.path.join(img_dir, f'sq{i}.jpg')
        cv2.imwrite(p, img)
        xml = (f'<annotation><object><name>square</name>'
               f'<difficult>0</difficult><bndbox><xmin>{x1}</xmin>'
               f'<ymin>{y1}</ymin><xmax>{x1+side}</xmax><ymax>{y1+side}</ymax>'
               f'</bndbox></object></annotation>')
        with open(os.path.join(ann_dir, f'sq{i}.xml'), 'w') as fw:
            fw.write(xml)
        paths.append(p)
    txt = os.path.join(root, 'list.txt')
    with open(txt, 'w') as fw:
        fw.write('\n'.join(paths))
    return txt


@pytest.mark.slow
def test_detector_learns_synthetic_squares(tmp_path):
    txt = _make_square_dataset(str(tmp_path))
    cfg_file = tmp_path / 'sq.cfg'
    cfg_file.write_text(CFG)
    cfg = load_config(opts=[
        'dataset.train_txt_file', txt,
        'dataset.eval_txt_file', txt,
        'dataset.classes', '[square]',
        'model.cfg_path', str(cfg_file),
        'model.anchors', '[[36, 36], [36, 36], [36, 36], [36, 36], [36, 36],'
                         ' [36, 36], [36, 36], [36, 36], [36, 36]]',
        'model.max_gt_boxes', '4',
        'train.batch_size', '8',
        'train.input_sizes', '[96]',
        'train.max_epochs', '14',
        'train.warmup_epochs', '1',
        'train.learning_rate_init', '3e-3',
        'augment.mixup_p', '0.0',
        'augment.crop_p', '0.0',
        'augment.hflip_p', '0.5',
        'eval.after', '13',
        'eval.batch_size', '8',
        'eval.input_size', '96',
        'eval.score_threshold', '0.3',
        'eval.max_detections', '16',
        'weight.dir', str(tmp_path / 'w'),
        'system.num_workers', '4',
        'system.compute_dtype', 'float32',
    ])
    from pqdet_tpu.train.trainer import Trainer
    trainer = Trainer(cfg)
    trainer.run()
    ap50 = float(trainer.AP.raw[0][0])
    assert ap50 > 0.5, f'detector failed to learn: AP50={ap50:.3f}'


@pytest.mark.slow
def test_sparse_prune_finetune_cycle(tmp_path):
    """The full compression pipeline on the synthetic-squares task:
    sparse-train -> slimming-prune 30% -> fine-tune -> AP survives."""
    import jax
    import numpy as np
    from pqdet_tpu.compress.prune import prune_slimming
    from pqdet_tpu.model.network import DetectionNetwork
    from pqdet_tpu.train.checkpoint import save_checkpoint
    from pqdet_tpu.train.trainer import Trainer

    txt = _make_square_dataset(str(tmp_path))
    cfg_file = tmp_path / 'sq.cfg'
    cfg_file.write_text(CFG)
    base_opts = [
        'dataset.train_txt_file', txt,
        'dataset.eval_txt_file', txt,
        'dataset.classes', '[square]',
        'model.cfg_path', str(cfg_file),
        'model.anchors', '[[36, 36], [36, 36], [36, 36], [36, 36], [36, 36],'
                         ' [36, 36], [36, 36], [36, 36], [36, 36]]',
        'model.max_gt_boxes', '4',
        'train.batch_size', '8',
        'train.input_sizes', '[96]',
        'train.learning_rate_init', '3e-3',
        'augment.mixup_p', '0.0',
        'augment.crop_p', '0.0',
        'eval.batch_size', '8',
        'eval.input_size', '96',
        'eval.score_threshold', '0.3',
        'eval.max_detections', '16',
        'weight.dir', str(tmp_path / 'w'),
        'system.num_workers', '4',
        'system.compute_dtype', 'float32',
    ]
    # 1. sparse training
    cfg = load_config(opts=base_opts + [
        'train.max_epochs', '12', 'train.warmup_epochs', '1',
        'eval.after', '99', 'sparse.switch', 'true', 'sparse.ratio', '0.005'])
    trainer = Trainer(cfg)
    trainer.run()
    ckpt_path = str(tmp_path / 'w' / 'VOC' / 'model-11.ckpt')
    assert os.path.exists(ckpt_path)

    # 2. prune 30%
    from pqdet_tpu.model.factory import build_detector
    network, params, state, info = build_detector(None, weight_path=ckpt_path)
    result = prune_slimming(network.graph, params, state, prune_ratio=0.3)
    n0 = sum(np.size(v) for v in jax.tree.leaves(params))
    n1 = sum(np.size(v) for v in jax.tree.leaves(result.params))
    assert n1 < n0
    new_cfg = tmp_path / 'pruned.cfg'
    new_cfg.write_text(result.cfg_text)
    pruned_ckpt = str(tmp_path / 'pruned.ckpt')
    save_checkpoint(pruned_ckpt, result.params, result.state, step=0,
                    cfg_text=result.cfg_text)

    # 3. fine-tune the pruned model and check it still detects
    cfg2 = load_config(opts=base_opts + [
        'train.max_epochs', '6', 'train.warmup_epochs', '0',
        'eval.after', '5',
        'train.learning_rate_init', '1e-3',
        'weight.resume', pruned_ckpt, 'weight.clear_history', 'true'])
    cfg2 = cfg2.clone().defrost()
    cfg2.model.cfg_path = str(new_cfg)
    cfg2.freeze()
    t2 = Trainer(cfg2)
    t2.run()
    ap50 = float(t2.AP.raw[0][0])
    assert ap50 > 0.4, f'pruned+finetuned detector too weak: AP50={ap50:.3f}'
