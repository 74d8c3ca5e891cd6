"""End-to-end differential evaluation vs the actual torch reference:
same weights, same images, both FULL eval pipelines (preprocess -> forward
-> recover -> NMS -> greedy AP matching), per-image detection parity and
AP equality (reference eval/evaluator.py:44-175). The 500-image run lives
in cli/diffeval.py; this test runs a reduced version in CI."""

import os

import numpy as np
import pytest

import jax

REF = os.environ.get('PQDET_REFERENCE', '/root/reference')
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason='reference tree not mounted')


def test_diffeval_small(tmp_path):
    from pqdet_tpu.config import load_config
    from pqdet_tpu.data.scripts.synth_shapes import generate
    from pqdet_tpu.cli.diffeval import run_diffeval
    from pqdet_tpu.model.network import DetectionNetwork
    from pqdet_tpu.train.checkpoint import save_checkpoint
    from pqdet_tpu.zoo.builder import CfgBuilder

    generate(str(tmp_path), n=16, size=224, seed=3, holdout=0.5)
    eval_txt = str(tmp_path / 'test.txt')

    # stride-8 head (the reference's TARGET_MAP only knows strides 8/16/32)
    # with depthwise + shortcut + SE + route coverage
    nc = 3
    b = CfgBuilder()
    b.conv(16, size=3, stride=2, activation='relu6')
    b.conv(16, size=3, groups=16, activation='relu6')
    b.conv(24, size=3, stride=2, activation='leaky')
    c = b.conv(24, size=1, activation='linear')
    b.conv(24, size=3, activation='relu6')
    b.shortcut(c)
    g = b.conv(32, size=3, stride=2, activation='relu6')
    b.avgpool()
    b.conv(8, size=1, bn=False, activation='relu')
    b.conv(32, size=1, bn=False, activation='logistic')
    se = b.scale_channels(g)
    b.conv(3 * (5 + nc), size=1, bn=False, activation='linear')
    b.yolo(nc)                                   # stride 8
    b.route([se])
    b.conv(40, size=3, stride=2, activation='relu6')
    b.conv(3 * (5 + nc), size=1, bn=False, activation='linear')
    b.yolo(nc)                                   # stride 16
    cfg_text = b.text()
    cfg_file = tmp_path / 'm.cfg'
    cfg_file.write_text(cfg_text)

    # brief training so detections are peaked/realistic (random weights put
    # thousands of boxes over threshold; the reference's NMS output is
    # unbounded while ours is fixed-shape, so counts would trivially differ)
    cfg = load_config(opts=[
        'dataset.name', 'VOC',
        'dataset.train_txt_file', str(tmp_path / 'train.txt'),
        'dataset.eval_txt_file', eval_txt,
        'dataset.classes', '[square, circle, triangle]',
        'model.cfg_path', str(cfg_file),
        'model.max_gt_boxes', '8',
        'train.batch_size', '4',
        'train.input_sizes', '[224]',
        'train.max_epochs', '8',
        'train.warmup_epochs', '1',
        'train.learning_rate_init', '1e-3',
        'eval.after', '99',
        'eval.input_size', '224',
        'eval.batch_size', '4',
        'eval.score_threshold', '0.3',
        # the 16-step-trained weights vary run to run (host augmentations
        # draw from the GLOBAL np.random, so worker-thread interleaving
        # changes the training stream) — parity must hold for ANY weights.
        # max_detections must cover every candidate (28^2*3 + 14^2*3 =
        # 2940 boxes x 3 classes <= pool) or a weak model's over-threshold
        # flood truncates our fixed-shape NMS output while the reference's
        # is unbounded, and match_rate collapses on count alone.
        'eval.max_detections', '3072',
        'eval.pool_factor', '4',
        # single worker: the per-worker np.random.seed makes the augment
        # stream (and so the trained weights) deterministic across runs
        'system.num_workers', '1',
        'system.compute_dtype', 'float32',
        'weight.dir', str(tmp_path / 'w'),
    ])
    from pqdet_tpu.train.trainer import Trainer
    trainer = Trainer(cfg)
    trainer.run()
    wdir = os.path.join(cfg.weight.dir, cfg.experiment_name)
    ckpt = os.path.join(wdir, sorted(os.listdir(wdir))[-1])

    report = run_diffeval(cfg, ckpt)
    assert report['images'] >= 2
    # both pipelines must agree detection-for-detection (small float
    # tolerance) and AP-for-AP
    assert report['match_rate'] > 0.97, report
    assert report['AP_delta'] < 0.01, report
    assert report['AP50_delta'] < 0.01, report
