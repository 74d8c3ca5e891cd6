"""End-to-end smoke: Trainer on a synthetic VOC dataset with a tiny model,
then eval + checkpoint + predict round trip."""

import os

import numpy as np
import pytest

from pqdet_tpu.config import load_config
from tests.test_data import _write_voc_fixture

TINY_DET = '''
[net]
channels=3
[convolutional]
filters=8
size=3
pad=1
stride=2
batch_normalize=1
activation=relu6
[convolutional]
filters=16
size=3
pad=1
stride=2
batch_normalize=1
activation=relu6
[convolutional]
filters=16
size=3
pad=1
stride=2
batch_normalize=1
activation=relu6
[convolutional]
filters=24
size=1
pad=1
activation=linear
[yolo]
classes=3
[route]
layers=-3
[convolutional]
filters=24
size=3
pad=1
stride=2
batch_normalize=1
activation=relu6
[convolutional]
filters=24
size=1
pad=1
activation=linear
[yolo]
classes=3
[route]
layers=-3
[convolutional]
filters=24
size=3
pad=1
stride=2
batch_normalize=1
activation=relu6
[convolutional]
filters=24
size=1
pad=1
activation=linear
[yolo]
classes=3
'''


@pytest.fixture
def tiny_cfg(tmp_path):
    txt = _write_voc_fixture(str(tmp_path), n=4)
    cfg_file = tmp_path / 'tiny.cfg'
    cfg_file.write_text(TINY_DET)
    cfg = load_config(opts=[
        'dataset.train_txt_file', txt,
        'dataset.eval_txt_file', txt,
        'dataset.classes', '[cat, dog, bird]',
        'model.cfg_path', str(cfg_file),
        'model.max_gt_boxes', '8',
        'train.batch_size', '2',
        'train.input_sizes', '[64]',
        'train.max_epochs', '2',
        'train.warmup_epochs', '1',
        'eval.after', '1',
        'eval.batch_size', '2',
        'eval.input_size', '64',
        'eval.max_detections', '32',
        'weight.dir', str(tmp_path / 'weights'),
        'system.num_workers', '2',
    ])
    return cfg


def test_trainer_end_to_end(tiny_cfg, capsys):
    from pqdet_tpu.train.trainer import Trainer
    trainer = Trainer(tiny_cfg)
    trainer.run()
    out = capsys.readouterr().out
    assert 'images for train' in out
    assert 'mAPs' in out  # eval ran after epoch 1
    # checkpoints written for both epochs
    wdir = os.path.join(tiny_cfg.weight.dir, tiny_cfg.experiment_name)
    ckpts = sorted(os.listdir(wdir))
    assert len(ckpts) == 2
    assert trainer.global_step == 2 * trainer.steps_per_epoch

    # resume from the checkpoint: step restored
    resumed = load_resume(tiny_cfg, os.path.join(wdir, ckpts[-1]))
    assert resumed.global_step == trainer.global_step


def load_resume(cfg, ckpt_path):
    from pqdet_tpu.train.trainer import Trainer
    cfg2 = cfg.clone().defrost()
    cfg2.weight.resume = ckpt_path
    cfg2.freeze()
    t = Trainer(cfg2)
    t.init_all()
    return t


def test_predict_cli(tiny_cfg, tmp_path):
    """Train 0 epochs (random weights) but exercise the predict pipeline."""
    import jax
    from pqdet_tpu.cli.predict import draw_detections, predict_image
    img_path = None
    with open(tiny_cfg.dataset.train_txt_file) as fr:
        img_path = fr.readline().strip()
    image, dets = predict_image(tiny_cfg, img_path,
                                cfg_path=tiny_cfg.model.cfg_path)
    assert dets.ndim == 2 and dets.shape[1] == 6
    marked = draw_detections(image, dets, tiny_cfg.dataset.classes)
    assert marked.shape == image.shape


def test_macs_parity_with_reference():
    """MACs/params at 512x512 vs the reference model zoo (BASELINE.md)."""
    from pqdet_tpu.model.graph import Graph
    from pqdet_tpu.utils.profiling import count_macs_params
    from pqdet_tpu.zoo import get_cfg
    expected = {
        'mobilenetv2-fpn': (4.336e9, 6.775e6),
        'regnetx-600m-fpn': (4.387e9, 7.417e6),
        'regnetx-600m-pan': (4.210e9, 7.145e6),
        'regnety-400m-fpn': (3.324e9, 5.581e6),
    }
    for name, (ref_macs, ref_params) in expected.items():
        g = Graph.from_cfg(get_cfg(name))
        macs, params = count_macs_params(g, (512, 512))
        assert abs(params - ref_params) / ref_params < 0.001, name
        assert abs(macs - ref_macs) / ref_macs < 0.001, \
            f'{name}: {macs / 1e9:.3f}G vs {ref_macs / 1e9:.3f}G'


def test_benchmark_cli_stage_split(tiny_cfg, capsys):
    """cmd_benchmark reports the reference's four-way stage split
    (test.py:155-193): TOTAL / FORWARD / CONVERT / NMS."""
    import argparse
    from pqdet_tpu.cli.bench import cmd_benchmark
    args = argparse.Namespace(weight='', limit=4, bf16=False)
    cmd_benchmark(args, tiny_cfg)
    out = capsys.readouterr().out
    for stage in ('total', 'forward', 'convert', 'nms'):
        assert f'{stage}: mean' in out, out


def test_trainer_unrolled_steps(tiny_cfg):
    """unroll_steps>1 trains via scanned multi-step dispatches end to end."""
    cfg = tiny_cfg.clone().defrost()
    cfg.train.unroll_steps = 2
    cfg.train.max_epochs = 1
    cfg.eval.after = 0
    cfg.freeze()
    from pqdet_tpu.train.trainer import Trainer
    trainer = Trainer(cfg)
    trainer.run()
    # 4 images / bs 2 = 2 batches = 1 group of 2 steps
    assert trainer.global_step == 2
    assert trainer.AP is not None
