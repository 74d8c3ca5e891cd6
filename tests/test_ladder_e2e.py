"""In-process micro version of tools/run_ladder.py: the full compression
lifecycle — fp train -> sparse train -> slimming prune + fine-tune -> QAT
-> int8 convert -> int8 eval — chained through the REAL CLI entry points
(cli.train / cli.prune / cli.convert / cli.bench), exactly the subprocess
sequence the hardware ladder drives (reference prune.py:12-30 +
trainer.py quant flow tools.py:212-242).

This guards the stage TRANSITIONS that unit tests cannot see: checkpoint
naming/discovery across stages, model.cfg_path-over-embedded-cfg
resolution when QAT resumes a PRUNED checkpoint, and the quant
state-machine accepting a fine-tuned fp checkpoint.
"""

import glob
import importlib.util
import os
import sys

import pytest

from tests.test_data import _write_voc_fixture
from tests.test_e2e import TINY_DET

pytestmark = pytest.mark.slow


def _load_run_ladder():
    spec = importlib.util.spec_from_file_location(
        'run_ladder', os.path.join(os.path.dirname(__file__), '..',
                                   'tools', 'run_ladder.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_cli_compression_ladder(tmp_path, monkeypatch, capsys):
    txt = _write_voc_fixture(str(tmp_path), n=4)
    cfg_file = tmp_path / 'tiny.cfg'
    cfg_file.write_text(TINY_DET)
    wdir = tmp_path / 'weights'
    base = [
        'dataset.train_txt_file', txt,
        'dataset.eval_txt_file', txt,
        'dataset.classes', '[cat, dog, bird]',
        'model.cfg_path', str(cfg_file),
        'model.max_gt_boxes', '8',
        'train.batch_size', '2',
        'train.input_sizes', '[64]',
        'train.max_epochs', '1',
        'train.warmup_epochs', '0.0',
        'eval.after', '99',
        'eval.batch_size', '2',
        'eval.input_size', '64',
        'eval.max_detections', '32',
        'weight.dir', str(wdir),
        'system.num_workers', '2',
    ]
    from pqdet_tpu.cli import bench as cli_bench
    from pqdet_tpu.cli import convert as cli_convert
    from pqdet_tpu.cli import prune as cli_prune
    from pqdet_tpu.cli import train as cli_train
    from pqdet_tpu.train.checkpoint import load_checkpoint

    ladder = _load_run_ladder()
    monkeypatch.setattr(ladder, 'W', str(wdir))

    def run_cli(mod, argv):
        monkeypatch.setattr(sys, 'argv', ['prog'] + argv)
        mod.main()

    # --- fp: train from scratch (run_ladder.py fp stage) ---
    run_cli(cli_train, base + ['experiment_name', 'fp'])
    fp_ckpt = ladder.newest_ckpt('fp')
    assert os.path.basename(fp_ckpt) == 'model-0.ckpt'  # eval.after 99

    # --- sparse: resume fp with L1 BN-gamma subgradient ---
    run_cli(cli_train, base + [
        'experiment_name', 'sparse',
        'weight.resume', fp_ckpt, 'weight.clear_history', 'on',
        'sparse.switch', 'on', 'sparse.ratio', '0.005'])
    out = capsys.readouterr().out
    assert 'BN layers will be sparsed' in out
    sparse_ckpt = ladder.newest_ckpt('sparse')

    # --- prune: slimming prune + 1-epoch fine-tune (cli.prune flow) ---
    new_cfg = str(tmp_path / 'pruned.cfg')
    run_cli(cli_prune, ['--skip-test'] + base + [
        'experiment_name', 'pruneft',
        'prune.weight', sparse_ckpt,
        'prune.new_cfg', new_cfg,
        'prune.ratio', '0.3',
        'prune.finetune_epochs', '1'])
    assert os.path.exists(new_cfg)
    # the raw pre-finetune artifact lands NEXT TO the sparse ckpt and must
    # not win checkpoint discovery for the sparse experiment
    raw = sparse_ckpt.rsplit('.', 1)[0] + '-pruned.ckpt'
    assert os.path.exists(raw)
    assert ladder.newest_ckpt('sparse') == sparse_ckpt
    pf_ckpt = ladder.newest_ckpt('pruneft')
    # run_prune evaluates every epoch -> 'pruned-30-model-<e>-<AP>.ckpt'
    assert os.path.basename(pf_ckpt).startswith('pruned-30-model-0')

    # --- qat: resume the PRUNED fine-tuned ckpt with fake-quant; the
    # pruned cfg must win over the checkpoint-embedded text. eval.after 0
    # (trailing override wins): per-epoch QAT eval runs the CONVERTED
    # int8 executor (trainer.make_predict_fn quant branch, mirroring
    # reference trainer.py:313) ---
    run_cli(cli_train, base + [
        'experiment_name', 'qat',
        'weight.resume', pf_ckpt, 'weight.clear_history', 'on',
        'model.cfg_path', new_cfg,
        'quant.switch', 'on',
        'quant.disable_observer_after', '0',
        'quant.freeze_bn_after', '1',
        'eval.after', '0'])
    out = capsys.readouterr().out
    assert 'mAPs' in out  # the in-QAT int8 eval printed an AP table
    qat_ckpt = ladder.newest_ckpt('qat')
    blob = load_checkpoint(qat_ckpt)
    assert blob.get('type') == 'qat'

    # --- int8: convert + eval through the int8 executor ---
    int8_path = str(tmp_path / 'int8.ckpt')
    run_cli(cli_convert, ['quantize', '--weight', qat_ckpt,
                          '--out', int8_path])
    assert load_checkpoint(int8_path).get('type') == 'quant'
    run_cli(cli_bench, ['eval', '--weight', int8_path] + base)
    out = capsys.readouterr().out
    assert 'mAPs' in out  # AP table printed from the int8 eval
