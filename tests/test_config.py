"""Config system tests: yaml merge, dotlist overrides, freeze, coercion."""

import pytest

from pqdet_tpu.config import default_config, load_config, size_fix, sizes_fix


def test_defaults():
    cfg = default_config()
    assert cfg.train.batch_size == 12
    assert cfg.eval.score_threshold == 0.1
    assert len(cfg.dataset.classes) == 20
    assert cfg.model.cfg_path == 'mobilenetv2-fpn'


def test_merge_from_file(tmp_path):
    y = tmp_path / 'exp.yaml'
    y.write_text('train:\n  batch_size: 32\n  scheduler: step\n'
                 'dataset:\n  name: COCO\n')
    cfg = load_config(str(y), freeze=False)
    assert cfg.train.batch_size == 32
    assert cfg.train.scheduler == 'step'
    assert cfg.dataset.name == 'COCO'
    assert cfg.train.max_epochs == 80  # untouched default


def test_merge_from_list():
    cfg = load_config(opts=['train.batch_size', '4',
                            'sparse.switch', 'true',
                            'eval.input_size', '416'], freeze=False)
    assert cfg.train.batch_size == 4
    assert cfg.sparse.switch is True
    assert cfg.eval.input_size == 416


def test_unknown_key_rejected(tmp_path):
    y = tmp_path / 'bad.yaml'
    y.write_text('train:\n  batchsize: 32\n')
    with pytest.raises(KeyError):
        load_config(str(y))
    with pytest.raises(KeyError):
        load_config(opts=['nope.key', '1'])


def test_freeze():
    cfg = load_config()
    with pytest.raises(AttributeError):
        cfg.train.batch_size = 1


def test_type_checking():
    with pytest.raises(TypeError):
        load_config(opts=['train.batch_size', 'not_a_number'])


def test_size_fix():
    assert size_fix(512) == (512, 512)
    assert size_fix((480, 640)) == (480, 640)
    assert sizes_fix([320, (416, 512)]) == [(320, 320), (416, 512)]
