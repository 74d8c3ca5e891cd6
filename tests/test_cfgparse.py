"""cfg parser golden tests (grammar parity with reference model/parser.py)."""

import pytest

from pqdet_tpu.model.cfgparse import (CfgSyntaxError, emit_cfg, parse_cfg,
                                      parse_scalar, parse_value)


def test_scalar_types():
    assert parse_scalar('3') == 3 and isinstance(parse_scalar('3'), int)
    assert parse_scalar('.5') == 0.5
    assert parse_scalar('0.25') == 0.25
    assert parse_scalar('leaky') == 'leaky'
    # no dot -> int() fails -> string (reference str2value semantics)
    assert parse_scalar('1e-4') == '1e-4'
    assert parse_scalar('-2') == -2
    assert parse_scalar(' 46') == 46  # int() strips whitespace


def test_list_values():
    assert parse_value('-1, 46') == [-1, 46]
    assert parse_value('1,2,3') == [1, 2, 3]
    assert parse_value('10') == 10


def test_basic_parse():
    text = '''
# a comment
[net]
channels=3

[convolutional]
filters=32
size=3
pad=1
stride=2
batch_normalize=1
activation=relu6

[yolo]
classes=20
ignore_thresh = .5  # inline comment
'''
    layers = parse_cfg(text)
    assert [l['name'] for l in layers] == ['net', 'convolutional', 'yolo']
    conv = layers[1]
    assert conv['filters'] == 32 and conv['size'] == 3 and conv['stride'] == 2
    assert conv['activation'] == 'relu6' and conv['batch_normalize'] == 1
    assert conv['groups'] == 1  # default applied
    assert layers[2]['ignore_thresh'] == 0.5
    assert layers[2]['bbox_loss'] == 'giou'  # default


def test_defaults_not_shared():
    a = parse_cfg('[convolutional]\nfilters=8')
    b = parse_cfg('[convolutional]')
    assert a[0]['filters'] == 8 and b[0]['filters'] == 1


def test_route_single_vs_list():
    layers = parse_cfg('[route]\nlayers=-1\n[route]\nlayers=-1, 4')
    assert layers[0]['layers'] == -1
    assert layers[1]['layers'] == [-1, 4]


def test_syntax_errors():
    with pytest.raises(CfgSyntaxError):
        parse_cfg('[bogus_layer]\n')
    with pytest.raises(CfgSyntaxError):
        parse_cfg('[convolutional]\nfilters 32\n')


def test_emit_roundtrip():
    text = '[net]\nchannels=3\n[convolutional]\nfilters=16\nsize=3\npad=1\n' \
           '[route]\nlayers=-1, 2\n[yolo]\nclasses=7\n'
    layers = parse_cfg(text)
    again = parse_cfg(emit_cfg(layers))
    assert layers == again
