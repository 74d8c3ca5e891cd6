"""Graph IR tests: channel/stride inference, assertions, liveness, zoo parity."""

import pytest

from pqdet_tpu.model.graph import Graph, GraphError
from pqdet_tpu.zoo import MODEL_ZOO, get_cfg

TINY = '''
[net]
channels=3
[convolutional]
filters=8
size=3
pad=1
stride=2
batch_normalize=1
activation=relu
[convolutional]
filters=8
size=3
pad=1
batch_normalize=1
activation=linear
[shortcut]
from=-2
activation=relu
[convolutional]
filters=27
size=1
pad=1
activation=linear
[yolo]
classes=4
'''


def test_tiny_graph():
    g = Graph.from_cfg(TINY)
    kinds = [n.kind for n in g.nodes]
    assert kinds == ['convolutional', 'convolutional', 'shortcut',
                     'convolutional', 'yolo']
    assert [n.out_channels for n in g.nodes] == [8, 8, 8, 27, 27]
    assert [n.stride for n in g.nodes] == [2, 2, 2, 2, 2]
    assert g.nodes[2].refs == (0,)
    # shortcut marks both sides notprune
    assert g.nodes[0].notprune and g.nodes[1].notprune
    # conv feeding yolo protected
    assert g.nodes[3].notprune


def test_channel_mismatch_raises():
    bad = TINY.replace('filters=8\nsize=3\npad=1\nbatch_normalize=1\nactivation=linear',
                       'filters=16\nsize=3\npad=1\nbatch_normalize=1\nactivation=linear')
    with pytest.raises(GraphError):
        Graph.from_cfg(bad)


def test_route_stride_mismatch_raises():
    cfg = '''
[net]
channels=3
[convolutional]
filters=4
size=3
pad=1
stride=2
[convolutional]
filters=4
size=3
pad=1
stride=2
[route]
layers=-1, -2
'''
    with pytest.raises(GraphError):
        Graph.from_cfg(cfg)


def test_liveness():
    g = Graph.from_cfg(TINY)
    # node 0 is consumed by node 1 (chain) and node 2 (shortcut ref)
    assert g.last_use[0] == 2
    assert g.last_use[3] == 4


@pytest.mark.parametrize('name', sorted(MODEL_ZOO))
def test_zoo_builds(name):
    g = Graph.from_cfg(get_cfg(name))
    assert sorted(n.stride for n in g.yolo_nodes) == [8, 16, 32]
    for n in g.yolo_nodes:
        assert n.attrs['classes'] == 20


def test_zoo_param_counts():
    """Parameter parity with the reference model zoo (BASELINE.md)."""
    import jax
    from pqdet_tpu.model.network import DetectionNetwork
    expected = {
        'mobilenetv2-fpn': 6.775e6,
        'regnetx-600m-fpn': 7.417e6,
        'regnetx-600m-pan': 7.145e6,
        'regnety-400m-fpn': 5.581e6,
    }
    for name, ref in expected.items():
        net = DetectionNetwork.from_cfg(get_cfg(name))
        params, _ = net.init(jax.random.PRNGKey(0))
        n = sum(x.size for x in jax.tree.leaves(params))
        assert abs(n - ref) / ref < 0.001, f'{name}: {n} vs {ref}'
