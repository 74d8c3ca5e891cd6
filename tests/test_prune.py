"""Slimming pruner tests: structural correctness + functional preservation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pqdet_tpu.compress.prune import prune_slimming
from pqdet_tpu.model.graph import Graph
from pqdet_tpu.model.network import DetectionNetwork
from pqdet_tpu.zoo import get_cfg
from pqdet_tpu.zoo.builder import CfgBuilder


def _mobile_style_cfg(nc=3):
    """Small net exercising every prune rule: stem, depthwise, shortcut,
    SE (scale_channels), route, head."""
    b = CfgBuilder()
    b.conv(32, size=3, stride=2, activation='relu6')          # 0 stem
    b.conv(32, size=3, groups=32, activation='relu6')         # 1 depthwise
    b.conv(48, size=1, activation='linear')                   # 2
    b.conv(48, size=3, activation='relu6')                    # 3
    b.shortcut(2)                                             # 4 (2,3 keep_out)
    gconv = b.conv(64, size=3, stride=2, activation='relu6')  # 5
    b.avgpool()                                               # 6
    b.conv(16, size=1, bn=False, activation='relu')           # 7 se reduce
    b.conv(64, size=1, bn=False, activation='logistic')       # 8 se expand
    b.scale_channels(gconv)                                   # 9
    b.conv(64, size=1, activation='relu6')                    # 10
    b.route([10, 9])                                          # 11
    b.conv(3 * (5 + nc), size=1, bn=False, activation='linear')  # 12 pred
    b.yolo(nc)                                                # 13
    return b.text()


def test_prune_structure_and_forward():
    cfg = _mobile_style_cfg()
    net = DetectionNetwork.from_cfg(cfg)
    params, state = net.init(jax.random.PRNGKey(0))
    res = prune_slimming(net.graph, params, state, prune_ratio=0.5)

    pruned = DetectionNetwork.from_cfg(res.cfg_text)
    x = jnp.zeros((1, 32, 32, 3))
    out, _ = pruned.apply(res.params, res.state, x)
    base_out, _ = net.apply(params, state, x)
    assert out.shape == base_out.shape  # head shape unchanged

    n0 = sum(v.size for v in jax.tree.leaves(params))
    n1 = sum(np.size(v) for v in jax.tree.leaves(res.params))
    assert n1 < n0

    g = Graph.from_cfg(res.cfg_text)
    # pruned channel counts rounded to 8 with floor 16 (or untouched)
    for n in g.nodes:
        if n.kind == 'convolutional' and n.has_bn and n.attrs['groups'] == 1:
            assert n.out_channels % 8 == 0 or n.out_channels in (32, 48, 64)


def test_prune_zeroed_channels_is_function_preserving():
    """Channels with gamma=0, beta=0 contribute nothing; pruning them must
    not change the network function."""
    cfg = _mobile_style_cfg()
    net = DetectionNetwork.from_cfg(cfg)
    params, state = net.init(jax.random.PRNGKey(1))

    # zero out gamma/beta for a third of channels in prunable convs
    # (node 0 stem and node 10; nodes 2,3 are keep_out, 1 depthwise, 5 -> SE)
    rng = np.random.RandomState(0)
    for idx in ('0', '10'):
        gamma = np.asarray(params[idx]['bn']['gamma']).copy()
        beta = np.asarray(params[idx]['bn']['beta']).copy()
        kill = rng.permutation(len(gamma))[:len(gamma) // 3]
        gamma[kill] = 0.0
        beta[kill] = 0.0
        # make survivors clearly above threshold
        survivors = np.setdiff1d(np.arange(len(gamma)), kill)
        gamma[survivors] = np.sign(gamma[survivors] + 1e-3) * \
            (np.abs(gamma[survivors]) + 1.0)
        params[idx]['bn']['gamma'] = jnp.asarray(gamma)
        params[idx]['bn']['beta'] = jnp.asarray(beta)

    x = jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32)
    base, _ = net.apply(params, state, x)

    # ratio 0.1 puts the global threshold at 0.0 (inside the zeroed gammas):
    # survivors everywhere are strictly above it, so only dead channels and
    # the divisor-8 rounding slack get picked — function preserving
    res = prune_slimming(net.graph, params, state, prune_ratio=0.1)
    pruned_net = DetectionNetwork.from_cfg(res.cfg_text)
    out, _ = pruned_net.apply(res.params, res.state, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                               rtol=1e-4, atol=1e-4)


def test_prune_mobilenetv2_fpn():
    """Full zoo model prunes and still runs."""
    net = DetectionNetwork.from_cfg(get_cfg('mobilenetv2-fpn'))
    params, state = net.init(jax.random.PRNGKey(0))
    res = prune_slimming(net.graph, params, state, prune_ratio=0.3)
    pruned = DetectionNetwork.from_cfg(res.cfg_text)
    out, _ = jax.jit(lambda p, s, x: pruned.apply(p, s, x))(
        res.params, res.state, jnp.zeros((1, 64, 64, 3)))
    assert out.shape[-1] == 25
    assert 'prune limit' in res.report[0]


def test_prune_rejects_grouped_nondepthwise():
    net = DetectionNetwork.from_cfg(get_cfg('regnetx-600m-fpn'))
    params, state = net.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError):
        prune_slimming(net.graph, params, state, prune_ratio=0.3)
