"""Network-slimming channel pruner.

Operates on the graph IR + params pytree and re-emits a pruned cfg, with
masking rules in exact parity with the reference pruner
(pruning/pruner.py:64-120, pruning/block.py:57-160):

- global threshold: the prune.ratio percentile of all |BN gamma| across
  conv+BN layers
- normal conv+BN keeps its top-|gamma| channels, count rounded UP to a
  divisor of 8 with a floor of 16 (a layer fully under threshold survives
  at 16 channels)
- depthwise conv inherits the input mask (groups follow)
- shortcut members are keep_out (masks preserved, inputs still pruned) and
  must agree
- the SE expand conv feeding a scale_channels is constrained to the mask of
  the scale target
- bias-only convs (heads) keep all output channels
- route concatenates input masks

Weight layout here is HWIO (in axis 2, out axis 3).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from pqdet_tpu.model.cfgparse import emit_cfg
from pqdet_tpu.model.graph import Graph


class PruneResult:
    def __init__(self, cfg_text: str, params: Dict, state: Dict,
                 report: List[str], prune_limit: float):
        self.cfg_text = cfg_text
        self.params = params
        self.state = state
        self.report = report
        self.prune_limit = prune_limit


def prune_slimming(graph: Graph, params: Dict, state: Dict,
                   prune_ratio: float) -> PruneResult:
    nodes = graph.nodes

    # pre-pass: keep_out (shortcut members) and SE constraints
    keep_out = set()
    constrain = {}  # conv node index -> node index whose mask it must match
    for n in nodes:
        if n.kind == 'shortcut':
            keep_out.add(n.refs[0])
            keep_out.add(n.index - 1)
        elif n.kind == 'scale_channels':
            constrain[n.index - 1] = n.refs[0]

    # global threshold over |gamma| of all conv+BN layers
    gammas, max_per_layer = [], []
    for n in nodes:
        if n.kind == 'convolutional' and n.has_bn:
            g = np.abs(np.asarray(params[str(n.index)]['bn']['gamma']))
            gammas.append(g)
            max_per_layer.append(g.max())
    flat = np.sort(np.concatenate(gammas))
    prune_limit = float(np.searchsorted(flat, min(max_per_layer)) / len(flat))
    report = [f'prune limit: {prune_limit}']
    if prune_ratio > prune_limit:
        report.append('the layer reached prune limit will be cast to 16 channels.')
    threshold = flat[int(len(flat) * prune_ratio)]

    out_mask: Dict[int, np.ndarray] = {}
    new_params: Dict[str, dict] = {}
    new_state: Dict[str, dict] = {}
    new_layers: List[dict] = [{'name': 'net', 'channels': graph.in_channels}]

    def _mask_bn(idx: str, mask) -> None:
        p = params[idx]
        new_params[idx]['bn'] = {'gamma': np.asarray(p['bn']['gamma'])[mask],
                                 'beta': np.asarray(p['bn']['beta'])[mask]}
        new_state[idx] = {'mean': np.asarray(state[idx]['mean'])[mask],
                          'var': np.asarray(state[idx]['var'])[mask]}

    for n in nodes:
        idx = str(n.index)
        attrs = dict(n.attrs)
        attrs.pop('stride_out', None)
        if n.kind == 'convolutional':
            in_mask = out_mask[n.index - 1] if n.index > 0 \
                else np.ones(n.in_channels, bool)
            w = np.asarray(params[idx]['w'])  # HWIO
            pruned = 0

            if n.index in constrain and not n.has_bn:
                cmask = out_mask[constrain[n.index]]
                new_params[idx] = {'w': w[:, :, in_mask, :][:, :, :, cmask],
                                   'b': np.asarray(params[idx]['b'])[cmask]}
                out_mask[n.index] = cmask
                pruned = int(len(cmask) - cmask.sum())
            elif not n.has_bn:
                new_params[idx] = {'w': w[:, :, in_mask, :],
                                   'b': np.asarray(params[idx]['b'])}
                out_mask[n.index] = np.ones(w.shape[3], bool)
            elif n.attrs['groups'] > 1:
                if n.attrs['groups'] != n.in_channels:
                    raise ValueError(
                        f'layer {n.index}: only depthwise grouped convs '
                        f'can be pruned')
                new_params[idx] = {'w': w[:, :, :, in_mask]}
                _mask_bn(idx, in_mask)
                out_mask[n.index] = in_mask
                attrs['groups'] = int(in_mask.sum())
            elif n.index in keep_out:
                new_params[idx] = {'w': w[:, :, in_mask, :]}
                _mask_bn(idx, slice(None))
                out_mask[n.index] = np.ones(w.shape[3], bool)
            else:
                g = np.abs(np.asarray(params[idx]['bn']['gamma']))
                n_keep = int(np.sum(g > threshold))
                n_keep = max(16, ((n_keep + 7) // 8) * 8)
                picked = np.argsort(-g, kind='stable')[:n_keep]
                mask = np.zeros(len(g), bool)
                mask[picked] = True
                new_params[idx] = {'w': w[:, :, in_mask, :][:, :, :, mask]}
                _mask_bn(idx, mask)
                out_mask[n.index] = mask
                pruned = int(len(g) - mask.sum())

            attrs['filters'] = int(out_mask[n.index].sum())
            report.append(f'({n.index}){n.kind}: {pruned}/'
                          f'{len(out_mask[n.index])} pruned')
        elif n.kind == 'shortcut':
            m1, m2 = out_mask[n.refs[0]], out_mask[n.index - 1]
            if not np.array_equal(m1, m2):
                raise ValueError(f'shortcut {n.index}: member masks differ')
            out_mask[n.index] = m1
            report.append(f'({n.index}){n.kind}: 0/{len(m1)} pruned')
        elif n.kind == 'route':
            out_mask[n.index] = np.concatenate([out_mask[r] for r in n.refs])
            report.append(f'({n.index}){n.kind}: 0/{len(out_mask[n.index])} pruned')
        elif n.kind == 'scale_channels':
            out_mask[n.index] = out_mask[n.refs[0]]
            report.append(f'({n.index}){n.kind}: 0/{len(out_mask[n.index])} pruned')
        elif n.kind == 'fc':
            new_params[idx] = {'w': np.asarray(params[idx]['w']),
                               'b': np.asarray(params[idx]['b'])}
            out_mask[n.index] = np.ones(n.out_channels, bool)
        else:  # maxpool / avgpool / upsample / yolo / dropout
            prev = out_mask.get(n.index - 1)
            out_mask[n.index] = prev if prev is not None \
                else np.ones(n.out_channels, bool)
            report.append(f'({n.index}){n.kind}: 0/{len(out_mask[n.index])} pruned')

        # drop keys the cfg emitter rebuilds from structure
        if n.kind == 'yolo':
            attrs.pop('stride', None)
        new_layers.append(attrs)

    cfg_text = emit_cfg(new_layers)
    # structural sanity: the pruned cfg must rebuild into a graph whose
    # shapes match the pruned params
    pruned_graph = Graph.from_cfg(cfg_text)
    for n in pruned_graph.nodes:
        if n.kind == 'convolutional':
            w = new_params[str(n.index)]['w']
            assert w.shape[3] == n.attrs['filters'], \
                f'layer {n.index}: emitted filters mismatch'
            assert w.shape[2] == n.in_channels // n.attrs['groups'], \
                f'layer {n.index}: emitted in_channels mismatch'
    return PruneResult(cfg_text, new_params, new_state, report, prune_limit)
