"""NAS space/candidates, anchors k-means, exporters, draw helpers."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pqdet_tpu.cli.anchors import iou_wh, kmeans_anchors
from pqdet_tpu.exporters.export import (export_stablehlo, load_stablehlo,
                                        load_weights_darknet,
                                        save_weights_darknet)
from pqdet_tpu.exporters.torch_convert import convert_torch_state_dict
from pqdet_tpu.model.graph import Graph
from pqdet_tpu.model.network import DetectionNetwork, fuse_params
from pqdet_tpu.nas.detnet import detnet_600m
from pqdet_tpu.nas.space import (REGNET_CONFIGS, generate_widths,
                                 regnet_stages, sample_head, widths_to_stages)
from tests.test_prune import _mobile_style_cfg


def test_regnet_width_generation():
    """600M parameters reproduce the published RegNetX-600MF stages."""
    stages = regnet_stages(REGNET_CONFIGS['600M'])
    assert stages['widths'] == [48, 96, 240, 528]
    assert stages['depths'] == [1, 3, 5, 7]
    assert sum(stages['depths']) == 16


def test_regnet_y600m():
    stages = regnet_stages(REGNET_CONFIGS['Y600M'])
    assert sum(stages['depths']) == 15
    assert all(w % g == 0 for w, g in zip(stages['widths'], stages['group_ws']))


def test_widths_to_stages():
    assert widths_to_stages([48, 96, 96, 240]) == ([48, 96, 240], [1, 2, 1])


def test_detnet_candidates_build():
    rng = np.random.RandomState(0)
    for _ in range(5):
        cfg_text = detnet_600m(num_classes=20, rng=rng)
        g = Graph.from_cfg(cfg_text)
        assert sorted(n.stride for n in g.yolo_nodes) == [8, 16, 32]


def test_sample_head_valid():
    rng = np.random.RandomState(1)
    for _ in range(20):
        h = sample_head(rng)
        assert all(w % g == 0 for w, g in zip(h['widths'], h['group_ws']))
        assert 1 <= h['depth'] <= 6


def test_kmeans_anchors():
    rng = np.random.RandomState(0)
    # three well-separated wh clusters
    whs = np.concatenate([
        rng.rand(100, 2) * 5 + np.array([10, 10]),
        rng.rand(100, 2) * 5 + np.array([60, 40]),
        rng.rand(100, 2) * 5 + np.array([200, 180]),
    ])
    anchors = kmeans_anchors(whs, k=3, seed=0)
    assert anchors.shape == (3, 2)
    # sorted by area and near the cluster centers
    areas = anchors[:, 0] * anchors[:, 1]
    assert (np.diff(areas) > 0).all()
    assert iou_wh(whs, anchors).max(axis=1).mean() > 0.8


def test_darknet_weights_roundtrip(tmp_path):
    net = DetectionNetwork.from_cfg(_mobile_style_cfg())
    params, state = net.init(jax.random.PRNGKey(0))
    path = str(tmp_path / 'm.weights')
    save_weights_darknet(net, params, state, path)
    p2, s2 = net.init(jax.random.PRNGKey(7))
    p2, s2 = load_weights_darknet(net, path, p2, s2)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(
            jax.tree.map(jnp.asarray, p2))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(
            jax.tree.map(jnp.asarray, s2))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_stablehlo_export_roundtrip():
    net = DetectionNetwork.from_cfg(_mobile_style_cfg())
    params, state = net.init(jax.random.PRNGKey(0))
    fused = fuse_params(net, params, state)
    blob = export_stablehlo(net, fused, input_size=(32, 32), batch_size=1)
    assert isinstance(blob, (bytes, bytearray)) and len(blob) > 1000

    fn = load_stablehlo(bytes(blob))
    x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 3), jnp.float32)
    out = fn(x)
    ref, _ = net.apply(fused, {}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_stablehlo_quant_export_roundtrip():
    """'quant' checkpoints get a deployable StableHLO artifact whose outputs
    match the int8 executor (reference purpose: the quantized ONNX export,
    export/onnx_exporter.py:33-398)."""
    from pqdet_tpu.compress.qat import QuantCtx, prepare_qat_state
    from pqdet_tpu.compress.quantized import Int8Inference, convert_to_int8
    from pqdet_tpu.exporters.export import export_stablehlo_quant

    net = DetectionNetwork.from_cfg(_mobile_style_cfg(), quant=True)
    params, state = net.init(jax.random.PRNGKey(0))
    params, state = prepare_qat_state(net, params, state)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 3), jnp.float32)
    ctx = QuantCtx(state['quant'], observing=True)
    net.apply(params, state, x, quant_ctx=ctx)
    state = {**state, 'quant': ctx.new_obs}
    qparams = convert_to_int8(net, params, state)

    blob = export_stablehlo_quant(net, qparams, input_size=(32, 32),
                                  batch_size=1)
    fn = load_stablehlo(bytes(blob))
    out = fn(x)
    ref = Int8Inference(net, mode='int').apply(qparams, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_torch_checkpoint_conversion():
    """OIHW torch state_dict -> pytree with numerically identical forward."""
    import torch
    cfg_text = _mobile_style_cfg()
    net = DetectionNetwork.from_cfg(cfg_text)
    params, state = net.init(jax.random.PRNGKey(0))

    # fabricate a torch-style state_dict from our params (module. prefix)
    sd = {}
    for node in net.graph.nodes:
        i = str(node.index)
        if i not in params:
            continue
        base = f'module.module_list.{node.index}'
        p = params[i]
        if node.kind == 'convolutional':
            sd[f'{base}.conv.weight'] = torch.from_numpy(
                np.asarray(p['w']).transpose(3, 2, 0, 1).copy())
            if 'bn' in p:
                sd[f'{base}.bn.weight'] = torch.from_numpy(np.asarray(p['bn']['gamma']))
                sd[f'{base}.bn.bias'] = torch.from_numpy(np.asarray(p['bn']['beta']))
                sd[f'{base}.bn.running_mean'] = torch.from_numpy(np.asarray(state[i]['mean']))
                sd[f'{base}.bn.running_var'] = torch.from_numpy(np.asarray(state[i]['var']))
            else:
                sd[f'{base}.conv.bias'] = torch.from_numpy(np.asarray(p['b']))

    p2, s2 = convert_torch_state_dict(sd, net)
    x = jnp.asarray(np.random.RandomState(1).rand(1, 32, 32, 3), jnp.float32)
    out1, _ = net.apply(params, state, x)
    out2, _ = net.apply(jax.tree.map(jnp.asarray, p2),
                        jax.tree.map(jnp.asarray, s2), x)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-5)


def test_draw_helpers(tmp_path):
    from pqdet_tpu.train.checkpoint import save_checkpoint
    from pqdet_tpu.utils.draw import (draw_bn_scatter, draw_evolution,
                                      draw_prune_bars)
    net = DetectionNetwork.from_cfg(_mobile_style_cfg())
    params, state = net.init(jax.random.PRNGKey(0))
    ck = str(tmp_path / 'a.ckpt')
    save_checkpoint(ck, params, state, step=0, cfg_text='')
    out = draw_bn_scatter([ck], save_path=str(tmp_path / 'bn.png'))
    assert os.path.exists(out)
    out = draw_prune_bars(ck, ck, save_path=str(tmp_path / 'bars.png'))
    assert os.path.exists(out)

    import json
    log = str(tmp_path / 'evo.json')
    json.dump({'data': [{'hyper': {'a': 0.5, 'b': 1.0}, 'fitness': 0.3},
                        {'hyper': {'a': 0.7, 'b': 0.5}, 'fitness': 0.4}]},
              open(log, 'w'))
    out = draw_evolution(log, save_path=str(tmp_path / 'evo.png'))
    assert os.path.exists(out)


def test_evolute_sampling():
    from pqdet_tpu.nas.evolute import BASE_HYPERS, sample_hypers
    rng = np.random.RandomState(0)
    h = sample_hypers(rng)
    assert set(h) == set(BASE_HYPERS)
    assert h['conf_loss_beta'] == 2.0
    assert 0.0 <= h['mixup_p'] <= 1.0
    assert h['cls_loss_beta'] in (0.0, 1.0, 2.0)


def test_nas_edf_analysis(tmp_path):
    """EDF/AUC analysis toolkit (reference nas/draw.py semantics): EDF is
    a proper CDF over errors, AUC ranks a better space higher, filters and
    the width-window search find a planted good region."""
    import json
    from pqdet_tpu.nas.analysis import (best_record, compare_edf,
                                        compute_auc, compute_edf,
                                        depth_filter, draw_edf,
                                        latency_filter, load_records,
                                        search_width_windows, width_filter)

    rng = np.random.RandomState(0)
    records = []
    for k in range(60):
        w0 = int(rng.choice([64, 128, 256, 512]))
        # plant structure: wider first branch -> better AP
        ap = float(np.clip(0.3 + 0.3 * (w0 >= 256) + rng.randn() * 0.05,
                           0, 1))
        records.append({
            'cfg': '', 'ap': ap, 'macs': float(2e9 + k), 'params': 1e6,
            'latency_ms': 5.0 + (k % 7),
            'head': {'widths': [w0, 256, 128], 'depth': 1 + k % 6,
                     'group_ws': [8, 8, 8]}})
    log = tmp_path / 'nas.json'
    log.write_text(json.dumps({'data': records}))

    recs = load_records(str(log))
    assert len(recs) == 60
    assert best_record(recs)['ap'] == max(r['ap'] for r in recs)

    errors, probs = compute_edf(recs)
    assert (np.diff(errors) >= 0).all() and probs[-1] == 1.0
    # a uniformly-better space has strictly higher AUC
    better = [dict(r, ap=min(r['ap'] + 0.2, 1.0)) for r in recs]
    assert compute_auc(*compute_edf(better)) > compute_auc(*compute_edf(recs))

    # filters
    assert all(5 <= r['latency_ms'] < 12
               for r in recs if latency_filter(4.9, 12)(r))
    assert all(r['head']['depth'] <= 3
               for r in recs if depth_filter(1, 3)(r))

    # the planted wide-first-branch region must show a positive AUC delta
    rep = compare_edf(recs, width_filter([256, 0, 0], [1024, 1024, 1024]))
    assert rep['delta'] > 0.05, rep
    windows = search_width_windows(recs, step=64)
    assert windows and windows[0][1] == 0 and windows[0][2] >= 192

    out = draw_edf([recs], ['all'], str(tmp_path / 'edf.png'))
    assert (tmp_path / 'edf.png').exists(), out
