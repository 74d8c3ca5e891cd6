"""ONNX export round-trips: serialize -> decode -> numpy-execute -> compare
against the JAX network / int8 executor (the role onnxruntime plays for the
reference, test.py:22-40; exporters cover convert.py:58-69 and
export/onnx_exporter.py:33-398)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pqdet_tpu.compress.qat import QuantCtx, prepare_qat_state
from pqdet_tpu.compress.quantized import Int8Inference, convert_to_int8
from pqdet_tpu.exporters import onnx_proto as P
from pqdet_tpu.exporters.onnx_export import (export_normal_to_onnx,
                                             export_quantized_to_onnx)
from pqdet_tpu.exporters.onnx_runtime import run_model
from pqdet_tpu.model.network import DetectionNetwork, fuse_params
from tests.test_prune import _mobile_style_cfg


def _fpn_style_cfg(nc=3):
    """Adds upsample + route-concat + multi-head (beyond
    _mobile_style_cfg's SE/shortcut coverage)."""
    from pqdet_tpu.zoo.builder import CfgBuilder
    b = CfgBuilder()
    b.conv(16, size=3, stride=2, activation='leaky')
    c1 = b.conv(24, size=3, stride=2, activation='leaky')
    c2 = b.conv(32, size=3, stride=2, activation='leaky')
    b.conv(3 * (5 + nc), size=1, bn=False, activation='linear')
    b.yolo(nc)                       # stride 8
    b.route([c2])
    up = b.upsample(2)
    b.route([up, c1])
    b.conv(3 * (5 + nc), size=1, bn=False, activation='linear')
    b.yolo(nc)                       # stride 4
    return b.text()


def test_proto_roundtrip():
    t = P.tensor('w', np.arange(12, dtype=np.float32).reshape(3, 4))
    n = P.node('Conv', ['x', 'w'], ['y'], strides=[2, 2], alpha=0.1,
               mode='nearest')
    m = P.model('g', [n], [P.value_info('x', P.FLOAT, [1, 3, None, 8])],
                [P.value_info('y', P.FLOAT, [1, 4])], [t])
    m2 = P.decode_model(P.encode_model(m))
    assert m2['opset'] == 13
    g = m2['graph']
    assert g['node'][0]['op_type'] == 'Conv'
    attrs = P.node_attrs(g['node'][0])
    assert attrs['strides'] == [2, 2]
    assert abs(attrs['alpha'] - 0.1) < 1e-7
    assert attrs['mode'] == 'nearest'
    np.testing.assert_array_equal(P.tensor_to_numpy(g['initializer'][0]),
                                  np.arange(12, dtype=np.float32).reshape(3, 4))
    assert g['input'][0]['shape'] == [1, 3, None, 8]


def test_export_normal_roundtrip():
    for cfg_text in (_mobile_style_cfg(), _fpn_style_cfg()):
        net = DetectionNetwork.from_cfg(cfg_text)
        params, state = net.init(jax.random.PRNGKey(0))
        fused = fuse_params(net, params, state)

        rng = np.random.RandomState(0)
        x = rng.rand(2, 32, 32, 3).astype(np.float32)
        ref, _ = net.apply(fused, {}, jnp.asarray(x))
        ref = np.asarray(ref)

        blob = export_normal_to_onnx(net, jax.tree.map(np.asarray, fused),
                                     (32, 32), batch_size=2)
        out, = run_model(blob, {'input': np.transpose(x, (0, 3, 1, 2))})
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def _regnet_style_cfg(nc=3):
    """Grouped convs with group width >= 2 (the RegNet shape class): the
    quantized export must emit QLinearConv group=G with the ORIGINAL
    grouped weights even though Int8Inference serves them densified."""
    from pqdet_tpu.zoo.builder import CfgBuilder
    b = CfgBuilder()
    b.conv(16, size=3, stride=2, activation='relu')
    b.conv(32, size=1, activation='relu')
    b.conv(32, size=3, groups=4, activation='relu')   # width 8 grouped
    b.conv(32, size=1, activation='linear')
    b.shortcut(1)
    b.conv(3 * (5 + nc), size=1, bn=False, activation='linear')
    b.yolo(nc)
    return b.text()


@pytest.mark.parametrize('cfg_fn', [_mobile_style_cfg, _regnet_style_cfg])
def test_export_quantized_roundtrip(cfg_fn):
    net = DetectionNetwork.from_cfg(cfg_fn(), quant=True)
    params, state = net.init(jax.random.PRNGKey(0))
    params, state = prepare_qat_state(net, params, state)
    rng = np.random.RandomState(1)
    x = rng.rand(1, 32, 32, 3).astype(np.float32)
    ctx = QuantCtx(state['quant'], observing=True)
    net.apply(params, state, jnp.asarray(x), quant_ctx=ctx)
    state = {**state, 'quant': ctx.new_obs}

    qparams = convert_to_int8(net, params, state)
    ref = np.asarray(Int8Inference(net, mode='int').apply(qparams, jnp.asarray(x)))

    blob = export_quantized_to_onnx(net, qparams, (32, 32), batch_size=1)
    out, = run_model(blob, {'input': np.transpose(x, (0, 3, 1, 2))})
    assert out.shape == ref.shape
    # int32-bias quantisation (QLinearConv spec) adds up to half an output
    # code per conv vs the executor's fp bias; scores stay within a few
    # quant steps, boxes within a pixel
    assert np.median(np.abs(out[..., :4] - ref[..., :4])) < 1.0
    assert np.median(np.abs(out[..., 4:] - ref[..., 4:])) < 0.05
