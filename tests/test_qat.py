"""QAT fake-quant + int8 conversion tests."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pqdet_tpu.compress.qat import (QuantCtx, act_qparams, fake_quant_act,
                                    fake_quant_weight, observe,
                                    prepare_qat_state)
from pqdet_tpu.compress.quantized import (Int8Inference, convert_to_int8,
                                          int8_conv, quantize_weights)
from pqdet_tpu.model.network import DetectionNetwork
from tests.test_prune import _mobile_style_cfg


def test_fake_quant_weight_bounded_error():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(3, 3, 8, 16).astype(np.float32))
    q = fake_quant_weight(w)
    # error bounded by half a step per channel
    scale = np.abs(np.asarray(w)).max(axis=(0, 1, 2)) / 127.0
    err = np.abs(np.asarray(q - w))
    assert (err <= scale[None, None, None, :] * 0.5 + 1e-7).all()


def test_fake_quant_weight_ste_gradient():
    w = jnp.asarray(np.linspace(-1, 1, 64, dtype=np.float32).reshape(1, 1, 4, 16))
    g = np.asarray(jax.grad(lambda x: jnp.sum(fake_quant_weight(x)))(w))
    # straight-through: gradient 1 in the interior; exactly at the clip
    # boundary jnp.clip's subgradient gives 0.5 (harmless edge artifact)
    assert ((g == 1.0) | (g == 0.5)).all()
    assert (g == 1.0).mean() > 0.7


def test_observer_and_act_quant():
    obs = {'min': jnp.zeros(()), 'max': jnp.zeros(()),
           'initialized': jnp.zeros((), jnp.bool_)}
    x = jnp.asarray(np.array([0.0, 1.0, 2.0, 6.0], np.float32))
    obs = observe(obs, x, True)
    assert float(obs['max']) == 6.0 and float(obs['min']) == 0.0
    scale, zp = act_qparams(obs)
    assert float(zp) == 0.0  # non-negative range -> zero point 0
    q = fake_quant_act(x, obs)
    np.testing.assert_allclose(np.asarray(q), np.asarray(x), atol=float(scale) / 2 + 1e-7)

    # negative range shifts the zero point
    x2 = jnp.asarray(np.array([-1.0, 3.0], np.float32))
    obs2 = observe({'min': jnp.zeros(()), 'max': jnp.zeros(()),
                    'initialized': jnp.zeros((), jnp.bool_)}, x2, True)
    _, zp2 = act_qparams(obs2)
    assert float(zp2) > 0


def test_prepare_qat_state_edges():
    net = DetectionNetwork.from_cfg(_mobile_style_cfg(), quant=True)
    params, state = net.init(jax.random.PRNGKey(0))
    params, state = prepare_qat_state(net, params, state)
    q = state['quant']
    assert 'input' in q
    # the conv feeding the yolo head is a dequantised edge -> no observer
    yolo_feeder = str([n.index for n in net.graph.nodes if n.kind == 'yolo'][0] - 1)
    assert yolo_feeder not in q
    assert '0' in q


def test_qat_forward_and_convert_close_to_fp():
    """Fake-quant forward runs; int8 conversion stays close to the fp
    forward on the same weights."""
    net = DetectionNetwork.from_cfg(_mobile_style_cfg(), quant=True)
    params, state = net.init(jax.random.PRNGKey(0))
    params, state = prepare_qat_state(net, params, state)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1)

    # run a few observer passes (inference-mode BN, like converted eval)
    for _ in range(3):
        ctx = QuantCtx(state['quant'], observing=True)
        out_q, _ = net.apply(params, state, x, quant_ctx=ctx)
        state = {**state, 'quant': ctx.new_obs}

    out_fp, _ = net.apply(params, state, x)

    qparams = convert_to_int8(net, params, state)
    int8_net = Int8Inference(net)
    qp = Int8Inference.prepare(qparams)
    out_int8 = jax.jit(int8_net.apply)(qp, x)

    # the default 'pallas' executor matches the XLA 'int' executor: both run
    # exact s32 integer semantics on 1x1 convs (dw convs differ by bf16
    # rounding only)
    out_int = jax.jit(Int8Inference(net, mode='int').apply)(qparams, x)
    np.testing.assert_allclose(np.asarray(out_int8[..., 4:]),
                               np.asarray(out_int[..., 4:]), atol=2e-2)
    np.testing.assert_allclose(np.asarray(out_int8[..., :4]),
                               np.asarray(out_int[..., :4]), atol=0.5)

    assert out_int8.shape == out_fp.shape
    # boxes are in pixel units (x up to ~32); scores in [0,1]
    boxes_err = np.abs(np.asarray(out_int8[..., :4] - out_fp[..., :4]))
    score_err = np.abs(np.asarray(out_int8[..., 4:] - out_fp[..., 4:]))
    assert np.median(boxes_err) < 2.0, np.median(boxes_err)
    assert np.median(score_err) < 0.1, np.median(score_err)


def test_int8_conv_matches_fp_within_quant_error():
    rng = np.random.RandomState(1)
    x = rng.rand(1, 8, 8, 4).astype(np.float32)  # non-negative, zp=0
    w = rng.randn(3, 3, 4, 8).astype(np.float32) * 0.1
    b = rng.randn(8).astype(np.float32) * 0.01

    scale = float(x.max() / 255.0)
    xq = jnp.asarray(np.clip(np.round(x / scale), 0, 255).astype(np.uint8))
    wq, w_scale = quantize_weights(w)

    out = int8_conv(xq, (scale, 0.0), jnp.asarray(wq), jnp.asarray(w_scale),
                    jnp.asarray(b), stride=1, padding=1, groups=1)
    import torch
    import torch.nn.functional as F
    ref = F.conv2d(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                   torch.from_numpy(w.transpose(3, 2, 0, 1)),
                   torch.from_numpy(b), padding=1).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=0.05)


def test_int8_conv_nonzero_zeropoint():
    """Padding must represent real zero when the zero point is nonzero."""
    rng = np.random.RandomState(2)
    x = (rng.rand(1, 6, 6, 2).astype(np.float32) - 0.5) * 2  # [-1, 1]
    w = rng.randn(3, 3, 2, 4).astype(np.float32) * 0.2
    b = np.zeros(4, np.float32)

    mn, mx = float(x.min()), float(x.max())
    scale = (mx - mn) / 255.0
    zp = round(-mn / scale)
    xq = jnp.asarray(np.clip(np.round(x / scale + zp), 0, 255).astype(np.uint8))
    wq, w_scale = quantize_weights(w)
    out = int8_conv(xq, (scale, float(zp)), jnp.asarray(wq),
                    jnp.asarray(w_scale), jnp.asarray(b),
                    stride=1, padding=1, groups=1)
    import torch
    import torch.nn.functional as F
    ref = F.conv2d(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                   torch.from_numpy(w.transpose(3, 2, 0, 1)),
                   torch.from_numpy(b), padding=1).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=0.08)


def test_quantized_checkpoint_roundtrip(tmp_path):
    from pqdet_tpu.compress.quantized import load_quantized, save_quantized
    net = DetectionNetwork.from_cfg(_mobile_style_cfg(), quant=True)
    params, state = net.init(jax.random.PRNGKey(0))
    params, state = prepare_qat_state(net, params, state)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 3), jnp.float32)
    ctx = QuantCtx(state['quant'], observing=True)
    net.apply(params, state, x, quant_ctx=ctx)
    state = {**state, 'quant': ctx.new_obs}

    qparams = convert_to_int8(net, params, state)
    out1 = Int8Inference(net).apply(qparams, x)

    path = str(tmp_path / 'q.ckpt')
    save_quantized(path, net, qparams, cfg_text=_mobile_style_cfg(), step=7)
    net2, qparams2 = load_quantized(path)
    out2 = Int8Inference(net2).apply(qparams2, x)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               rtol=1e-5, atol=1e-5)


def _grouped_cfg(nc=3):
    """RegNet-style net: grouped 3x3 stacks + a grouped 1x1."""
    from pqdet_tpu.zoo.builder import CfgBuilder
    b = CfgBuilder()
    b.conv(16, size=3, stride=2, activation='relu')
    b.conv(32, size=3, stride=2, groups=4, activation='relu')   # width 4
    b.conv(32, size=1, groups=8, activation='relu')             # grouped 1x1
    b.conv(48, size=3, stride=2, groups=8, activation="relu")
    b.conv(3 * (5 + nc), size=1, bn=False, activation='linear')
    b.yolo(nc)
    return b.text()


def test_int8_densified_grouped_convs_match_int_oracle():
    """Quantized grouped convs (RegNet pattern) densify at prepare() and run
    the MXU paths: grouped 3x3 -> _native_conv3x3 (exact-int bf16 conv),
    grouped 1x1 -> qconv1x1_s8. Both must match the XLA 'int' oracle, which
    runs the original feature_group_count convs."""
    net = DetectionNetwork.from_cfg(_grouped_cfg(), quant=True)
    params, state = net.init(jax.random.PRNGKey(1))
    params, state = prepare_qat_state(net, params, state)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1)
    for _ in range(3):
        ctx = QuantCtx(state['quant'], observing=True)
        net.apply(params, state, x, quant_ctx=ctx)
        state = {**state, 'quant': ctx.new_obs}

    qparams = convert_to_int8(net, params, state)
    qp = Int8Inference.prepare(qparams, network=net)
    # densification happened: grouped 3x3 -> wnat with full Cin; grouped
    # 1x1 -> w2d with full Cin
    assert qp['layers']['1']['wnat'].shape == (3, 3, 16, 32)
    assert qp['layers']['2']['w2d'].shape == (32, 32)
    assert qp['layers']['3']['wnat'].shape == (3, 3, 32, 48)

    out = jax.jit(Int8Inference(net, act=qp['act']).apply)(qp, x)
    ref = jax.jit(Int8Inference(net, mode='int').apply)(qparams, x)
    np.testing.assert_allclose(np.asarray(out[..., 4:]),
                               np.asarray(ref[..., 4:]), atol=2e-2)
    np.testing.assert_allclose(np.asarray(out[..., :4]),
                               np.asarray(ref[..., :4]), atol=0.5)


def test_int8_xla_family_matches_pallas_family(monkeypatch):
    """The whole-XLA serving family (1x1 via native s8 MXU convs, dense
    3x3 via _xla_conv3x3_s8) is BIT-EXACT vs the Pallas-kernel family on
    1x1/stem layers: both run the same recentred-s8 integer algebra with
    f32 epilogues (dw layers may differ by bf16 tap rounding only).
    Batch 8 engages the bs>=8 auto policy (pw joins the XLA conv family,
    compress/quantized.py:_pw_impl)."""
    net = DetectionNetwork.from_cfg(_mobile_style_cfg(), quant=True)
    params, state = net.init(jax.random.PRNGKey(2))
    params, state = prepare_qat_state(net, params, state)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(8, 32, 32, 3).astype(np.float32) * 2 - 1)
    for _ in range(2):
        ctx = QuantCtx(state['quant'], observing=True)
        net.apply(params, state, x, quant_ctx=ctx)
        state = {**state, 'quant': ctx.new_obs}

    qparams = convert_to_int8(net, params, state)
    qp = Int8Inference.prepare(qparams, network=net)
    inf = Int8Inference(net, act=qp['act'])

    monkeypatch.setenv('PQDET_PW_IMPL', 'xla')
    monkeypatch.setenv('PQDET_NAT_IMPL', 's8')
    out_xla = jax.jit(inf.apply)(qp, x)
    monkeypatch.setenv('PQDET_PW_IMPL', 'pallas')
    monkeypatch.setenv('PQDET_NAT_IMPL', 'bf16')
    out_pal = jax.jit(inf.apply)(qp, x)

    np.testing.assert_allclose(np.asarray(out_xla[..., 4:]),
                               np.asarray(out_pal[..., 4:]), atol=2e-2)
    np.testing.assert_allclose(np.asarray(out_xla[..., :4]),
                               np.asarray(out_pal[..., :4]), atol=0.5)


def test_int8_intermediates_debug_view():
    """apply(..., intermediates=True) returns identical preds plus a
    per-node fp32 view for every conv/shortcut edge; pallas-vs-int views
    agree to a few quant levels (the bisect tool's contract,
    tools/bisect_int8_layers.py)."""
    net = DetectionNetwork.from_cfg(_mobile_style_cfg(), quant=True)
    params, state = net.init(jax.random.PRNGKey(3))
    params, state = prepare_qat_state(net, params, state)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1)
    for _ in range(2):
        ctx = QuantCtx(state['quant'], observing=True)
        net.apply(params, state, x, quant_ctx=ctx)
        state = {**state, 'quant': ctx.new_obs}
    qparams = convert_to_int8(net, params, state)

    views = {}
    for mode in ('pallas', 'int'):
        inf = Int8Inference(net, mode=mode)
        qp = Int8Inference.prepare(qparams, mode=mode, network=net)
        plain = jax.jit(inf.apply)(qp, x)
        preds, inter = jax.jit(
            functools.partial(inf.apply, intermediates=True))(qp, x)
        np.testing.assert_array_equal(np.asarray(preds), np.asarray(plain))
        views[mode] = inter

    conv_keys = {str(n.index) for n in net.graph.nodes
                 if n.kind == 'convolutional'}
    assert conv_keys <= set(views['pallas'])
    assert set(views['pallas']) == set(views['int'])
    for key in views['pallas']:
        a = np.asarray(views['pallas'][key], np.float64)
        b = np.asarray(views['int'][key], np.float64)
        assert a.shape == b.shape
        scale = max(np.abs(b).max(), 1e-6)
        assert np.abs(a - b).max() / scale < 0.35, key


def test_int8_dw_policy_s8_matches_int_executor(monkeypatch):
    """PQDET_DW_POLICY=s8 routes every depthwise layer through the native
    s8 conv impl (_s8_dw3x3); the full executor must stay at exact-integer
    parity with the 'int' reference executor (dw layers are bit-exact —
    both accumulate in s32)."""
    net = DetectionNetwork.from_cfg(_mobile_style_cfg(), quant=True)
    params, state = net.init(jax.random.PRNGKey(4))
    params, state = prepare_qat_state(net, params, state)
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1)
    for _ in range(2):
        ctx = QuantCtx(state['quant'], observing=True)
        net.apply(params, state, x, quant_ctx=ctx)
        state = {**state, 'quant': ctx.new_obs}
    qparams = convert_to_int8(net, params, state)

    monkeypatch.setenv('PQDET_DW_POLICY', 's8')
    qp = Int8Inference.prepare(qparams, network=net)
    out = jax.jit(Int8Inference(net, act=qp['act']).apply)(qp, x)
    ref = jax.jit(Int8Inference(net, mode='int').apply)(qparams, x)
    np.testing.assert_allclose(np.asarray(out[..., 4:]),
                               np.asarray(ref[..., 4:]), atol=2e-2)
    np.testing.assert_allclose(np.asarray(out[..., :4]),
                               np.asarray(ref[..., :4]), atol=0.5)
