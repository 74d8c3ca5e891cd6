"""Layer numerics vs torch oracles (torch CPU is a test-only dependency)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from pqdet_tpu.model import layers as L


def _rand(*shape, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(*shape).astype(np.float32)


@pytest.mark.parametrize('groups,stride,size,padding', [
    (1, 1, 3, 1), (1, 2, 3, 1), (4, 1, 3, 1), (8, 2, 3, 1), (1, 1, 1, 0),
])
def test_conv2d_vs_torch(groups, stride, size, padding):
    n, h, w, cin, cout = 2, 8, 8, 8, 16
    x = _rand(n, h, w, cin)
    wt = _rand(size, size, cin // groups, cout, seed=1)  # HWIO
    b = _rand(cout, seed=2)
    out = L.conv2d(jnp.array(x), jnp.array(wt), jnp.array(b),
                   stride=stride, padding=padding, groups=groups)
    # torch: NCHW, OIHW
    tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
    tw = torch.from_numpy(wt.transpose(3, 2, 0, 1))
    ref = F.conv2d(tx, tw, torch.from_numpy(b), stride=stride,
                   padding=padding, groups=groups)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_batch_norm_train_and_eval_vs_torch():
    n, h, w, c = 4, 6, 6, 8
    x = _rand(n, h, w, c)
    params, state = L.init_bn(c)
    gamma = _rand(c, seed=3) + 1.0
    beta = _rand(c, seed=4)
    params = {'gamma': jnp.array(gamma), 'beta': jnp.array(beta)}

    bn = torch.nn.BatchNorm2d(c)
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(gamma))
        bn.bias.copy_(torch.from_numpy(beta))
    tx = torch.from_numpy(x.transpose(0, 3, 1, 2))

    # train step
    bn.train()
    ref = bn(tx).permute(0, 2, 3, 1).detach().numpy()
    y, new_state = L.batch_norm(jnp.array(x), params, state, train=True)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(new_state['mean']),
                               bn.running_mean.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state['var']),
                               bn.running_var.numpy(), rtol=1e-4, atol=1e-5)

    # eval step with updated stats
    bn.eval()
    ref = bn(tx).permute(0, 2, 3, 1).detach().numpy()
    y, _ = L.batch_norm(jnp.array(x), params, new_state, train=False)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4, atol=1e-4)


def test_batch_norm_one_pass_offset_stability():
    """Worst case for the one-pass E[d^2]-E[d]^2 variance: activations with
    a large mean offset and tiny spread (mean^2/var up to ~4e11), where an
    uncentered one-pass loses ALL the variance to f32 cancellation. The
    subsample-estimated shift must keep the moments accurate from a fresh
    state — no warm running mean to lean on."""
    n, h, w, c = 8, 16, 16, 4
    rng = np.random.RandomState(0)
    offs = np.array([100.0, -250.0, 1000.0, 0.0], np.float32)
    x = (rng.randn(n, h, w, c).astype(np.float32) * 0.05 + offs)

    params, state = L.init_bn(c)
    y, new_state = L.batch_norm(jnp.array(x), params, state, train=True)

    mean = x.reshape(-1, c).mean(0)
    var = x.reshape(-1, c).var(0)
    unbiased = var * (n * h * w / (n * h * w - 1))
    # undo momentum 0.1 against the fresh state (mean 0, var 1)
    cold_mean = np.asarray(new_state['mean']) / 0.1
    cold_var = (np.asarray(new_state['var']) - 0.9 * 1.0) / 0.1
    np.testing.assert_allclose(cold_mean, mean, rtol=1e-4)
    np.testing.assert_allclose(cold_var, unbiased, rtol=1e-2)
    # normalized output: zero mean, unit std per channel
    ym = np.asarray(y).reshape(-1, c)
    np.testing.assert_allclose(ym.mean(0), 0.0, atol=1e-2)
    np.testing.assert_allclose(ym.std(0), 1.0, rtol=2e-2)


def test_fold_bn_matches_separate():
    n, h, w, cin, cout = 2, 5, 5, 4, 8
    x = _rand(n, h, w, cin)
    conv = {'w': jnp.array(_rand(3, 3, cin, cout, seed=5))}
    bn_params = {'gamma': jnp.array(_rand(cout, seed=6) + 1.5),
                 'beta': jnp.array(_rand(cout, seed=7))}
    bn_state = {'mean': jnp.array(_rand(cout, seed=8)),
                'var': jnp.array(np.abs(_rand(cout, seed=9)) + 0.5)}
    y1 = L.conv2d(jnp.array(x), conv['w'], None, padding=1)
    y1, _ = L.batch_norm(y1, bn_params, bn_state, train=False)
    fused = L.fold_bn_into_conv(conv, bn_params, bn_state)
    y2 = L.conv2d(jnp.array(x), fused['w'], fused['b'], padding=1)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-4, atol=1e-4)


def test_max_pool_vs_torch():
    x = _rand(2, 8, 8, 4)
    for size, stride, pad in [(2, 2, 0), (3, 1, 1), (3, 2, 1)]:
        out = L.max_pool(jnp.array(x), size, stride, pad)
        ref = F.max_pool2d(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                           size, stride, pad).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6, atol=1e-6)


def test_adaptive_avg_pool_vs_torch():
    x = _rand(2, 7, 9, 4)
    for out_hw in [(1, 1), (2, 3)]:
        out = L.adaptive_avg_pool(jnp.array(x), *out_hw)
        ref = F.adaptive_avg_pool2d(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                                    out_hw).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-6)


def test_upsample_nearest_vs_torch():
    x = _rand(2, 4, 5, 3)
    out = L.upsample_nearest(jnp.array(x), 2)
    ref = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                        scale_factor=2, mode='nearest').permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6, atol=1e-6)


def test_activations_vs_torch():
    x = _rand(64) * 4
    tx = torch.from_numpy(x)
    cases = {
        'logistic': torch.sigmoid(tx),
        'leaky': F.leaky_relu(tx, 0.1),
        'relu': F.relu(tx),
        'relu6': F.relu6(tx),
        'tanh': torch.tanh(tx),
    }
    for name, ref in cases.items():
        out = L.apply_activation(name, jnp.array(x))
        np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-5, atol=1e-6)


def test_densify_grouped_convs_preserves_function():
    """Block-diagonal dense expansion of grouped convs computes the exact
    same function (regnety-style group widths), and conv2d auto-detects the
    dense weight shape."""
    import jax
    from pqdet_tpu.model.network import DetectionNetwork, densify_grouped_convs, fuse_params
    from pqdet_tpu.zoo.builder import CfgBuilder

    nc = 3
    b = CfgBuilder()
    b.conv(16, size=3, stride=2, activation='relu')
    b.conv(32, size=3, stride=2, groups=4, activation='relu')   # group width 8
    b.conv(32, size=3, groups=32, activation='relu')            # depthwise (kept)
    b.conv(48, size=3, groups=8, activation='relu')             # group width 4
    b.conv(3 * (5 + nc), size=1, bn=False, activation='linear')
    b.yolo(nc)
    net = DetectionNetwork.from_cfg(b.text())
    params, state = net.init(jax.random.PRNGKey(0))
    fused = fuse_params(net, params, state)
    dense = densify_grouped_convs(net, fused)

    # depthwise stays grouped; grouped convs expand to full Cin
    assert dense['2']['w'].shape == fused['2']['w'].shape   # dw untouched
    assert dense['1']['w'].shape[2] == 16 and fused['1']['w'].shape[2] == 4
    assert dense['3']['w'].shape[2] == 32 and fused['3']['w'].shape[2] != 32

    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3), jnp.float32)
    ref, _ = net.apply(fused, {}, x)
    out, _ = net.apply(dense, {}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_train_time_dense_groups_function_and_grad_parity():
    """conv2d's trace-time block-diagonal expansion of compact grouped
    weights (dense_groups=True, the training path for RegNets) matches the
    feature_group_count conv exactly — forward AND weight/input gradients
    (the eye-mask expansion contracts the dense grad back onto the blocks)."""
    import jax
    from pqdet_tpu.model.layers import conv2d, densify_grouped_weight

    rng = np.random.RandomState(7)
    groups, cin, cout = 4, 24, 40
    w = jnp.asarray(rng.randn(3, 3, cin // groups, cout) * 0.1, jnp.float32)
    x = jnp.asarray(rng.randn(2, 14, 14, cin), jnp.float32)

    dense_w = densify_grouped_weight(w, groups)
    assert dense_w.shape == (3, 3, cin, cout)

    def f_grouped(w_, x_):
        y = conv2d(x_, w_, stride=1, padding=1, groups=groups,
                   dense_groups=False)
        return jnp.sum(jnp.tanh(y)), y

    def f_dense(w_, x_):
        y = conv2d(x_, w_, stride=1, padding=1, groups=groups,
                   dense_groups=True)
        return jnp.sum(jnp.tanh(y)), y

    (l0, y0), g0 = jax.value_and_grad(f_grouped, argnums=(0, 1),
                                      has_aux=True)(w, x)
    (l1, y1), g1 = jax.value_and_grad(f_dense, argnums=(0, 1),
                                      has_aux=True)(w, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-5, atol=1e-5)
    assert g1[0].shape == w.shape  # grad is in COMPACT grouped form
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g0[0]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g0[1]),
                               rtol=1e-4, atol=1e-5)

    # depthwise (group width 1) must NOT expand
    wd = jnp.asarray(rng.randn(3, 3, 1, cin) * 0.1, jnp.float32)
    yd0 = conv2d(x, wd, stride=1, padding=1, groups=cin, dense_groups=False)
    yd1 = conv2d(x, wd, stride=1, padding=1, groups=cin, dense_groups=True)
    np.testing.assert_allclose(np.asarray(yd1), np.asarray(yd0),
                               rtol=1e-6, atol=1e-6)


def test_classifier_network_forward():
    """ClassifierNetwork (reference interpreter.py:87 ClassifierModel):
    a yolo-less graph returns the LAST layer's output — here a softmax-able
    (B, classes) fc head over conv+avgpool features."""
    from pqdet_tpu.model.network import ClassifierNetwork
    cfg = """
[net]
channels=3

[convolutional]
filters=8
size=3
stride=2
pad=1
batch_normalize=1
activation=relu

[avgpool]

[fc]
input=8
output=5
activation=linear
"""
    net = ClassifierNetwork.from_cfg(cfg)
    params, state = net.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3), jnp.float32)
    logits, _ = jax.jit(net.apply)(params, state, x)
    assert logits.shape == (2, 5)
    assert bool(jnp.isfinite(logits).all())
