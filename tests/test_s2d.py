"""Space-to-depth stem ingest: fold parity + full-network equivalence
(ops/space_to_depth.py, the round-5 layout project)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pqdet_tpu.ops.space_to_depth import (fold_stem_weight,
                                          fold_stem_weight_j,
                                          space_to_depth)


def _ref_conv(x, w, stride, padding):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((padding, padding), (padding, padding)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


@pytest.mark.parametrize('hw,k,stride,pad', [
    (16, 3, 2, 1),   # the zoo stem shape (3x3 s2 p1)
    (16, 2, 2, 0),   # even kernel, valid padding
])
def test_fold_parity(hw, k, stride, pad):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, hw, hw, 3), jnp.float32)
    w = jnp.asarray(rng.randn(k, k, 3, 8), jnp.float32)
    ref = _ref_conv(x, w, stride, pad)
    wf, (plo, phi), (qlo, qhi) = fold_stem_weight(np.asarray(w), stride,
                                                  stride, pad)
    out = jax.lax.conv_general_dilated(
        space_to_depth(x, stride), jnp.asarray(wf), (1, 1),
        ((plo, phi), (qlo, qhi)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # jnp fold emits the identical kernel
    wfj, phj, pwj = fold_stem_weight_j(w, stride, stride, pad)
    np.testing.assert_array_equal(np.asarray(wfj), wf)
    assert phj == (plo, phi) and pwj == (qlo, qhi)


def test_network_s2d_stem_equivalence():
    """Full mobilenetv2-fpn forward with s2d_stem == plain forward."""
    from pqdet_tpu.model.network import DetectionNetwork, fuse_params
    from pqdet_tpu.zoo import get_cfg

    net = DetectionNetwork.from_cfg(get_cfg('mobilenetv2-fpn'))
    params, state = net.init(jax.random.PRNGKey(0))
    fused = fuse_params(net, params, state)
    x = jnp.asarray(np.random.RandomState(1).rand(1, 64, 64, 3),
                    jnp.float32)
    ref, _ = jax.jit(lambda p, x: net.apply(p, {}, x))(fused, x)
    out, _ = jax.jit(lambda p, x: net.apply(p, {}, x, s2d_stem=2))(fused, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_network_s2d_stem_train_grads_match():
    """Gradient of the loss w.r.t. the ORIGINAL stem kernel is unchanged
    by the fold (the scatter is linear) — training with s2d_stem is
    function-preserving like dense_groups."""
    from pqdet_tpu.model.network import DetectionNetwork
    from pqdet_tpu.zoo import get_cfg

    net = DetectionNetwork.from_cfg(get_cfg('mobilenetv2-fpn'))
    params, state = net.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(1).rand(2, 64, 64, 3),
                    jnp.float32)

    def loss(p, s2d):
        preds, _ = net.apply(p, state, x, train=False, s2d_stem=s2d)
        return jnp.sum(preds.astype(jnp.float32) ** 2) * 1e-6

    g_ref = jax.grad(lambda p: loss(p, 0))(params)['0']['w']
    g_s2d = jax.grad(lambda p: loss(p, 2))(params)['0']['w']
    np.testing.assert_allclose(np.asarray(g_s2d), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-6)
