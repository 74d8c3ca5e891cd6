"""Fused bf16 inverted-residual Pallas kernel vs the XLA layer-chain
oracle (interpret mode on CPU; the hardware A/B lives in
tools/microbench_fused.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pqdet_tpu.ops.pallas_fused import (fused_ir_conv, fused_ir_reference,
                                        pad_fused_weights)


def _block(rng, cin, e, cout):
    we = rng.randn(1, 1, cin, e).astype(np.float32) * 0.2
    be = rng.randn(e).astype(np.float32) * 0.1
    wdw = rng.randn(3, 3, 1, e).astype(np.float32) * 0.2
    bdw = rng.randn(e).astype(np.float32) * 0.1
    wp = rng.randn(1, 1, e, cout).astype(np.float32) * 0.2
    bp = rng.randn(cout).astype(np.float32) * 0.1
    return we, be, wdw, bdw, wp, bp


@pytest.mark.parametrize('cin,e,cout,h,w', [
    (32, 192, 32, 16, 16),     # 6x expand, one ragged-pad chunk (192->256)
    (24, 144, 24, 8, 24),      # non-128-multiple everything
    (16, 128, 48, 12, 8),      # exact one chunk
])
def test_fused_ir_matches_xla_chain(cin, e, cout, h, w):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, h, w, cin).astype(np.float32))
    we, be, wdw, bdw, wp, bp = _block(rng, cin, e, cout)

    ref = fused_ir_reference(x, we, be, wdw, bdw, wp, bp)

    wep, bep, wdw9, bdwp, wpp, bpp, co = pad_fused_weights(
        we, be, wdw, bdw, wp, bp)
    out = fused_ir_conv(x.astype(jnp.bfloat16), jnp.asarray(wep),
                        jnp.asarray(bep), jnp.asarray(wdw9),
                        jnp.asarray(bdwp), jnp.asarray(wpp),
                        jnp.asarray(bpp), interpret=True)
    assert co == cout
    out = out[..., :cout]
    assert out.shape == ref.shape
    r = np.asarray(ref, np.float32)
    o = np.asarray(out, np.float32)
    # bf16 path vs bf16 path; ordering differences only (chunked K accum)
    tol = 0.02 * max(1.0, np.abs(r).max())
    np.testing.assert_allclose(o, r, atol=tol)
    assert np.median(np.abs(o - r)) < tol / 4


def test_fused_pair_no_expand():
    """Bare dw3x3 + pw1x1 pair (E == Cin == one lane tile)."""
    rng = np.random.RandomState(1)
    e, cout, h, w = 128, 64, 8, 8
    x = jnp.asarray(rng.randn(1, h, w, e).astype(np.float32))
    _, _, wdw, bdw, wp, bp = _block(rng, e, e, cout)

    ref = fused_ir_reference(x, None, None, wdw, bdw, wp, bp)
    _, _, wdw9, bdwp, wpp, bpp, co = pad_fused_weights(
        None, None, wdw, bdw, wp, bp)
    out = fused_ir_conv(x.astype(jnp.bfloat16), None, None,
                        jnp.asarray(wdw9), jnp.asarray(bdwp),
                        jnp.asarray(wpp), jnp.asarray(bpp),
                        interpret=True)[..., :cout]
    r = np.asarray(ref, np.float32)
    o = np.asarray(out, np.float32)
    tol = 0.02 * max(1.0, np.abs(r).max())
    np.testing.assert_allclose(o, r, atol=tol)


def test_fused_ir_border_zero_pad_semantics():
    """The dw zero pad applies in the dw INPUT domain (after expand+act):
    a biased expand of border pixels must NOT leak into the pad ring.
    Checked by comparing against the oracle on a tiny case with large
    biases where getting the pad wrong shifts borders by O(bias)."""
    rng = np.random.RandomState(2)
    cin, e, cout, h, w = 16, 128, 16, 8, 8
    x = jnp.asarray(rng.randn(1, h, w, cin).astype(np.float32))
    we, be, wdw, bdw, wp, bp = _block(rng, cin, e, cout)
    be = be + 3.0  # relu6(expand(0)) would be ~3, not 0

    ref = fused_ir_reference(x, we, be, wdw, bdw, wp, bp)
    wep, bep, wdw9, bdwp, wpp, bpp, _ = pad_fused_weights(
        we, be, wdw, bdw, wp, bp)
    out = fused_ir_conv(x.astype(jnp.bfloat16), jnp.asarray(wep),
                        jnp.asarray(bep), jnp.asarray(wdw9),
                        jnp.asarray(bdwp), jnp.asarray(wpp),
                        jnp.asarray(bpp), interpret=True)[..., :cout]
    r = np.asarray(ref, np.float32)
    o = np.asarray(out, np.float32)
    tol = 0.02 * max(1.0, np.abs(r).max())
    np.testing.assert_allclose(o, r, atol=tol)


def test_full_network_fused_walk_parity():
    """Whole mobilenetv2-fpn forward with the fused-walk table (interpret
    kernels) vs the plain layer walk on the same BN-fused params."""
    from pqdet_tpu.model.network import DetectionNetwork, fuse_params
    from pqdet_tpu.ops.pallas_fused import find_fused_triples, prepare_fused_ir
    from pqdet_tpu.zoo import get_cfg

    net = DetectionNetwork.from_cfg(get_cfg('mobilenetv2-fpn'))
    params, state = net.init(jax.random.PRNGKey(0))
    fused = fuse_params(net, params, state)
    table = prepare_fused_ir(net, fused, interpret=True)
    assert len(table) >= 12, f'only {len(table)} fused blocks'

    x = jnp.asarray(np.random.RandomState(0)
                    .rand(1, 64, 64, 3).astype(np.float32))
    ref, _ = net.apply(fused, {}, x, compute_dtype=jnp.bfloat16)
    out, _ = net.apply(fused, {}, x, compute_dtype=jnp.bfloat16,
                       fused_ir=table)
    r = np.asarray(ref, np.float32)
    o = np.asarray(out, np.float32)
    assert o.shape == r.shape
    # scores (sigmoid'd) tight; boxes scale with stride
    np.testing.assert_allclose(o[..., 4:], r[..., 4:], atol=0.03)
    np.testing.assert_allclose(o[..., :4], r[..., :4], atol=1.5)
