"""Pallas decode kernel vs the jnp reference (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from pqdet_tpu.model.decode import decode as decode_reference
from pqdet_tpu.ops.pallas_decode import decode_pallas


def test_pallas_decode_matches_reference():
    rng = np.random.RandomState(0)
    for (b, h, w, a, nc, stride) in [(2, 16, 16, 3, 20, 32),
                                     (1, 8, 12, 3, 4, 16),
                                     (1, 64, 64, 3, 10, 8)]:
        raw = jnp.asarray(rng.randn(b, h, w, a * (5 + nc)).astype(np.float32))
        ref = decode_reference(raw, nc, stride)
        out = decode_pallas(raw, nc, stride, interpret=True)
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_pallas_qconv_exact_vs_int8_conv():
    """Fused Pallas 1x1 quantized conv == the XLA int8_conv oracle: fp32
    output to float error, requantised output code-for-code."""
    from pqdet_tpu.compress.quantized import int8_conv
    from pqdet_tpu.ops.pallas_qconv import qconv1x1_s8

    rng = np.random.RandomState(0)
    m, cin, cout = 640, 96, 160
    xq = rng.randint(0, 256, (1, 8, m // 8, cin)).astype(np.uint8)
    w = rng.randint(-127, 128, (1, 1, cin, cout)).astype(np.int8)
    w_scale = (rng.rand(cout) * 0.01 + 0.001).astype(np.float32)
    b = (rng.randn(cout) * 0.1).astype(np.float32)
    xs, xzp = 0.02, 7.0

    y_ref = int8_conv(jnp.asarray(xq), (xs, xzp), jnp.asarray(w),
                      jnp.asarray(w_scale), jnp.asarray(b), 1, 0, 1)
    y_ref = np.asarray(jnp.clip(y_ref, 0, 6))

    x_s8 = (xq.astype(np.int16) - 128).astype(np.int8)  # NHWC
    w2 = w.reshape(cin, cout)
    colsum = w2.astype(np.int32).sum(0)
    y = qconv1x1_s8(jnp.asarray(x_s8), jnp.asarray(w2), jnp.asarray(w_scale),
                    jnp.asarray(b), jnp.asarray(colsum), act='relu6',
                    x_scale=xs, x_zp=xzp, interpret=True)
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-5)

    os_, ozp = 6.0 / 255, 3.0
    q_ref = np.clip(np.round(y_ref / os_ + ozp), 0, 255) - 128
    q = qconv1x1_s8(jnp.asarray(x_s8), jnp.asarray(w2), jnp.asarray(w_scale),
                    jnp.asarray(b), jnp.asarray(colsum), act='relu6',
                    x_scale=xs, x_zp=xzp, out_scale=os_, out_zp=ozp,
                    interpret=True)
    np.testing.assert_array_equal(np.asarray(q).astype(np.int32), q_ref)


def test_pallas_qdwconv_exact_vs_int8_conv():
    """Fused Pallas depthwise 3x3 == the XLA int8_conv oracle (stride 1 and
    2, including the zero-point border padding and edge-row masking)."""
    from pqdet_tpu.compress.quantized import int8_conv
    from pqdet_tpu.ops.pallas_qconv import qdwconv3x3_s8

    rng = np.random.RandomState(2)
    for stride, h, w, c in [(1, 16, 24, 32), (2, 16, 24, 32), (1, 8, 8, 8)]:
        xq = rng.randint(0, 256, (2, h, w, c)).astype(np.uint8)
        wq = rng.randint(-127, 128, (3, 3, 1, c)).astype(np.int8)
        w_scale = (rng.rand(c) * 0.01 + 0.001).astype(np.float32)
        b = (rng.randn(c) * 0.1).astype(np.float32)
        xs, xzp = 0.03, 11.0

        y_ref = int8_conv(jnp.asarray(xq), (xs, xzp), jnp.asarray(wq),
                          jnp.asarray(w_scale), jnp.asarray(b),
                          stride, 1, c)
        y_ref = np.asarray(jnp.maximum(y_ref, 0))

        x_s8 = jnp.asarray((xq.astype(np.int16) - 128).astype(np.int8))
        y = qdwconv3x3_s8(x_s8, jnp.asarray(wq.reshape(3, 3, c)),
                          jnp.asarray(w_scale), jnp.asarray(b),
                          act='relu', stride=stride, x_scale=xs, x_zp=xzp,
                          interpret=True)
        assert y.shape == y_ref.shape, (y.shape, y_ref.shape)
        np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-4,
                                   err_msg=f'stride={stride}')

        os_, ozp = float(y_ref.max()) / 255, 2.0
        q_ref = np.clip(np.round(y_ref / os_ + ozp), 0, 255) - 128
        q = qdwconv3x3_s8(x_s8, jnp.asarray(wq.reshape(3, 3, c)),
                          jnp.asarray(w_scale), jnp.asarray(b),
                          act='relu', stride=stride, x_scale=xs, x_zp=xzp,
                          out_scale=os_, out_zp=ozp, interpret=True)
        # y * (1/os) in f32 vs y / os in f64 can flip round-to-even ties by
        # one code on a handful of elements; that is inherent to requant
        diff = np.abs(np.asarray(q).astype(np.int32) - q_ref)
        assert diff.max() <= 1 and (diff > 0).mean() < 1e-3, \
            f'stride={stride}: {int((diff > 0).sum())} mismatches'


def test_pallas_decode_odd_height_falls_back():
    rng = np.random.RandomState(1)
    raw = jnp.asarray(rng.randn(1, 7, 8, 27).astype(np.float32))
    out = decode_pallas(raw, 4, 8, interpret=True)  # 7 % 8 -> reference path
    ref = decode_reference(raw, 4, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)


def test_qdwconv_multiprogram_halo_rows():
    """Force th < H so the grid has several programs and halo rows cross
    program boundaries (and image borders) — vs the XLA int8_conv oracle."""
    from pqdet_tpu.compress.quantized import int8_conv
    from pqdet_tpu.ops.pallas_qconv import qdwconv3x3_s8

    rng = np.random.RandomState(3)
    c = 512  # f32 window row (w+2)*c*4 > the 1MB budget -> th=1, grid of
    # 16 H-programs at stride 1 (8 at stride 2): halo rows cross every
    # program boundary
    xq = rng.randint(0, 256, (1, 16, 256, c)).astype(np.uint8)
    w = rng.randint(-127, 128, (3, 3, 1, c)).astype(np.int8)
    w_scale = (rng.rand(c) * 0.01 + 0.001).astype(np.float32)
    b = (rng.randn(c) * 0.1).astype(np.float32)
    xs, xzp = 0.02, 117.0

    for stride in (1, 2):
        y_ref = int8_conv(jnp.asarray(xq), (xs, xzp), jnp.asarray(w),
                          jnp.asarray(w_scale), jnp.asarray(b), stride, 1, c)
        y_ref = np.asarray(jnp.maximum(y_ref, 0.0))
        y = qdwconv3x3_s8(jnp.asarray((xq.astype(np.int16) - 128)
                                      .astype(np.int8)),
                          jnp.asarray(w.reshape(3, 3, c)),
                          jnp.asarray(w_scale), jnp.asarray(b), act='relu',
                          stride=stride, x_scale=xs, x_zp=xzp,
                          interpret=True)
        assert y.shape == y_ref.shape
        np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-4,
                                   rtol=1e-5)


def test_xla_dw3x3_vs_int8_conv_oracle():
    """The dw_impl='xla' serving path (9 unrolled tap-slice FMAs) must match
    the XLA int8_conv oracle exactly for both strides, with and without the
    output requant edge."""
    from pqdet_tpu.compress.quantized import _quant_s8, _xla_dw3x3, int8_conv

    rng = np.random.RandomState(11)
    c = 24  # odd lane count vs the 128-lane registers
    xq = rng.randint(0, 256, (2, 18, 22, c)).astype(np.uint8)
    w = rng.randint(-127, 128, (3, 3, 1, c)).astype(np.int8)
    w_scale = (rng.rand(c) * 0.01 + 0.001).astype(np.float32)
    b = (rng.randn(c) * 0.1).astype(np.float32)
    xs, xzp = 0.02, 117.0
    out_edge = (0.04, 7.0)
    x_s8 = jnp.asarray((xq.astype(np.int16) - 128).astype(np.int8))
    pad_val = np.int8(round(xzp) - 128)

    for stride in (1, 2):
        y_ref = int8_conv(jnp.asarray(xq), (xs, xzp), jnp.asarray(w),
                          jnp.asarray(w_scale), jnp.asarray(b), stride, 1, c)
        y_ref = np.asarray(jnp.where(y_ref > 0, y_ref, 0.1 * y_ref))
        y = _xla_dw3x3(x_s8, jnp.asarray(w.reshape(3, 3, c)),
                       jnp.asarray(w_scale), jnp.asarray(b), stride,
                       (xs, xzp), None, 'leaky', pad_val)
        assert y.shape == y_ref.shape
        np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-4, rtol=1e-5)

        q = _xla_dw3x3(x_s8, jnp.asarray(w.reshape(3, 3, c)),
                       jnp.asarray(w_scale), jnp.asarray(b), stride,
                       (xs, xzp), out_edge, 'leaky', pad_val)
        q_ref = np.asarray(_quant_s8(jnp.asarray(y_ref), out_edge))
        np.testing.assert_array_equal(np.asarray(q), q_ref)



def test_native_dw3x3_vs_int8_conv_oracle():
    """The dw_impl='native' path (exact-integer-valued bf16 lax.conv: s8
    values are exact in bf16, accumulation is f32) must match the int8_conv
    oracle exactly for both strides, with and without the requant edge."""
    from pqdet_tpu.compress.quantized import (_native_dw3x3, _quant_s8,
                                              int8_conv)

    rng = np.random.RandomState(13)
    c = 40
    xq = rng.randint(0, 256, (2, 18, 22, c)).astype(np.uint8)
    w = rng.randint(-127, 128, (3, 3, 1, c)).astype(np.int8)
    w_scale = (rng.rand(c) * 0.01 + 0.001).astype(np.float32)
    b = (rng.randn(c) * 0.1).astype(np.float32)
    xs, xzp = 0.02, 117.0
    out_edge = (0.04, 7.0)
    x_s8 = jnp.asarray((xq.astype(np.int16) - 128).astype(np.int8))
    pad_val = np.int8(round(xzp) - 128)

    for stride in (1, 2):
        y_ref = int8_conv(jnp.asarray(xq), (xs, xzp), jnp.asarray(w),
                          jnp.asarray(w_scale), jnp.asarray(b), stride, 1, c)
        y_ref = np.asarray(jnp.where(y_ref > 0, y_ref, 0.1 * y_ref))
        y = _native_dw3x3(x_s8, jnp.asarray(w.reshape(3, 3, c)),
                          jnp.asarray(w_scale), jnp.asarray(b), stride,
                          (xs, xzp), None, 'leaky', pad_val)
        assert y.shape == y_ref.shape
        np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-4,
                                   rtol=1e-5)
        q = _native_dw3x3(x_s8, jnp.asarray(w.reshape(3, 3, c)),
                          jnp.asarray(w_scale), jnp.asarray(b), stride,
                          (xs, xzp), out_edge, 'leaky', pad_val)
        q_ref = np.asarray(_quant_s8(jnp.asarray(y_ref), out_edge))
        np.testing.assert_array_equal(np.asarray(q), q_ref)


def test_s8_dw3x3_vs_int8_conv_oracle():
    """The dw_impl='s8' path (native s8 x s8 -> s32 depthwise conv, no
    bf16 anywhere) must match the int8_conv oracle exactly for both
    strides, with and without the requant edge. This is the hardware
    fallback for the _native_dw3x3 TPU lowering fault (bisected on the
    pruned clutter graph, round 3)."""
    from pqdet_tpu.compress.quantized import _quant_s8, _s8_dw3x3, int8_conv

    rng = np.random.RandomState(17)
    c = 80  # the first divergent hardware layer's channel count
    xq = rng.randint(0, 256, (2, 18, 22, c)).astype(np.uint8)
    w = rng.randint(-127, 128, (3, 3, 1, c)).astype(np.int8)
    w_scale = (rng.rand(c) * 0.01 + 0.001).astype(np.float32)
    b = (rng.randn(c) * 0.1).astype(np.float32)
    xs, xzp = 0.02, 117.0
    out_edge = (0.04, 7.0)
    x_s8 = jnp.asarray((xq.astype(np.int16) - 128).astype(np.int8))
    pad_val = np.int8(round(xzp) - 128)

    for stride in (1, 2):
        y_ref = int8_conv(jnp.asarray(xq), (xs, xzp), jnp.asarray(w),
                          jnp.asarray(w_scale), jnp.asarray(b), stride, 1, c)
        y_ref = np.asarray(jnp.where(y_ref > 0, y_ref, 0.1 * y_ref))
        y = _s8_dw3x3(x_s8, jnp.asarray(w.reshape(3, 3, c)),
                      jnp.asarray(w_scale), jnp.asarray(b), stride,
                      (xs, xzp), None, 'leaky', pad_val)
        assert y.shape == y_ref.shape
        np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-4,
                                   rtol=1e-5)

        q = _s8_dw3x3(x_s8, jnp.asarray(w.reshape(3, 3, c)),
                      jnp.asarray(w_scale), jnp.asarray(b), stride,
                      (xs, xzp), out_edge, 'leaky', pad_val)
        q_ref = np.asarray(_quant_s8(jnp.asarray(y_ref), out_edge))
        np.testing.assert_array_equal(np.asarray(q), q_ref)
