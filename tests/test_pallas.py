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


def test_pallas_decode_odd_height_falls_back():
    rng = np.random.RandomState(1)
    raw = jnp.asarray(rng.randn(1, 7, 8, 27).astype(np.float32))
    out = decode_pallas(raw, 4, 8, interpret=True)  # 7 % 8 -> reference path
    ref = decode_reference(raw, 4, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)
