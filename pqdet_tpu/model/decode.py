"""YOLO head decode as a pure function.

The reference Decode module (model/parser.py:194-235) caches a center grid
and respawns it when the input grows; under jit every spatial shape traces
once, so the grid here is simply built inline from static shapes — XLA
constant-folds it. Input is NHWC (no permute needed, unlike the reference's
NCHW->NHWC), raw head output of C = A*(5+num_classes) channels.

Decode math (parity with model/parser.py:206-235):
    xymin = (grid_center - exp(raw[..., 0:2])) * stride
    xymax = (grid_center + exp(raw[..., 2:4])) * stride
    conf  = sigmoid(raw[..., 4:5])
    prob  = sigmoid(raw[..., 5:])
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def center_grid(height: int, width: int, dtype=jnp.float32):
    """(H, W, 1, 2) grid of cell centers; [..., 0] is x (column), [..., 1] is
    y (row), matching build_center_grid (model/parser.py:185-192)."""
    ys = jax.lax.broadcasted_iota(dtype, (height, width), 0) + 0.5
    xs = jax.lax.broadcasted_iota(dtype, (height, width), 1) + 0.5
    return jnp.stack([xs, ys], axis=-1)[:, :, None, :]


def decode(conv: jnp.ndarray, num_classes: int, stride: int,
           exp_cap: float = 0.0) -> jnp.ndarray:
    """(B, H, W, A*(5+C)) raw head -> (B, H, W, A, 5+C) decoded boxes.

    ``exp_cap`` > 0 clamps the raw box offsets at that value before the
    exp — a candidate-survival knob for NAS short-trains (round-4 sweep:
    deep sampled heads push raw offsets past exp's f32 overflow near
    step ~88 and the forward goes inf before grad-clip can act; a cap of
    e.g. 40 keeps boxes finite so the loss gradient pulls them back).
    0 (the default everywhere but NAS-emitted cfgs) is exact reference
    parity (model/parser.py:206-235 uses a bare exp)."""
    b, h, w, ch = conv.shape
    a = ch // (5 + num_classes)
    conv = conv.reshape(b, h, w, a, 5 + num_classes).astype(jnp.float32)
    grid = center_grid(h, w)
    raw_d1 = conv[..., 0:2]
    raw_d2 = conv[..., 2:4]
    if exp_cap:
        raw_d1 = jnp.minimum(raw_d1, exp_cap)
        raw_d2 = jnp.minimum(raw_d2, exp_cap)
    xymin = (grid - jnp.exp(raw_d1)) * stride
    xymax = (grid + jnp.exp(raw_d2)) * stride
    conf = jax.nn.sigmoid(conv[..., 4:5])
    prob = jax.nn.sigmoid(conv[..., 5:])
    return jnp.concatenate([xymin, xymax, conf, prob], axis=-1)
