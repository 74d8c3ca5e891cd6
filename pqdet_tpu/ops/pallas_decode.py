"""Pallas TPU kernel: fused YOLO head decode.

Fuses the whole per-head decode — reshape to (..., A, 5+C), exp on the box
offsets, grid-center add/sub, stride scale, sigmoid on conf/class — into a
single VMEM pass per grid-row block, instead of the XLA elementwise chain
with HBM round-trips between the 3 heads. Falls back to the jnp reference
implementation (model/decode.py) off-TPU.

Layout: the head output (B, H, W, A*(5+C)) is processed with a grid over
(B, H-blocks); each kernel instance decodes a (BLOCK_H, W, C_raw) tile.
The channel axis stays last (lane dimension); box/conf/class channels are
selected with static slices per anchor.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pqdet_tpu.model.decode import decode as decode_reference


def _decode_kernel(conv_ref, out_ref, *, num_classes: int, stride: int,
                   anchors: int, block_h: int):
    """conv_ref: (block_h, W, A*(5+C)); out_ref: (block_h, W, A*(5+C))."""
    h_idx = pl.program_id(1)
    w = conv_ref.shape[2]
    ch = 5 + num_classes

    x = conv_ref[:][0].astype(jnp.float32)  # (block_h, W, A*(5+C))
    # grid centers for this tile (tpu.iota is integer-only; cast after)
    ys = (jax.lax.broadcasted_iota(jnp.int32, (block_h, w), 0)
          .astype(jnp.float32) + (h_idx * block_h).astype(jnp.float32) + 0.5)
    xs = jax.lax.broadcasted_iota(jnp.int32, (block_h, w), 1) \
        .astype(jnp.float32) + 0.5

    outs = []
    for a in range(anchors):
        base = a * ch
        dx1 = x[:, :, base + 0]
        dy1 = x[:, :, base + 1]
        dx2 = x[:, :, base + 2]
        dy2 = x[:, :, base + 3]
        xmin = (xs - jnp.exp(dx1)) * stride
        ymin = (ys - jnp.exp(dy1)) * stride
        xmax = (xs + jnp.exp(dx2)) * stride
        ymax = (ys + jnp.exp(dy2)) * stride
        scores = jax.nn.sigmoid(x[:, :, base + 4:base + ch])
        outs.append(jnp.concatenate([
            xmin[..., None], ymin[..., None], xmax[..., None], ymax[..., None],
            scores], axis=-1))
    out_ref[:] = jnp.concatenate(outs, axis=-1)[None]


def decode_pallas(conv: jnp.ndarray, num_classes: int, stride: int,
                  block_h: int = 8, interpret: bool = False) -> jnp.ndarray:
    """(B, H, W, A*(5+C)) raw head -> (B, H, W, A, 5+C) decoded."""
    b, h, w, ch_total = conv.shape
    ch = 5 + num_classes
    anchors = ch_total // ch
    block_h = min(block_h, h)
    if h % block_h != 0:
        return decode_reference(conv, num_classes, stride)

    kernel = functools.partial(
        _decode_kernel, num_classes=num_classes, stride=stride,
        anchors=anchors, block_h=block_h)
    out = pl.pallas_call(
        kernel,
        grid=(b, h // block_h),
        in_specs=[pl.BlockSpec((1, block_h, w, ch_total),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, block_h, w, ch_total),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, ch_total), jnp.float32),
        interpret=interpret,
    )(conv)
    return out.reshape(b, h, w, anchors, ch)


def decode_auto(conv: jnp.ndarray, num_classes: int, stride: int) -> jnp.ndarray:
    """Pallas on TPU, jnp reference elsewhere."""
    if jax.default_backend() == 'tpu':
        try:
            return decode_pallas(conv, num_classes, stride)
        except Exception:
            pass
    return decode_reference(conv, num_classes, stride)
