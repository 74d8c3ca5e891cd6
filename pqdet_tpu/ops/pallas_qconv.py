"""Pallas TPU kernels: fused int8 convolutions (quantized serving path).

The reference serves quantized models through fbgemm/qnnpack int8 GEMMs
(tools.py:291-304). The XLA translation of that graph drowns in small ops —
per-conv recentre/pad/requant fusions and layout copies were 60%+ of device
time and doubled dispatch cost (see STATUS.md round-2 notes). These kernels
collapse one quantized conv layer into a single op each:

- ``qconv1x1_s8``: pointwise conv on the MXU, s8 x s8 -> s32, with the
  dequant affine, bias, activation and output requantisation fused in the
  epilogue (57 of 84 convs in mobilenetv2-fpn, most of the MACs).
- ``qdwconv3x3_s8``: depthwise 3x3 (stride 1/2) on the VPU in f32 (exact for
  s8 operands), same fused epilogue (26 of 84 convs). Best at small batch;
  at batch >= 8 Int8Inference dispatches dw layers per shape to XLA paths
  (see compress.quantized._dw_impl — misaligned sublane tap slices force
  relayout copies at large blocks). The small-Cin stem and densified
  grouped convs run through compress.quantized._native_conv3x3 (exact-int
  bf16 lax.conv) — three Pallas stem formulations are Mosaic-blocked, see
  that docstring.

Activations use a RECENTRED signed-int8 representation (s = q_u8 - 128,
exact two's complement), so no per-layer recentre op exists anywhere; the
affine correction folds into the per-channel bias:

    y_c = alpha_c * dot(x_s8, w)_c + (alpha_c * (128 - x_zp) * colsum_c + b_c)
    alpha_c = x_scale * w_scale_c,  colsum_c = sum_i w_ic

Both kernels work on NHWC 4-D blocks directly (no reshape at the XLA level —
2-D views forced a physical retile per layer). Quantisation scales ride in
SMEM as runtime scalars: one compiled kernel per shape/activation, reused
across layers and checkpoints.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _apply_act(act: str, y):
    if act == 'leaky':
        return jnp.where(y > 0, y, 0.1 * y)
    if act == 'relu':
        return jnp.maximum(y, 0.0)
    if act == 'relu6':
        return jnp.clip(y, 0.0, 6.0)
    if act in ('linear', 'none'):
        return y
    if act == 'logistic':
        return jax.nn.sigmoid(y)
    raise ValueError(f'unsupported activation for qconv kernel: {act}')


def _epilogue(acc_f32, s_ref, ws, b, cs, act: str, requant: bool, out_ref):
    """Shared affine + activation + (re)quantisation epilogue.

    acc_f32: integer accumulator as f32; ws/b/cs broadcastable per-channel
    weight scale, bias, column sum. s_ref: SMEM scalars (see kernels).
    """
    alpha = s_ref[0, 0] * ws
    beta = alpha * ((128.0 - s_ref[0, 1]) * cs) + b
    y = _apply_act(act, acc_f32 * alpha + beta)
    if requant:
        out_ref[:] = jnp.clip(jnp.round(y * s_ref[0, 2] + s_ref[0, 3]),
                              -128, 127).astype(jnp.int8)
    else:
        out_ref[:] = y


# ------------------------------------------------------------- 1x1 (MXU)

def _qconv1x1_kernel(s_ref, x_ref, w_ref, ws_ref, b_ref, cs_ref, o_ref, *,
                     act: str, requant: bool):
    """Blocks: x (1, TH, W, Cin) s8; w (Cin, TN) s8; per-channel (1, TN)."""
    _, th, wdim, cin = x_ref.shape
    x = x_ref[:].reshape(th * wdim, cin)
    acc = jnp.dot(x, w_ref[:], preferred_element_type=jnp.int32)
    _epilogue(acc.astype(jnp.float32), s_ref, ws_ref[:], b_ref[:],
              cs_ref[:].astype(jnp.float32), act, requant,
              _ReshapedRef(o_ref))


class _ReshapedRef:
    """Write-only view: assignments land in the ref reshaped back to 4-D."""

    def __init__(self, ref):
        self.ref = ref

    def __setitem__(self, idx, value):
        assert idx == slice(None)
        self.ref[:] = value.reshape(self.ref.shape)


def _scalars(x_scale, x_zp, out_scale, out_zp, requant):
    return jnp.stack([
        jnp.float32(x_scale), jnp.float32(x_zp),
        1.0 / jnp.float32(out_scale if requant else 1.0),
        jnp.float32(out_zp if requant else 0.0) - 128.0,
    ]).reshape(1, 4)


def make_scalars(x_scale, x_zp, out_scale=None, out_zp=None):
    """Host-side (numpy) version of the SMEM scalar vector, for staging in
    Int8Inference.prepare: passing precomputed (1, 4) arrays instead of
    python floats keeps ~2 tiny constant fusions per conv layer out of the
    compiled program (80+ ops for mobilenetv2-fpn)."""
    import numpy as np
    requant = out_scale is not None
    return np.array([[
        np.float32(x_scale), np.float32(x_zp),
        np.float32(1.0 / (out_scale if requant else 1.0)),
        np.float32((out_zp if requant else 0.0) - 128.0),
    ]], np.float32)


@functools.partial(jax.jit, static_argnames=('act', 'requant', 'interpret'))
def qconv1x1_s8(x_s8: jnp.ndarray, w_s8: jnp.ndarray, w_scale: jnp.ndarray,
                b: jnp.ndarray, colsum: jnp.ndarray, *, act: str,
                x_scale=None, x_zp=None, out_scale=None, out_zp=None,
                scalars=None, requant=None,
                interpret: bool = False) -> jnp.ndarray:
    """Fused quantized 1x1 conv (stride 1, groups 1), NHWC in / NHWC out.

    x_s8: (N, H, W, Cin) int8 recentred; w_s8: (Cin, Cout) int8; w_scale/b:
    (Cout,) f32; colsum: (Cout,) int32 per-channel sum of w. With
    out_scale/out_zp the output is requantised to recentred s8; otherwise
    fp32 (edges feeding yolo heads). Scales may be floats or traced scalars,
    or a precomputed ``scalars`` (1, 4) array from make_scalars (then pass
    the static ``requant`` flag too).
    """
    n, h, w, cin = x_s8.shape
    cout = w_s8.shape[1]
    tn = min(128, cout)
    # A 1x1 conv is position-independent: merge the batch dim into rows
    # (layout-free reshape — N and H are the two major dims) so one
    # program's rows can span images and the grid never multiplies by N.
    nh = n * h
    if n > 1:
        x_s8 = x_s8.reshape(1, nh, w, cin)
    # Row-block size from a total scoped-VMEM model (16 MB hard limit on
    # v5e): double-buffered s8 input (2*cin B/pixel) + s32 accumulator and
    # ~2 fused epilogue temps (12*tn B/pixel) + s8/f32 output. Large
    # blocks matter: 512-pixel blocks put 2048 programs on one 256x256
    # bs=16 layer and per-program launch overhead dominated — measured
    # 5.4 ms total qconv1x1 vs a 1.1 ms memory roofline (round 3). A
    # plain per-tensor budget OOMed at small tn (the epilogue scales with
    # tn, the input with cin — both must be counted).
    denom = w * (2 * cin + 12 * tn + 1)
    th = max(1, min(nh, (12 << 20) // denom))
    while nh % th:
        th -= 1
    if requant is None:
        requant = out_scale is not None
    out_dtype = jnp.int8 if requant else jnp.float32

    kern = functools.partial(_qconv1x1_kernel, act=act, requant=requant)
    grid = (1, nh // th, pl.cdiv(cout, tn))
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 4), lambda ni, i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, th, w, cin), lambda ni, i, j: (ni, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, tn), lambda ni, i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda ni, i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda ni, i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda ni, i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w, tn),
                               lambda ni, i, j: (ni, i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, nh, w, cout), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * w * cin * cout,
            bytes_accessed=n * h * w * (cin + cout) + cin * cout,
            transcendentals=0),
        interpret=interpret,
    )(_scalars(x_scale, x_zp, out_scale, out_zp, requant)
      if scalars is None else scalars,
      x_s8, w_s8, w_scale.reshape(1, -1).astype(jnp.float32),
      b.reshape(1, -1).astype(jnp.float32),
      colsum.reshape(1, -1).astype(jnp.int32))
    return out.reshape(n, h, w, cout) if n > 1 else out


# -------------------------------------------------------- depthwise (VPU)

def _qdw_kernel(s_ref, x0_ref, x1_ref, x2_ref, w_ref, ws_ref, b_ref,
                o_ref, *, act: str, requant: bool, stride: int, th: int,
                h: int):
    """Depthwise 3x3. Inputs: the TB=stride*th-row body block plus ONE
    halo row each side (row-granular BlockSpecs, clamped at the borders) —
    the window is exactly the TB+2 rows the taps read, not 3 full blocks
    (which tripled both the HBM fetch and the f32 window build).
    Per-channel tensors (1, C); w (9, C) f32. f32 VPU math is exact for
    s8 operands."""
    i = pl.program_id(1)
    tb = stride * th
    c = x1_ref.shape[-1]

    # (TB+2, W+2, C) INT8 window — 4x smaller than the old f32 window, so
    # row blocks (th) are 4x taller and the per-program launch overhead
    # amortises (bs=16 ran thousands of f32-window micro-programs; measured
    # 9.3 ms total dw vs a ~2 ms VPU-flop floor). Halo rows outside the
    # image and the W pad use the recentred zero point (exact: act_qparams
    # rounds zp, so round(zp)-128 IS the fractional-free pad). Row slices
    # (outer dim) are taken on s8 and converted to f32 per kh; all
    # W-axis slicing stays in f32.
    pad_i = (jnp.round(s_ref[0, 1]).astype(jnp.int32) - 128).astype(jnp.int8)
    win = jnp.concatenate([x0_ref[0], x1_ref[0], x2_ref[0]], axis=0)
    row0 = i * tb - 1  # global row of window row 0
    gidx = jax.lax.broadcasted_iota(jnp.int32, (tb + 2, 1, 1), 0) + row0
    win = jnp.where((gidx >= 0) & (gidx < h), win, pad_i)
    win = jnp.concatenate([
        jnp.full((tb + 2, 1, c), pad_i, jnp.int8), win,
        jnp.full((tb + 2, 1, c), pad_i, jnp.int8)], axis=1)

    # output rows r in [0, th): window rows stride*r + kh. Mosaic rejects
    # strided vector slices, so stride-2 subsampling is a contiguous slice
    # + reshape-split + static index; columns split into even/odd parity
    # ONCE per kh (taps kw=0/2 read even columns, kw=1 odd).
    x_off = s_ref[0, 1] - 128.0
    wo = o_ref.shape[2]
    w1 = win.shape[1]  # padded width, even when stride == 2
    acc = jnp.zeros((th, wo, c), jnp.float32)
    for kh in range(3):
        if stride == 1:
            rows = jax.lax.slice_in_dim(win, kh, kh + th, axis=0)
            rows = rows.astype(jnp.float32)
            # one live tap temp at a time (a 3-tap list doubles peak VMEM)
            for kw in range(3):
                tap = jax.lax.slice_in_dim(rows, kw, kw + wo, axis=1)
                acc = acc + w_ref[3 * kh + kw, :] * (tap - x_off)
        else:
            rows = jax.lax.slice_in_dim(win, kh, kh + 2 * th, axis=0)
            rows = rows.reshape(th, 2, w1, c)[:, 0].astype(jnp.float32)
            par = rows.reshape(th, w1 // 2, 2, c)
            even, odd = par[:, :, 0], par[:, :, 1]
            for kw, tap in ((0, jax.lax.slice_in_dim(even, 0, wo, axis=1)),
                            (1, jax.lax.slice_in_dim(odd, 0, wo, axis=1)),
                            (2, jax.lax.slice_in_dim(even, 1, 1 + wo,
                                                     axis=1))):
                acc = acc + w_ref[3 * kh + kw, :] * (tap - x_off)
    # acc already has the (x - zp) offset folded -> colsum term must be zero
    _epilogue(acc[None], s_ref, ws_ref[:], b_ref[:],
              jnp.zeros((), jnp.float32), act, requant, o_ref)


@functools.partial(jax.jit, static_argnames=('act', 'stride', 'requant',
                                              'interpret'))
def qdwconv3x3_s8(x_s8: jnp.ndarray, w_s8: jnp.ndarray, w_scale: jnp.ndarray,
                  b: jnp.ndarray, *, act: str, stride: int,
                  x_scale=None, x_zp=None, out_scale=None, out_zp=None,
                  scalars=None, requant=None,
                  interpret: bool = False) -> jnp.ndarray:
    """Fused quantized depthwise 3x3 conv (padding 1), NHWC s8 -> NHWC s8/f32.

    x_s8: (N, H, W, C) int8 recentred; w_s8: (3, 3, C) int8 (HWC depthwise);
    w_scale/b: (C,) f32. Output spatial dims: H x W for stride 1,
    (H/2, W/2) for stride 2 — H and W must be even then (the column-parity
    subsampling needs an even padded width; Int8Inference gates on this).
    """
    n, h, w, c = x_s8.shape
    if stride == 2 and (h % 2 or w % 2):
        raise ValueError(f'stride-2 depthwise kernel needs even H/W, '
                         f'got {(h, w)}')
    ho, wo = (h + stride - 1) // stride, (w + stride - 1) // stride
    # Row-block size: the f32 accumulator (th, wo, c) and the per-kh f32
    # row temp (th, w+2, c) are the VMEM hogs now that the window itself
    # is s8 (1 B). Budget ~1 MB acc + ~1 MB s8 window; the scoped-VMEM
    # ceiling is 16 MB on v5e and real usage is several x the nominal
    # windows (double-buffered inputs + tap temps), so stay conservative.
    budget = min((1 << 20) // (4 * wo * c),            # f32 acc rows
                 (1 << 20) // (stride * (w + 2) * c))  # s8 window rows
    th = max(1, min(ho, budget))
    while ho % th:
        th -= 1
    if requant is None:
        requant = out_scale is not None
    out_dtype = jnp.int8 if requant else jnp.float32
    tb = stride * th

    kern = functools.partial(_qdw_kernel, act=act, requant=requant,
                             stride=stride, th=th, h=h)

    # halo = ONE row above / below the body block, row-granular BlockSpecs
    # (clamped at the borders; the kernel masks the duplicated rows to pad)
    halo = lambda off: pl.BlockSpec(
        (1, 1, w, c),
        lambda ni, i, _o=off: (ni, jnp.clip(i * tb + _o, 0, h - 1), 0, 0),
        memory_space=pltpu.VMEM)

    wf = w_s8.reshape(9, c).astype(jnp.float32)
    grid = (n, ho // th)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 4), lambda ni, i: (0, 0),
                         memory_space=pltpu.SMEM),
            halo(-1),
            pl.BlockSpec((1, tb, w, c), lambda ni, i: (ni, i, 0, 0),
                         memory_space=pltpu.VMEM),
            halo(tb),
            pl.BlockSpec((9, c), lambda ni, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda ni, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda ni, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, wo, c), lambda ni, i: (ni, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, ho, wo, c), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * n * ho * wo * c,
            bytes_accessed=n * h * w * c + n * ho * wo * c,
            transcendentals=0),
        interpret=interpret,
    )(_scalars(x_scale, x_zp, out_scale, out_zp, requant)
      if scalars is None else scalars,
      x_s8, x_s8, x_s8, wf,
      w_scale.reshape(1, -1).astype(jnp.float32),
      b.reshape(1, -1).astype(jnp.float32))
