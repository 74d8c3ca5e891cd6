"""Int8 quantized inference (the 'quant' model state).

The reference converts QAT models with torch.quantization.convert into
int8 CPU models backed by fbgemm/qnnpack GEMMs (tools.py:291-304). The
TPU-native equivalent: BN-folded weights quantised to per-channel symmetric
int8, activations to per-tensor affine uint8 using the QAT observer ranges,
and convolutions executed as s8 x s8 -> s32 on the MXU
(preferred_element_type=int32), requantised at every quantised edge.

Add/concat/scale run in fp32 between dequant/requant pairs, mirroring the
reference's dequant-op-quant sandwiches in its quantized ONNX export
(export/onnx_exporter.py:79-355).
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pqdet_tpu.compress.qat import act_qparams
from pqdet_tpu.model import layers as L
from pqdet_tpu.model.decode import decode
from pqdet_tpu.model.graph import solve_padding
from pqdet_tpu.model.network import DetectionNetwork, fuse_params


def quantize_weights(w: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """HWIO fp32 -> (int8, per-out-channel scale)."""
    absmax = np.max(np.abs(w), axis=(0, 1, 2), keepdims=True)
    scale = np.maximum(absmax / 127.0, 1e-8)
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return q, scale.reshape(-1).astype(np.float32)


def convert_to_int8(network: DetectionNetwork, params: Dict, state: Dict) -> Dict:
    """QAT params+state -> int8 inference params.

    Returns {'layers': {idx: {'wq', 'w_scale', 'b'}}, 'act': {edge: (scale, zp)}}.
    """
    if 'quant' not in state:
        raise ValueError('state has no quant observers; train with quant.switch')
    fused = fuse_params(network, params, state)
    layers = {}
    for node in network.graph.nodes:
        key = str(node.index)
        if key not in fused:
            continue
        p = fused[key]
        if node.kind == 'convolutional':
            wq, w_scale = quantize_weights(np.asarray(p['w']))
            layers[key] = {'wq': wq, 'w_scale': w_scale,
                           'b': np.asarray(p.get('b', np.zeros(wq.shape[-1],
                                                               np.float32)))}
        else:
            layers[key] = jax.tree.map(np.asarray, p)
    act = {}
    for edge, obs in state['quant'].items():
        scale, zp = act_qparams(jax.tree.map(jnp.asarray, obs))
        act[edge] = (float(scale), float(zp))
    return {'layers': layers, 'act': act}


def save_quantized(path: str, network: DetectionNetwork, qparams: Dict,
                   cfg_text: str, step: int = 0, ap=None):
    """Persist an int8 model as a 'quant'-type checkpoint (the reference's
    converted-model state, tools.py:238-242)."""
    from pqdet_tpu.train.checkpoint import save_checkpoint
    act = {k: np.asarray(v, np.float32) for k, v in qparams['act'].items()}
    save_checkpoint(path, qparams['layers'], {'act': act}, step=step,
                    cfg_text=cfg_text, ap=ap, ckpt_type='quant',
                    backend='int8')


def load_quantized(path: str):
    """Load a 'quant' checkpoint -> (network, qparams)."""
    from pqdet_tpu.train.checkpoint import load_checkpoint
    ckpt = load_checkpoint(path)
    if ckpt.get('type') != 'quant':
        raise ValueError(f'{path} is not a quantized checkpoint')
    network = DetectionNetwork.from_cfg(ckpt['cfg'], quant=True)
    layers = {}
    for key, p in ckpt['params'].items():
        layers[key] = {k: np.asarray(v) for k, v in p.items()}
        if 'wq' in layers[key]:
            layers[key]['wq'] = layers[key]['wq'].astype(np.int8)
    act = {k: (float(v[0]), float(v[1]))
           for k, v in ckpt['state']['act'].items()}
    return network, {'layers': layers, 'act': act}


def _static_scalar(v) -> bool:
    """True when an edge qparam is a host scalar that can be baked into the
    jitted program as a constant (np.floating is NOT a float subclass, so
    numpy scalars need listing explicitly or they silently take the traced
    slow path)."""
    return isinstance(v, (int, float, np.floating))


def _quant(x, scale_zp):
    scale, zp = scale_zp
    return jnp.clip(jnp.round(x / scale + zp), 0, 255).astype(jnp.uint8)


def _dequant(q, scale_zp):
    scale, zp = scale_zp
    return (q.astype(jnp.float32) - zp) * scale


def _quant_s8(x, scale_zp):
    """Affine-quantise to the RECENTRED signed representation s = q_u8 - 128
    (exact; two's complement). The Pallas qconv kernel consumes/produces
    this format so no per-layer recentre op exists anywhere."""
    scale, zp = scale_zp
    return jnp.clip(jnp.round(x / scale + (zp - 128.0)),
                    -128, 127).astype(jnp.int8)


def _dequant_s8(s, scale_zp):
    scale, zp = scale_zp
    return (s.astype(jnp.float32) - (zp - 128.0)) * scale


def _fake_quant_edge(x, scale_zp):
    """Quantise-dequantise in fp without materialising uint8: fuses into
    neighbouring elementwise ops instead of forcing an extra HBM pass."""
    scale, zp = scale_zp
    q = jnp.clip(jnp.round(x / scale + zp), 0, 255)
    return (q - zp) * scale


def int8_conv(xq: jnp.ndarray, x_scale_zp, wq: jnp.ndarray, w_scale, b,
              stride: int, padding: int, groups: int) -> jnp.ndarray:
    """Quantized conv on the int8 MXU path, returning fp32.

    The affine uint8 activation is recentred to signed int8 by subtracting
    128 (exact, no overflow), so the conv runs s8 x s8 -> s32 natively.
    Padding uses the recentred zero point (real value 0), and the combined
    offset is removed analytically:
        conv(x_q - zp, w) = conv(x_q - 128, w) + (128 - zp) * sum(w)
    per-output-channel requant scale + bias finish in fp32.
    """
    x_scale, x_zp = x_scale_zp
    zp = jnp.round(jnp.asarray(x_zp)).astype(jnp.int32)
    xs8 = (xq.astype(jnp.int16) - 128).astype(jnp.int8)
    if padding:
        pad_val = (zp - 128).astype(jnp.int8)
        xs8 = jnp.pad(xs8, ((0, 0), (padding, padding), (padding, padding), (0, 0)),
                      constant_values=pad_val)
    acc = jax.lax.conv_general_dilated(
        xs8, wq.astype(jnp.int8),
        window_strides=(stride, stride),
        padding=((0, 0), (0, 0)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=groups,
        preferred_element_type=jnp.int32,
    )
    w_sum = jnp.sum(wq.astype(jnp.int32), axis=(0, 1, 2))  # per out channel
    acc = acc + (128 - zp) * w_sum
    return acc.astype(jnp.float32) * (x_scale * w_scale) + b


def _xla_dw3x3(xq, wdw, w_scale, b, stride, x_sz, out_edge, act_name,
               pad_val):
    """Depthwise 3x3 as 9 unrolled tap-slices + FMAs in plain XLA —
    everything is elementwise so XLA fuses the whole layer (taps, affine,
    activation, requant) into one loop fusion. Exact integer semantics:
    s8 values as f32, offset removed analytically via the per-channel
    weight sum. Stride 2 uses the same row/column-parity bitcast-view
    trick as the stem (strided XLA slices lower to gather fusions).
    """
    n, h, w, c = xq.shape
    wf = wdw.astype(jnp.float32)                       # (3, 3, C)
    x_scale, x_zp = x_sz
    colsum = jnp.sum(wf, axis=(0, 1))
    if stride == 1:
        xp = jnp.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)),
                     constant_values=pad_val)
        acc = 0.
        for kh in range(3):
            for kw in range(3):
                acc = acc + wf[kh, kw] * \
                    xp[:, kh:kh + h, kw:kw + w, :].astype(jnp.float32)
    else:
        ho, wo = h // 2, w // 2
        x4 = xq.reshape(n, ho, 2, wo, 2 * c)
        xe, xo = x4[:, :, 0], x4[:, :, 1]              # (n, ho, wo, 2c)
        pad_row = jnp.full((n, 1, wo, 2 * c), pad_val, jnp.int8)
        pad_col = jnp.full((n, ho, 1, c), pad_val, jnp.int8)
        rows = (jnp.concatenate([pad_row, xo[:, :ho - 1]], axis=1), xe, xo)
        acc = 0.
        for kh, R in enumerate(rows):
            even, odd = R[..., :c], R[..., c:]         # cols 2c / 2c+1
            prev_odd = jnp.concatenate(
                [pad_col, R[:, :, :wo - 1, c:]], axis=2)  # col 2c-1
            for kw, tap in ((0, prev_odd), (1, even), (2, odd)):
                acc = acc + wf[kh, kw] * tap.astype(jnp.float32)
    alpha = jnp.float32(x_scale) * w_scale
    beta = alpha * ((128.0 - jnp.float32(x_zp)) * colsum) + b
    y = L.apply_activation(act_name, acc * alpha + beta)
    if out_edge is None:
        return y
    return _quant_s8(y, out_edge)


def _xla_pw1x1(xq, w2d, w_scale, b, colsum, x_sz, out_edge, act_name):
    """Pointwise 1x1 via XLA's native s8 x s8 -> s32 conv on the int8 MXU,
    requant fused into the conv's output fusion by XLA. Bit-exact with the
    Pallas qconv1x1_s8 (same recentred-s8 algebra, f32 epilogue). The
    whole-family alternative to the Pallas kernel: with EVERY layer in
    plain XLA the compiler owns layout assignment end to end — the mixed
    custom-call/native graph measured 3.7 ms/fwd of pure layout copies at
    bs=16 (tools/profile_int8.py, STATUS r3)."""
    x_scale, x_zp = x_sz
    acc = jax.lax.conv_general_dilated(
        xq, w2d[None, None], (1, 1), 'VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.int32)
    alpha = jnp.float32(x_scale) * w_scale
    beta = alpha * ((128.0 - jnp.float32(x_zp))
                    * colsum.astype(jnp.float32)) + b
    y = L.apply_activation(act_name, acc.astype(jnp.float32) * alpha + beta)
    if out_edge is None:
        return y
    return _quant_s8(y, out_edge)


def _xla_conv3x3_s8(xq, wq, w_scale, b, colsum, stride, x_sz, out_edge,
                    act_name, pad_val):
    """Dense 3x3 (stem / densified grouped) via the native s8 MXU conv —
    exact s32 accumulation with no bf16 magnitude bound (cf.
    _native_conv3x3's <=115-nonzero-weight limit), requant fused by XLA.
    wq: (3, 3, Cin, Cout) int8; colsum: (Cout,) per-channel weight sum."""
    x_scale, x_zp = x_sz
    xs = jnp.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)),
                 constant_values=pad_val)
    acc = jax.lax.conv_general_dilated(
        xs, wq, (stride, stride), ((0, 0), (0, 0)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.int32)
    alpha = jnp.float32(x_scale) * w_scale
    beta = alpha * ((128.0 - jnp.float32(x_zp))
                    * colsum.astype(jnp.float32)) + b
    y = L.apply_activation(act_name, acc.astype(jnp.float32) * alpha + beta)
    if out_edge is None:
        return y
    return _quant_s8(y, out_edge)


def _native_dw3x3(xq, wdw, w_scale, b, stride, x_sz, out_edge, act_name,
                  pad_val):
    """Depthwise 3x3 through XLA's NATIVE conv on RECENTRED-INTEGER-valued
    bf16 tensors — exact integer semantics: s8 values are exact in bf16
    (8-bit mantissa holds |v| <= 255) and the MXU accumulates in f32, so
    every product/sum stays exact (|acc| <= 9*127*127 << 2^24). The affine
    offset is removed analytically via the per-channel weight sum, and the
    requant epilogue fuses into the conv's consumer. XLA's dw lowering
    beats a VPU tap kernel at C >= ~96 (measured per-shape, STATUS r3).
    """
    c = xq.shape[-1]
    x_scale, x_zp = x_sz
    wf = wdw.astype(jnp.bfloat16).reshape(3, 3, 1, c)
    xf = jnp.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)),
                 constant_values=pad_val).astype(jnp.bfloat16)
    acc = jax.lax.conv_general_dilated(
        xf, wf, window_strides=(stride, stride), padding=((0, 0), (0, 0)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'), feature_group_count=c,
        preferred_element_type=jnp.float32)
    colsum = jnp.sum(wdw.astype(jnp.float32), axis=(0, 1))
    alpha = jnp.float32(x_scale) * w_scale
    beta = alpha * ((128.0 - jnp.float32(x_zp)) * colsum) + b
    y = L.apply_activation(act_name, acc * alpha + beta)
    if out_edge is None:
        return y
    return _quant_s8(y, out_edge)


def _s8_dw3x3(xq, wdw, w_scale, b, stride, x_sz, out_edge, act_name,
              pad_val):
    """Depthwise 3x3 via XLA's NATIVE s8 x s8 -> s32 conv — exact integer
    semantics with no bf16 anywhere (s32 accumulation has no magnitude
    bound concern; cf. _native_dw3x3's exact-int bf16 route). Built as the
    hardware fallback for the _native_dw3x3 TPU lowering fault localised
    by tools/bisect_int8_layers.py on the pruned clutter graph (round 3):
    every element off by exactly 128 quant levels (u8-wrap signature),
    while CPU is exact. Selectable via PQDET_DW_POLICY=s8."""
    c = xq.shape[-1]
    x_scale, x_zp = x_sz
    xs = jnp.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)),
                 constant_values=pad_val)
    acc = jax.lax.conv_general_dilated(
        xs, wdw.reshape(3, 3, 1, c), window_strides=(stride, stride),
        padding=((0, 0), (0, 0)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'), feature_group_count=c,
        preferred_element_type=jnp.int32)
    colsum = jnp.sum(wdw.astype(jnp.int32), axis=(0, 1))
    alpha = jnp.float32(x_scale) * w_scale
    beta = alpha * ((128.0 - jnp.float32(x_zp))
                    * colsum.astype(jnp.float32)) + b
    y = L.apply_activation(act_name, acc.astype(jnp.float32) * alpha + beta)
    if out_edge is None:
        return y
    return _quant_s8(y, out_edge)


def _native_conv3x3(xq, w_bf16, w_scale, b, colsum, stride, x_sz, out_edge,
                    act_name, pad_val, groups: int = 1):
    """Dense 3x3 conv through XLA's native conv on RECENTRED-INTEGER-valued
    bf16 tensors (exact like _native_dw3x3 whenever the per-output-channel
    count of NONZERO weights is <= 115: every partial sum stays < 2^24, and
    zero products add no rounding). Used for the small-Cin stem and for
    block-diagonal-densified grouped convs (RegNet group widths <= 48).

    Three Pallas formulations of the stem were tried and are Mosaic-blocked
    (round 3): lane-axis tpu.concatenate rejects mismatched sublane
    offsets; a 5-D (..., 9, cin) block pads to full (32, 128) int8 tiles
    (416 MB scoped VMEM); lane-slice stores into a 27-lane block hang the
    compiler; and any (..., cin=3)-lane f32 value spills 42x registers.
    The XLA conv hits the MXU directly and fuses the requant epilogue.
    """
    x_scale, x_zp = x_sz
    xf = jnp.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)),
                 constant_values=pad_val).astype(jnp.bfloat16)
    acc = jax.lax.conv_general_dilated(
        xf, w_bf16.astype(jnp.bfloat16),
        window_strides=(stride, stride), padding=((0, 0), (0, 0)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=groups,
        preferred_element_type=jnp.float32)
    alpha = jnp.float32(x_scale) * w_scale
    beta = alpha * ((128.0 - jnp.float32(x_zp)) * colsum) + b
    y = L.apply_activation(act_name, acc * alpha + beta)
    if out_edge is None:
        return y
    return _quant_s8(y, out_edge)


def _densify_int8_weight(wq: np.ndarray, groups: int) -> np.ndarray:
    """Compact grouped int8 HWIO weights -> block-diagonal dense, host-side
    (the int8 analogue of model.layers.densify_grouped_weight)."""
    kh, kw, cin_g, cout = wq.shape
    dense = np.zeros((kh, kw, cin_g * groups, cout), wq.dtype)
    cpg = cout // groups
    for g in range(groups):
        dense[:, :, g * cin_g:(g + 1) * cin_g, g * cpg:(g + 1) * cpg] = \
            wq[..., g * cpg:(g + 1) * cpg]
    return dense



def _stem_im2col_small_batch(xq, p, common, stride, pad_val, qconv1x1_s8):
    """Small-batch stem: XLA-level im2col patch views into the fused 1x1
    MXU kernel (exact integer semantics; padding = recentred zero point).
    Fast at bs < 8 (round-2 measurements); at batch the parity bitcast
    views blow up into batch-minor layout copies (9.2 ms/fwd at bs=16,
    round 3) and _native_conv3x3 takes over. Stride 1: 9 stride-1 slices
    of the padded input; stride 2: row-parity bitcast view so every tap
    is a PLAIN slice (stride-2 XLA slices lower to 428 us gather fusions
    each; space-to-depth costs 420 us of layout copies)."""
    n, hh, ww, cc = xq.shape
    if stride == 1:
        xp = jnp.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)),
                     constant_values=pad_val)
        patches = jnp.concatenate(
            [xp[:, kh:kh + hh, kw:kw + ww, :]
             for kh in range(3) for kw in range(3)], axis=-1)
        return qconv1x1_s8(patches, p['wim'], p['w_scale'], p['b'],
                           p['wim_colsum'], **common)
    # stride 2 row parity: out row r reads rows 2r+kh-1 (kh=1 -> even rows,
    # kh=0/2 -> odd rows shifted); each row part's lanes hold cols
    # (2c, 2c+1) = the kw=1,2 taps, and lanes [cc:2cc] shifted one column
    # right give kw=0
    ho, wo = hh // 2, ww // 2
    x4 = xq.reshape(n, ho, 2, wo, 2 * cc)
    xe, xo = x4[:, :, 0], x4[:, :, 1]
    pad_row = jnp.full((n, 1, wo, 2 * cc), pad_val, jnp.int8)
    pad_col = jnp.full((n, ho, 1, cc), pad_val, jnp.int8)
    parts = []
    for R in (jnp.concatenate([pad_row, xo[:, :ho - 1]], axis=1), xe, xo):
        parts.append(R)
        parts.append(jnp.concatenate(
            [pad_col, R[:, :, :wo - 1, cc:]], axis=2))
    patches = jnp.concatenate(parts, axis=-1)
    return qconv1x1_s8(patches, p['wim_p'], p['w_scale'], p['b'],
                       p['wim_p_colsum'], **common)


class Int8Inference:
    """Quantized graph executor (inference only, NHWC int8 tensors).

    ``mode``:
    - 'pallas' (default): exact integer semantics through the fused Pallas
      s8 x s8 -> s32 kernels (requant + activation in the epilogue,
      recentred-s8 activations, ops/pallas_qconv.py): 1x1 convs on the MXU,
      depthwise 3x3 on the VPU, and the small-Cin stem as im2col patches
      into the same MXU kernel — every mobilenetv2-fpn conv is covered.
      One op per quantized layer — the fast serving path.
    - 'int': integer accumulation (s32) via XLA convs — exact quantized
      semantics, reference implementation (2x slower: per-layer
      recentre/pad/requant fusions + layout copies dominate)
    - 'dequant': int8 weight STORAGE dequantised at use (fuses into the
      conv), activations fake-quantised per edge in fp with the calibrated
      qparams (no uint8 materialisation) — same quantisation error model,
      useful as an XLA-only fallback.

    Always run through ``Int8Inference.prepare`` first — host-resident
    qparams cost ~70 ms/call of DevicePut otherwise (and 'pallas' needs its
    derived tensors).

    ``act``: the edge qparams dict may be given at construction to make the
    scales/zero-points STATIC (baked into the jitted program as constants).
    Passing them only through ``qparams['act']`` of a jitted apply works too
    but traces them — one small scalar fusion per conv layer at runtime and
    a bigger dispatched program (~80 extra ops for mobilenetv2-fpn).
    """

    def __init__(self, network: DetectionNetwork, mode: str = 'pallas',
                 act: Dict = None, dw_impl: str = 'auto'):
        assert mode in ('int', 'dequant', 'pallas')
        assert dw_impl in ('auto', 'pallas', 'xla')
        self.network = network
        self.graph = network.graph
        self.mode = mode
        self.act = act
        self.dw_impl = dw_impl

    def _dw_impl(self, x_shape, stride: int) -> str:
        """Resolve dw_impl='auto' per traced layer shape (batch, h, w, c).

        Per-shape policy from the tools/microbench_dw.py trace A/B on v5e
        (bs=16, device us/layer; STATUS round 3): the Pallas VPU kernel
        loses badly at batch — misaligned sublane tap slices force full
        relayout copies (256^2 c32: 2.8 ms vs 445 us for the unrolled-XLA
        fusion). 'xla' (9 unrolled tap FMAs) wins high-res stride-1
        layers; the native lax.conv wins every stride-2 shape and
        everything at h < 128. At bs < 8 the Pallas kernel's
        one-op-per-layer form wins overall (round-2 bs=1: 4.63 pallas vs
        5.01 xla full-model) — re-measure if kernels change.

        The native-conv slot runs 's8' (s8 x s8 -> s32), NOT 'native'
        (exact-int bf16): XLA:TPU MISCOMPILES the bf16 depthwise conv on
        pruned channel counts — measured c=80 s2 @256^2: every output
        element +128 quant levels (s8-saturated), 99.95% of 21M elements
        wrong (tools/repro_native_dw.py, 2026-08-19), while the same HLO
        is exact on CPU and the unpruned graph (c=96/144/192/...) served
        AP-clean on hardware. The s8 conv takes the conv emitter with
        integer types instead and probes exact at the failing shape."""
        if self.dw_impl != 'auto':
            return self.dw_impl
        policy = os.environ.get('PQDET_DW_POLICY', '')  # A/B experiments
        batch, h = x_shape[0], x_shape[1]
        if policy == 'xla_s1':
            return 'xla' if stride == 1 else 's8'
        if policy == 'xla_all':
            return 'xla'
        if policy == 'native':
            return 'native'
        if policy == 's8':
            return 's8'
        if policy == 'xla128':      # A/B: the round-3 pre-s8 bs>=8 split
            return 'xla' if stride == 1 and h >= 128 else 's8'
        if batch < 8:
            # bs=1: xla taps for the big maps + s8 conv for the small-h
            # tail measures 2.63 ms full-model (vs 4.50 with the bf16
            # native conv in the s8 slot, and 3.94 with s8 everywhere —
            # 2026-08-19 A/B). The Pallas dw kernel never wins a shape on
            # v5e — kept only as an explicit dw_impl choice.
            return 'xla' if h >= 128 else 's8'
        # bs>=8: the fused XLA tap path wins the big stride-1 maps (256^2
        # c32: 445 vs 2622 us) and, IN-MODEL, the h=128 ones too — the
        # per-layer sweep has s8 tying there (c=144: 497 vs 486) but the
        # full-model A/B is clear (13.76 ms with xla at h>=128 s1 vs
        # 14.32 with xla only at h>=256; 2026-08-19): the s8 conv inserts
        # layout transitions the homogeneous microbench chain never pays.
        # Everything else does best as the s8 native conv.
        if stride == 1 and h >= 128:
            return 'xla'
        return 's8'

    def _pw_impl(self, x_shape) -> str:
        """1x1 family: 'pallas' (fused MXU kernel, requant in the
        epilogue) or 'xla' (native s8 conv, requant left to XLA).
        Measured full-model at bs=16 (round 3): pallas 14.0 ms vs xla
        14.8 — XLA's TPU backend does NOT fuse the requant chain into s8
        conv outputs (separate f32 clamp passes double the epilogue
        traffic), so the fused Pallas kernel wins at every batch size
        despite homogeneous-chain microbenches favouring the native conv
        (tools/microbench_conv1x1.py). 'xla' stays as an env A/B hook."""
        env = os.environ.get('PQDET_PW_IMPL', '')
        if env in ('pallas', 'xla'):
            return env
        return 'pallas'

    def _nat_impl(self) -> str:
        """Dense-3x3 family: 'bf16' (exact-int native conv, f32 MXU accum)
        or 's8' (native int8 MXU conv, s32 accum — exact at any width)."""
        env = os.environ.get('PQDET_NAT_IMPL', '')
        if env in ('bf16', 's8'):
            return env
        return 's8'

    def _dens_im2col(self, x_shape, stride: int) -> bool:
        """Small-batch dense/densified 3x3: route through the Pallas 1x1
        MXU kernel via XLA-level im2col patch views?

        Per-shape A/B at bs=1 on the regnety-400m-fpn densified stack
        (tools/bench_densified.py, 2026-08-19, device us/layer): im2col
        wins every stride-2 shape (256^2x48: 142 vs 184; 32^2x440: 13 vs
        29) and the small maps (16^2x440: 13.3 vs 24; 32^2x176: 12.7 vs
        16.9), s8 wins the mid-size stride-1 maps (64^2x104: 8.4 vs 37.6)
        — and in-model s8 additionally pays a layout copy off every
        Pallas-1x1 input that im2col's concatenate does not. The true
        small-Cin stem always prefers im2col (round-2 measurement)."""
        env = os.environ.get('PQDET_DENS_IMPL', '')
        if env == 'im2col':
            return True
        if env == 's8':
            return False
        h, cin = x_shape[1], x_shape[3]
        return cin <= 16 or stride == 2 or h <= 32

    @staticmethod
    def prepare(qparams: Dict, mode: str = 'pallas',
                network: DetectionNetwork = None) -> Dict:
        """Stage qparams on device once. convert_to_int8/load_quantized
        return host numpy arrays (for serialisation); passing those to a
        jitted apply re-uploads them EVERY call (measured ~70 ms/call of
        DevicePut on the tunnel vs ~1 ms of actual compute). In 'pallas'
        mode also derives the kernel weight views ((Cin, Cout) 1x1
        matrices, depthwise/HWC, native-conv bf16 stems, per-channel
        column sums); 'int'/'dequant' skip those dead uploads.

        With ``network`` given, GROUPED convs (group width >= 2 — the
        RegNet pattern) are densified to block-diagonal int8 weights
        host-side, so they ride the same MXU paths as dense convs
        (grouped 1x1 -> w2d, grouped 3x3 -> wnat; exact for group widths
        <= 115, see _native_conv3x3). Without it they fall back to the
        bf16-dequant XLA conv."""
        groups_of = {}
        if network is not None:
            for node in network.graph.nodes:
                if node.kind == 'convolutional':
                    groups_of[str(node.index)] = node.attrs['groups']
        layers = {}
        for key, p in qparams['layers'].items():
            p = dict(p)
            wq = p.get('wq') if mode == 'pallas' else None
            if wq is not None:
                wq = np.asarray(wq)
                g = groups_of.get(key, 1)
                width = wq.shape[2]
                if g > 1 and 2 <= width <= 115 and wq.shape[3] % g == 0:
                    wq = _densify_int8_weight(wq, g)
            if wq is not None and wq.shape[0] == 1 and wq.shape[1] == 1:
                w2d = wq.reshape(wq.shape[2], wq.shape[3])
                p['w2d'] = w2d
                p['colsum'] = w2d.astype(np.int32).sum(0)
            elif wq is not None and wq.shape[:3] == (3, 3, 1):
                # depthwise 3x3 (HWIO with in/groups == 1) -> (3, 3, C)
                p['wdw'] = wq.reshape(3, 3, wq.shape[3])
            elif (wq is not None and wq.shape[:2] == (3, 3)
                  and (wq.shape[2] <= 115 or groups_of.get(key, 1) > 1)):
                # dense (or densified-grouped) 3x3 with exactness-bounded
                # width: native-conv path (_native_conv3x3). The XLA bf16
                # dequant fallback ran the Cin=3 stem at ~0.09 TFLOP/s;
                # XLA-level im2col patch views cost 9.2 ms/fwd of layout
                # glue at bs=16; Pallas stem kernels are Mosaic-blocked
                # (all measured round 3).
                p['wnat'] = wq  # int8 HWIO (s8 path raw; bf16 path casts)
                p['wnat_colsum'] = wq.astype(np.int32).sum((0, 1, 2))
                # ALSO stage the im2col weight views for the small-batch
                # path (_stem_im2col_small_batch): the true small-Cin stem
                # (native conv costs 431 us at bs=1 vs ~100 us of patch
                # views) AND densified grouped convs (RegNet stacks) —
                # at bs=1 XLA's dense s8 convs run slow AND pay a layout
                # copy off every Pallas 1x1 output (48.2 us x8-understated
                # per 256^2x48 layer, tools/profile_int8.py 2026-08-19),
                # while the patch concatenate reads that layout directly
                # (tools/bench_densified.py: 142 vs 184+copy us on the
                # biggest layer, 13.3 vs 24+copy on the 16^2x440 stack).
                cin, cout = wq.shape[2], wq.shape[3]
                if cin <= 512:
                    wim = wq.reshape(9 * cin, cout)
                    p['wim'] = wim
                    p['wim_colsum'] = wim.astype(np.int32).sum(0)
                    wp = np.zeros((9 * cin, cout), wq.dtype)
                    for kh in range(3):
                        base = 3 * cin * kh
                        wp[base:base + cin] = wq[kh, 1]
                        wp[base + cin:base + 2 * cin] = wq[kh, 2]
                        wp[base + 2 * cin:base + 3 * cin] = wq[kh, 0]
                    p['wim_p'] = wp
                    p['wim_p_colsum'] = wp.astype(np.int32).sum(0)
            layers[key] = p
        staged = jax.tree.map(jnp.asarray, layers)
        for key, p in staged.items():
            if 'wnat' in p:
                # stays int8 on device: the bf16 native path casts at
                # trace time, the s8 path (nat_impl='s8') consumes it raw
                p['wnat_colsum'] = p['wnat_colsum'].astype(jnp.float32)
        return {'layers': staged, 'act': qparams['act']}

    def apply(self, qparams: Dict, x: jnp.ndarray,
              intermediates: bool = False):
        """Run the quantized graph. With ``intermediates`` the return value
        is ``(preds, {node_key: fp32 node output})`` — the per-layer debug
        view used to bisect executor-mode divergence on hardware
        (tools/bisect_int8_layers.py)."""
        act = self.act if self.act is not None else qparams['act']
        layers = qparams['layers']
        last_use = self.graph.last_use
        cache: Dict[int, jnp.ndarray] = {}
        inter: Dict[str, jnp.ndarray] = {}
        outputs = []
        pallas = self.mode == 'pallas'
        # CPU tests run the kernel in interpreter mode
        interpret = pallas and jax.default_backend() != 'tpu'

        if self.mode == 'dequant':
            xq, cur_sz = _fake_quant_edge(x, act['input']), None
        elif pallas:
            xq, cur_sz = _quant_s8(x, act['input']), act['input']
        else:
            xq, cur_sz = _quant(x, act['input']), act['input']

        def as_fp(val, sz):
            if sz is None:
                return val
            return _dequant_s8(val, sz) if pallas else _dequant(val, sz)

        def requant(y, sz):
            if self.mode == 'dequant':
                return _fake_quant_edge(y, sz), None
            return (_quant_s8(y, sz), sz) if pallas else (_quant(y, sz), sz)

        def record(key, val, sz):
            if intermediates:
                inter[key] = as_fp(val, sz)

        for node in self.graph.nodes:
            i, kind = node.index, node.kind
            key = str(i)
            a = node.attrs
            if kind == 'convolutional':
                p = layers[key]
                padding = solve_padding(a['size'], a['padding'], a['pad'])
                dw_ok = ('wdw' in p and a['size'] == 3 and padding == 1
                         and a['groups'] == xq.shape[-1]
                         and a['groups'] == a['filters']
                         and xq.shape[1] % a['stride'] == 0
                         and xq.shape[2] % a['stride'] == 0)
                pw_ok = ('w2d' in p and a['stride'] == 1 and padding == 0
                         and p['w2d'].shape[0] == xq.shape[-1])
                nat_ok = ('wnat' in p and a['size'] == 3 and padding == 1
                          and a['stride'] in (1, 2)
                          and p['wnat'].shape[2] == xq.shape[-1]
                          and xq.shape[1] % a['stride'] == 0
                          and xq.shape[2] % a['stride'] == 0)
                if pallas and cur_sz is not None and (pw_ok or dw_ok
                                                      or nat_ok):
                    from pqdet_tpu.ops.pallas_qconv import (make_scalars,
                                                            qconv1x1_s8,
                                                            qdwconv3x3_s8)
                    out_edge = act.get(key)
                    if _static_scalar(cur_sz[0]):
                        # static edge qparams: bake the SMEM scalar vector
                        # as a jit constant (a runtime fusion otherwise)
                        sc = jnp.asarray(make_scalars(
                            cur_sz[0], cur_sz[1],
                            None if out_edge is None else out_edge[0],
                            None if out_edge is None else out_edge[1]))
                        common = dict(act=a['activation'], scalars=sc,
                                      requant=out_edge is not None,
                                      interpret=interpret)
                    else:  # traced through qparams['act']
                        common = dict(
                            act=a['activation'],
                            x_scale=cur_sz[0], x_zp=cur_sz[1],
                            out_scale=None if out_edge is None else out_edge[0],
                            out_zp=None if out_edge is None else out_edge[1],
                            interpret=interpret)
                    # Tiny-spatial 1x1s (SE squeeze/excite, coarsest FPN
                    # maps; W < one 8-sublane tile) go to the native s8
                    # conv: the batch-merged Pallas reshape hits Mosaic
                    # 'unsupported shape cast' on (N,1..4,1..4,C) blocks
                    # at bs>=8 (probed per-shape on hardware, round 3),
                    # and at these sizes the layer is dispatch noise —
                    # the fused epilogue saves nothing.
                    if pw_ok and (xq.shape[2] < 8
                                  or self._pw_impl(xq.shape) == 'xla'):
                        y = _xla_pw1x1(xq, p['w2d'], p['w_scale'], p['b'],
                                       p['colsum'], cur_sz, out_edge,
                                       a['activation'])
                    elif pw_ok:
                        y = qconv1x1_s8(xq, p['w2d'], p['w_scale'], p['b'],
                                        p['colsum'], **common)
                    elif dw_ok and self._dw_impl(xq.shape, a['stride']) \
                            in ('xla', 'native', 's8'):
                        if _static_scalar(cur_sz[1]):
                            pv = np.int8(round(cur_sz[1]) - 128)
                        else:
                            pv = (jnp.round(cur_sz[1]) - 128).astype(jnp.int8)
                        fn = {'xla': _xla_dw3x3, 'native': _native_dw3x3,
                              's8': _s8_dw3x3}[
                            self._dw_impl(xq.shape, a['stride'])]
                        y = fn(xq, p['wdw'], p['w_scale'], p['b'],
                               a['stride'], cur_sz, out_edge,
                               a['activation'], pv)
                        xq, cur_sz = y, out_edge
                        record(key, xq, cur_sz)
                        if i in last_use:
                            cache[i] = (xq, cur_sz)
                        continue
                    elif dw_ok:
                        y = qdwconv3x3_s8(xq, p['wdw'], p['w_scale'], p['b'],
                                          stride=a['stride'], **common)
                    else:
                        # dense / densified-grouped 3x3 (stem, RegNet
                        # grouped stacks)
                        if _static_scalar(cur_sz[1]):
                            pv = np.int8(round(cur_sz[1]) - 128)
                        else:
                            pv = (jnp.round(cur_sz[1]) - 128
                                  ).astype(jnp.int8)
                        if 'wim' in p and xq.shape[0] < 8 \
                                and a['stride'] in (1, 2) \
                                and self._dens_im2col(xq.shape, a['stride']):
                            y = _stem_im2col_small_batch(
                                xq, p, common, a['stride'], pv, qconv1x1_s8)
                        elif self._nat_impl() == 's8':
                            # native int8 MXU conv, s32-exact at any width
                            y = _xla_conv3x3_s8(
                                xq, p['wnat'], p['w_scale'], p['b'],
                                p['wnat_colsum'], a['stride'], cur_sz,
                                out_edge, a['activation'], pv)
                        else:
                            # exact-int bf16 native conv on the MXU
                            y = _native_conv3x3(
                                xq, p['wnat'], p['w_scale'], p['b'],
                                p['wnat_colsum'], a['stride'], cur_sz,
                                out_edge, a['activation'], pv)
                    xq, cur_sz = y, out_edge
                    record(key, xq, cur_sz)
                    if i in last_use:
                        cache[i] = (xq, cur_sz)
                    continue
                if self.mode == 'int':
                    y = int8_conv(xq, cur_sz, jnp.asarray(p['wq']),
                                  jnp.asarray(p['w_scale']), jnp.asarray(p['b']),
                                  a['stride'], padding, a['groups'])
                else:
                    w = jnp.asarray(p['wq']).astype(jnp.float32) \
                        * jnp.asarray(p['w_scale'])
                    y = L.conv2d(as_fp(xq, cur_sz), w, jnp.asarray(p['b']),
                                 stride=a['stride'], padding=padding,
                                 groups=a['groups'], compute_dtype=jnp.bfloat16)
                    y = y.astype(jnp.float32)
                y = L.apply_activation(a['activation'], y)
            elif kind == 'shortcut':
                y = as_fp(xq, cur_sz) + as_fp(*cache[node.refs[0]])
                y = L.apply_activation(a['activation'], y)
            elif kind == 'scale_channels':
                y = as_fp(*cache[node.refs[0]]) * as_fp(xq, cur_sz)
            elif kind == 'route':
                srcs = [as_fp(*cache[r]) for r in node.refs]
                y = srcs[0] if len(srcs) == 1 else jnp.concatenate(srcs, axis=-1)
            elif kind == 'maxpool':
                padding = solve_padding(a['size'], a['padding'], a['pad'])
                y = L.max_pool(as_fp(xq, cur_sz), a['size'], a['stride'],
                               padding)
            elif kind == 'avgpool':
                y = L.adaptive_avg_pool(as_fp(xq, cur_sz), *node.out_size)
            elif kind == 'upsample':
                # replication commutes with quantisation: stay int8
                n, h, w, c = xq.shape
                f = a['stride']
                y = jnp.broadcast_to(xq[:, :, None, :, None, :],
                                     (n, h, f, w, f, c)).reshape(n, h * f, w * f, c)
                cache_entry = (y, cur_sz)
                if i in last_use:
                    cache[i] = cache_entry
                xq, cur_sz = y, cur_sz
                record(key, xq, cur_sz)
                continue
            elif kind == 'fc':
                p = layers[key]
                y = L.linear(as_fp(xq, cur_sz).reshape(xq.shape[0], -1), p)
                y = L.apply_activation(a['activation'], y)
            elif kind == 'yolo':
                pred = decode(as_fp(xq, cur_sz), a['classes'], a['stride'])
                outputs.append(pred)
                if i in last_use:
                    cache[i] = (pred, None)
                xq, cur_sz = pred, None
                record(key, xq, cur_sz)
                continue
            elif kind == 'dropout':
                xq, cur_sz = xq, cur_sz
                continue
            else:
                raise ValueError(kind)

            if key in act:  # requantise this edge
                xq, cur_sz = requant(y, act[key])
            else:           # fp32 edge (feeds a yolo head)
                xq, cur_sz = y, None
            record(key, xq, cur_sz)
            if i in last_use:
                cache[i] = (xq, cur_sz)

        flat = [o.reshape(o.shape[0], -1, o.shape[-1]) for o in outputs]
        preds = jnp.concatenate(flat, axis=1)
        if intermediates:
            return preds, inter
        return preds
