"""Pallas TPU kernel: fused bf16 inverted-residual block (serving path).

Round-3 roofline work showed the bf16 forward is HBM-bandwidth-bound with
depthwise-separable stacks dominating the traffic: XLA executes
expand-1x1 -> dw3x3 -> project-1x1 as 2-3 fusions, writing the EXPANDED
(6x-wide) activation to HBM after the expand and reading it back for the
dw taps, then again writing/reading the dw output before the projection
(reference intent: the conv stacks built at
/root/reference/model/parser.py:393-410). This kernel keeps the expanded
tensor entirely in VMEM:

    HBM reads : x (Cin-wide) + weights
    HBM writes: y (Cout-wide)

vs the unfused path's additional ~4 * H*W*E bf16 bytes per block (write+
read expand output, write+read dw output) — for mobilenetv2's 6x
expansions that is ~80% of the block's traffic.

Design (Mosaic constraints from round 3, see _native_conv3x3):
- grid (N, H/TH, E/TE): expanded channels are chunked to TE=128 LANES so
  E = 96/144/192/384/576/960 never puts a ragged dim on the lane axis;
  each chunk k computes expand -> dw -> a partial projection, accumulated
  into a persistent f32 scratch across the (innermost) k axis, written
  once at k == K-1.
- halo rows ride the row-granular clamped BlockSpec trick from
  qdwconv3x3_s8; out-of-image rows are masked to the dw zero-pad AFTER
  the expand (zero-padding applies in the dw input domain, and
  relu6(expand(0)) != 0 once BN is folded into the bias).
- dw taps: contiguous lax.slice_in_dim only (Mosaic rejects strided
  vector slices); stride-1 blocks only (stride-2 dw layers keep the XLA
  path — they are 3 of 17 blocks and change the spatial frame anyway).
- all matmuls bf16 x bf16 -> f32 (MXU native); inter-stage activations
  round through bf16 exactly like the unfused layer walk does.

Weights are pre-padded once at integration time (`pad_fused_weights`):
expanded-channel pads are zero in we/bdw/wdw AND wp rows, so pad lanes
contribute exactly 0; Cout pads to full lanes and the caller slices.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pqdet_tpu.ops.pallas_qconv import _apply_act

TE = 128  # expanded-channel chunk = one lane tile


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def _fused_ir_kernel(x0_ref, x1_ref, x2_ref, we_ref, be_ref, wdw_ref,
                     bdw_ref, wp_ref, bp_ref, o_ref, acc_ref, *,
                     act_e: str, act_dw: str, act_p: str, nb: int, th: int,
                     h: int, w: int, nk: int, expand: bool):
    i = pl.program_id(1)
    k = pl.program_id(2)

    # (nb, th+2, w, cin): nb images per program — small-spatial layers
    # (16^2/32^2) were per-program-overhead-bound with one image each in
    # the first hardware A/B
    win = jnp.concatenate([x0_ref[:], x1_ref[:], x2_ref[:]], axis=1)
    cin = win.shape[-1]
    # W pad happens on the NARROW input window (cin lanes), never on the
    # expanded tensor — a second 128-lane concatenate per chunk measured
    # ~35% of kernel time in the first hardware A/B
    zcol = jnp.zeros((nb, th + 2, 1, cin), jnp.bfloat16)
    win = jnp.concatenate([zcol, win, zcol], axis=2)  # (nb, th+2, w+2, cin)
    if expand:
        xe = jnp.dot(win.reshape(nb * (th + 2) * (w + 2), cin), we_ref[:],
                     preferred_element_type=jnp.float32)
        xe = _apply_act(act_e, xe + be_ref[:])
        xe = xe.reshape(nb, th + 2, w + 2, TE)
    else:
        xe = win.astype(jnp.float32)

    # dw zero-pad domain: rows outside the image (the clamped halo
    # duplicated a real row) and the W borders are 0. Masking runs AFTER
    # the expand: relu6(expand(0)) != 0 once BN folds into the bias.
    row0 = i * th - 1
    gidx = jax.lax.broadcasted_iota(jnp.int32, (1, th + 2, 1, 1), 1) + row0
    cidx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w + 2, 1), 2)
    ok = ((gidx >= 0) & (gidx < h)) & ((cidx >= 1) & (cidx <= w))
    xe = jnp.where(ok, xe, 0.0).astype(jnp.bfloat16)
    te = xe.shape[-1]

    acc = jnp.zeros((nb, th, w, te), jnp.float32)
    for kh in range(3):
        rows = jax.lax.slice_in_dim(xe, kh, kh + th, axis=1)
        for kw in range(3):
            tap = jax.lax.slice_in_dim(rows, kw, kw + w, axis=2)
            acc = acc + wdw_ref[3 * kh + kw, :].astype(jnp.float32) \
                * tap.astype(jnp.float32)
    y = _apply_act(act_dw, acc + bdw_ref[:])
    y = y.astype(jnp.bfloat16).reshape(nb * th * w, te)

    part = jnp.dot(y, wp_ref[:], preferred_element_type=jnp.float32)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = part + bp_ref[:]

    @pl.when(k > 0)
    def _accum():
        acc_ref[:] = acc_ref[:] + part

    @pl.when(k == nk - 1)
    def _emit():
        p = acc_ref.shape[-1]
        o_ref[:] = _apply_act(act_p, acc_ref[:]) \
            .astype(o_ref.dtype).reshape(nb, th, w, p)


def _row_block(th: int):
    """VMEM model per program at row-block th (bytes), W=w, chunk TE:
    window bf16 + expanded bf16 + tap/dw f32 + projection/acc f32."""
    def model(w, cin, p):
        win = (th + 2) * (w + 2) * cin * 2 * 2    # 3 specs, double-buffered
        xe = (th + 2) * (w + 2) * (TE * 2 + 4)    # bf16 + f32 pre-mask
        dw = 2 * th * w * TE * 4                   # acc + live tap temp
        proj = th * w * (TE * 2 + 2 * p * 4)       # y bf16 + part/acc f32
        out = th * w * p * 2 * 2
        return win + xe + dw + proj + out
    return model


@functools.partial(jax.jit, static_argnames=('act_e', 'act_dw', 'act_p',
                                             'interpret'))
def fused_ir_conv(x: jnp.ndarray, we, be, wdw, bdw, wp, bp, *,
                  act_e: str = 'relu6', act_dw: str = 'relu6',
                  act_p: str = 'linear',
                  interpret: bool = False) -> jnp.ndarray:
    """Fused [expand 1x1 + act] -> [dw 3x3 s1 p1 + act] -> [project 1x1
    + act] on NHWC bf16. Shapes (pre-padded, see pad_fused_weights):

    x (N, H, W, Cin) bf16; we (Cin, E) bf16 / be (1, E) f32 — or both
    None to fuse a bare dw3x3+pw1x1 pair (then E == Cin); wdw (9, E)
    bf16; bdw (1, E) f32; wp (E, P) bf16; bp (1, P) f32. E % 128 == 0,
    P % 128 == 0. Returns (N, H, W, P) bf16 (caller slices P -> Cout).
    """
    n, h, w, cin = x.shape
    expand = we is not None
    e = wdw.shape[1]
    p = wp.shape[1]
    assert e % TE == 0 and p % 128 == 0, (e, p)
    nk = e // TE

    # choose (nb, th): largest row block (then images-per-program) whose
    # VMEM model stays under ~6 MB (scoped ceiling 16 MB; round-3 lesson:
    # real usage is several x the nominal windows). Small-spatial layers
    # then pack many images per program — the first hardware A/B showed
    # them per-program-overhead-bound at one image each.
    budget = 6 << 20
    th = h
    while th > 1 and _row_block(th)(w, cin, p) > budget:
        th //= 2
    while h % th:
        th -= 1
    nb = 1
    if th == h:
        while nb < n and n % (nb * 2) == 0 \
                and (nb * 2) * _row_block(th)(w, cin, p) <= budget:
            nb *= 2

    kern = functools.partial(_fused_ir_kernel, act_e=act_e, act_dw=act_dw,
                             act_p=act_p, nb=nb, th=th, h=h, w=w, nk=nk,
                             expand=expand)
    # with an expand conv the window carries the FULL Cin (the expand
    # matmul selects the k-th E chunk); a bare dw+pw pair instead chunks
    # the window's own channel axis by k (Cin == E there)
    xdim = cin if expand else TE
    kx = (lambda k: 0) if expand else (lambda k: k)
    halo = lambda off: pl.BlockSpec(
        (nb, 1, w, xdim),
        lambda ni, i, k, _o=off: (ni, jnp.clip(i * th + _o, 0, h - 1), 0,
                                  kx(k)),
        memory_space=pltpu.VMEM)

    if expand:
        e_specs = [
            pl.BlockSpec((cin, TE), lambda ni, i, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TE), lambda ni, i, k: (0, k),
                         memory_space=pltpu.VMEM),
        ]
        e_args = (we.astype(jnp.bfloat16), be.reshape(1, -1)
                  .astype(jnp.float32))
    else:
        # bare pair: the kernel ignores these refs; pass 1-element dummies
        e_specs = [
            pl.BlockSpec((1, TE), lambda ni, i, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TE), lambda ni, i, k: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        z = jnp.zeros((1, TE), jnp.float32)
        e_args = (z.astype(jnp.bfloat16), z)

    grid = (n // nb, h // th, nk)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            halo(-1),
            pl.BlockSpec((nb, th, w, xdim),
                         lambda ni, i, k: (ni, i, 0, kx(k)),
                         memory_space=pltpu.VMEM),
            halo(th),
            *e_specs,
            pl.BlockSpec((9, TE), lambda ni, i, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TE), lambda ni, i, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TE, p), lambda ni, i, k: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p), lambda ni, i, k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb, th, w, p),
                               lambda ni, i, k: (ni, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, p), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((nb * th * w, p), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * w * (cin * e + 9 * e + e * p),
            bytes_accessed=n * h * w * (cin + p) * 2
            + (cin * e + 9 * e + e * p) * 2,
            transcendentals=0),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), x.astype(jnp.bfloat16), x.astype(jnp.bfloat16),
      *e_args,
      wdw.astype(jnp.bfloat16), bdw.reshape(1, -1).astype(jnp.float32),
      wp.astype(jnp.bfloat16), bp.reshape(1, -1).astype(jnp.float32))
    return out


def pad_fused_weights(we, be, wdw, bdw, wp, bp):
    """Pad fused-BN weights for the kernel: expanded channels E up to a
    multiple of 128 (zero pads in we cols / bdw / wdw / wp ROWS make pad
    lanes contribute exactly 0) and Cout up to a multiple of 128 (caller
    slices the output back). wdw comes in as HWIO (3, 3, 1, E).

    Returns (we, be, wdw9, bdw, wp, bp, cout).
    """
    import numpy as np
    e = wdw.shape[-1]
    ep = _round_up(e, TE)
    cout = wp.shape[-1]
    pp = _round_up(cout, 128)
    wdw9 = np.asarray(wdw).reshape(9, e)
    wdw9 = np.pad(wdw9, ((0, 0), (0, ep - e)))
    bdw = np.pad(np.asarray(bdw).reshape(-1), (0, ep - e))
    # wp: (1, 1, E, Cout) HWIO -> (E, Cout)
    wp2 = np.asarray(wp).reshape(wp.shape[-2], cout)
    wp2 = np.pad(wp2, ((0, ep - e), (0, pp - cout)))
    bp = np.pad(np.asarray(bp).reshape(-1), (0, pp - cout))
    if we is not None:
        cin = we.shape[-2]
        we2 = np.pad(np.asarray(we).reshape(cin, e), ((0, 0), (0, ep - e)))
        be = np.pad(np.asarray(be).reshape(-1), (0, ep - e))
    else:
        we2 = None
    return we2, be, wdw9, bdw, wp2, bp, cout


_FUSABLE_ACTS = ('relu6', 'relu', 'leaky', 'linear', 'none', 'logistic')


def find_fused_triples(graph):
    """Scan a Graph for [1x1 conv] -> [dw3x3 s1 p1] -> [1x1 conv] chains
    whose inner activations feed ONLY the next node (not in last_use),
    i.e. the inverted-residual stacks the fused kernel can collapse.
    Returns [(a, b, c)] node-index triples; also emits (None, b, c) bare
    dw+pw pairs when the dw's predecessor is not a fusable 1x1 but the
    dw channel count is already a whole number of lane tiles."""
    out = []
    nodes = graph.nodes
    last_use = graph.last_use

    def conv(n):
        return n.kind == 'convolutional'

    from pqdet_tpu.model.graph import solve_padding

    def is_pw(n):
        a = n.attrs
        return conv(n) and a['size'] == 1 and a['stride'] == 1 \
            and a['groups'] == 1 and a['activation'] in _FUSABLE_ACTS \
            and solve_padding(a['size'], a['padding'], a['pad']) == 0

    def is_dw_s1(n):
        # the kernel hard-codes SAME padding (pad=1): a valid-padding
        # 3x3 dw (plausible from NAS-mutated cfgs) must not be fused
        a = n.attrs
        return conv(n) and a['size'] == 3 and a['stride'] == 1 \
            and a['groups'] == n.in_channels \
            and n.in_channels == n.out_channels \
            and a['activation'] in _FUSABLE_ACTS \
            and solve_padding(a['size'], a['padding'], a['pad']) == 1

    used = set()
    for i in range(len(nodes) - 2):
        a, b, c = nodes[i], nodes[i + 1], nodes[i + 2]
        if i in used or not (is_pw(a) and is_dw_s1(b) and is_pw(c)):
            continue
        # a and b outputs must be private to the chain (last_use includes
        # the implicit i -> i+1 edge; anything later means a skip ref)
        if last_use.get(a.index, -1) > b.index \
                or last_use.get(b.index, -1) > c.index:
            continue
        out.append((a.index, b.index, c.index))
        used.update((i, i + 1, i + 2))
    for i in range(len(nodes) - 1):
        b, c = nodes[i], nodes[i + 1]
        if i in used or i + 1 in used or not (is_dw_s1(b) and is_pw(c)):
            continue
        if last_use.get(b.index, -1) > c.index or b.in_channels % TE:
            continue
        out.append((None, b.index, c.index))
        used.update((i, i + 1))
    return out


def prepare_fused_ir(network, fused_params, min_e: int = 0,
                     max_stride: int = 0, interpret: bool = False):
    """Build the walk-time fusion table from BN-fused inference params:
    {start_node_index: {kernel kwargs + padded weights + skip set}}.
    ``min_e`` drops blocks whose expanded width is below the
    profitability threshold; ``max_stride`` (>0) drops blocks deeper than
    that cumulative stride — small-spatial blocks are per-program-
    overhead-bound on hardware (both thresholds from the microbench)."""
    table = {}
    nodes = {n.index: n for n in network.graph.nodes}
    for a, b, c in find_fused_triples(network.graph):
        nb, nc = nodes[b], nodes[c]
        if nb.in_channels < min_e:
            continue
        if max_stride and nb.stride > max_stride:
            continue
        pb, pc = fused_params[str(b)], fused_params[str(c)]
        if 'bn' in pb or 'bn' in pc or 'b' not in pb or 'b' not in pc:
            continue  # only BN-fused inference params
        if a is not None:
            pa = fused_params[str(a)]
            if 'bn' in pa or 'b' not in pa:
                continue
            we, be = pa['w'], pa['b']
            act_e = nodes[a].attrs['activation']
        else:
            we = be = None
            act_e = 'linear'
        wep, bep, wdw9, bdwp, wpp, bpp, cout = pad_fused_weights(
            we, be, pb['w'], pb['b'], pc['w'], pc['b'])
        start = a if a is not None else b
        table[start] = dict(
            we=wep, be=bep, wdw=wdw9, bdw=bdwp, wp=wpp, bp=bpp, cout=cout,
            act_e=act_e, act_dw=nodes[b].attrs['activation'],
            act_p=nodes[c].attrs['activation'], interpret=interpret,
            skip=tuple(x for x in (a, b, c) if x is not None and x != start),
            end=c)
    return table


def fused_ir_reference(x, we, be, wdw, bdw, wp, bp, *, act_e='relu6',
                       act_dw='relu6', act_p='linear'):
    """XLA oracle with the same dtype discipline (bf16 convs, f32 accum,
    bf16 inter-stage) for tests and A/B benches. Weight shapes as given
    to pad_fused_weights (unpadded, HWIO dw/pw)."""
    from pqdet_tpu.model import layers as L

    def conv(x, w, stride=1, padding=0, groups=1):
        return jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), jnp.asarray(w, jnp.bfloat16),
            (stride, stride), [(padding, padding)] * 2,
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            feature_group_count=groups,
            preferred_element_type=jnp.float32)

    y = x
    if we is not None:
        e = we.shape[-1]
        y = conv(y, jnp.asarray(we).reshape(1, 1, -1, e))
        y = _apply_act(act_e, y + jnp.asarray(be).reshape(-1))
        y = y.astype(jnp.bfloat16)
    e = wdw.shape[-1]
    y = conv(y, jnp.asarray(wdw).reshape(3, 3, 1, e), padding=1, groups=e)
    y = _apply_act(act_dw, y + jnp.asarray(bdw).reshape(-1))
    y = y.astype(jnp.bfloat16)
    cout = wp.shape[-1]
    y = conv(y, jnp.asarray(wp).reshape(1, 1, e, cout))
    y = _apply_act(act_p, y + jnp.asarray(bp).reshape(-1))
    return y.astype(jnp.bfloat16)
