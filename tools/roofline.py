"""Bytes-based HBM roofline of the bf16 paths (VERDICT r3 next-round #1).

Round 3 argued "the net is depthwise/bandwidth-bound" from fusion *timings*
alone. This tool derives the missing half: per-fusion **bytes moved**
(operand reads + output writes) from the compiled optimized HLO, matches
each instruction to its measured device time from a jax.profiler trace,
and prints achieved GB/s against the v5e HBM peak plus achieved FLOP/s for
convolution fusions — i.e. exactly where each fusion sits on the roofline.

Bytes model: each fusion reads every operand array from HBM once and
writes its output(s) once; values produced and consumed inside the fusion
live in registers/VMEM and never touch HBM. This is XLA's own cost-model
assumption and a *lower bound* on traffic (layout padding, spills and
convolution im2col scratch add more), so "dur <= ~1.3x bytes/BW" proves
bandwidth-bound conservatively.

Usage (real chip):
    python tools/roofline.py train [bs]     # train step (default bs=32)
    python tools/roofline.py forward [bs]   # serving forward (default 16)
"""

from __future__ import annotations

import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_HBM_GBS = 819.0    # v5e HBM bandwidth (public spec, ~819 GB/s)
V5E_BF16_TFLOPS = 197.0  # v5e bf16 MXU peak

_DTYPE_BYTES = {
    'pred': 1, 's8': 1, 'u8': 1, 's4': 1, 'u4': 1,
    'bf16': 2, 'f16': 2, 's16': 2, 'u16': 2, 'f8e4m3fn': 1, 'f8e5m2': 1,
    'f32': 4, 's32': 4, 'u32': 4,
    'f64': 8, 's64': 8, 'u64': 8,
}

_SHAPE_RE = re.compile(r'\b(' + '|'.join(_DTYPE_BYTES) + r')\[([\d,]*)\]')


def _shape_bytes(text: str) -> int:
    """Total bytes of every array shape literal in `text` (handles tuple
    shapes by summing members). Logical sizes — no layout padding."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(text):
        n = 1
        for d in dims.split(','):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def _matching_paren(s: str, start: int) -> int:
    depth = 0
    for i in range(start, len(s)):
        if s[i] == '(':
            depth += 1
        elif s[i] == ')':
            depth -= 1
            if depth == 0:
                return i
    return len(s) - 1


_INSTR_RE = re.compile(r'^\s*(?:ROOT\s+)?%?([\w.\-]+)\s+=\s+(.*)$')
_COMP_RE = re.compile(r'^(?:ENTRY\s+)?%?([\w.\-]+)\s+\(.*\)\s*->')


def parse_hlo(hlo_text: str):
    """-> (info, conv_flops_per_computation).

    Two passes: pass 1 records every instruction's output shape/bytes and
    raw text; pass 2 resolves operand bytes BY NAME (HLO text does not
    always inline operand shapes) and computes convolution FLOPs from the
    resolved kernel-operand shape."""
    raw = {}           # name -> (out_shape_str, opcode, operands_str, tail)
    comp_of = {}
    cur_comp = None
    for line in hlo_text.splitlines():
        mc = _COMP_RE.match(line)
        if mc and '=' not in line.split('->')[0]:
            cur_comp = mc.group(1)
            continue
        m = _INSTR_RE.match(line)
        if not m:
            continue
        name, rhs = m.groups()
        # "<shape>{layout with T(8,128) parens} opcode(operands), attrs" —
        # the opcode is the first SPACE-preceded lowercase token followed
        # by '(' (layout tile parens are preceded by ':' or ')')
        mop = re.search(r'\s([a-z][\w\-]*)\(', rhs)
        if not mop:
            continue
        out_shape, opcode = rhs[:mop.start()], mop.group(1)
        p = mop.end() - 1
        endp = _matching_paren(rhs, p)
        raw[name] = (out_shape, opcode, rhs[p + 1:endp], rhs[endp + 1:])
        comp_of[name] = cur_comp

    def _dims(shape_str):
        m = _SHAPE_RE.search(shape_str)
        return [int(d) for d in m.group(2).split(',') if d] if m else []

    info = {}
    conv_flops = defaultdict(float)
    for name, (out_shape, opcode, operands_str, tail) in raw.items():
        operand_names = re.findall(r'%([\w.\-]+)', operands_str)
        out_bytes = _shape_bytes(out_shape)
        op_bytes = 0
        for op in operand_names:
            if op in raw:
                op_bytes += _shape_bytes(raw[op][0])
        if op_bytes == 0:  # operand shapes inlined instead (some printers)
            op_bytes = _shape_bytes(operands_str)
        if opcode in ('slice', 'dynamic-slice', 'gather', 'slice-start',
                      'slice-done', 'dynamic-slice-start',
                      'dynamic-slice-done'):
            # a slice reads only its window, not the whole operand
            op_bytes = min(op_bytes, out_bytes)
        mcall = re.search(r'calls=%?([\w.\-]+)', tail)
        flops = 0.0
        if opcode == 'convolution' and len(operand_names) >= 2 \
                and operand_names[1] in raw:
            # flops = 2 * out_elems * kh * kw * cin_per_group, with
            # cin_per_group = kernel_elems / (kh * kw * cout_total) and
            # cout_total = the output feature dim (minor in b01f layouts).
            out_dims = _dims(out_shape)
            kdims = _dims(raw[operand_names[1]][0])
            mwin = re.search(r'window={size=(\d+)x(\d+)', tail)
            kh, kw = (int(mwin.group(1)), int(mwin.group(2))) \
                if mwin else (1, 1)
            if out_dims and kdims:
                out_elems = 1
                for d in out_dims:
                    out_elems *= d
                kelems = 1
                for d in kdims:
                    kelems *= d
                cout_total = out_dims[-1]
                cin_pg = max(kelems // max(kh * kw * cout_total, 1), 1)
                flops = 2.0 * out_elems * kh * kw * cin_pg
        info[name] = dict(out_bytes=out_bytes, op_bytes=op_bytes,
                          operands=operand_names, opcode=opcode,
                          flops=flops,
                          calls=mcall.group(1) if mcall else None,
                          comp=comp_of[name])
        if flops:
            conv_flops[comp_of[name]] += flops
    return info, conv_flops


def _dtype_of(text):
    m = _SHAPE_RE.search(text)
    return m.group(1) if m else '?'


def roofline_rows(hlo_text: str, rows):
    """Join tpuprof rows (with per-instruction long_name splits) against
    the HLO bytes model. Returns per-instruction dicts."""
    info, conv_flops = parse_hlo(hlo_text)
    out = []
    misses = []
    for r in rows:
        for iname, us in r.get('long_names', {}).items():
            iname = iname.lstrip('%')
            rec = info.get(iname)
            if rec is None or us <= 0:
                if rec is None:
                    misses.append(iname)
                continue
            bts = rec['out_bytes'] + rec['op_bytes']
            flops = rec['flops'] or (conv_flops.get(rec['calls'], 0.0)
                                     if rec['calls'] else 0.0)
            out.append(dict(name=iname, category=r['name'], us=us,
                            bytes=bts, flops=flops,
                            sample=r.get('samples', {}).get('%' + iname)
                            or r.get('samples', {}).get(iname, '')))
    if misses:
        print(f'[roofline] {len(misses)} trace instructions missing from '
              f'HLO (e.g. {misses[:5]}) — {len(out)} joined, '
              f'{len(info)} HLO instrs '
              f'(e.g. {list(info)[:5]})', file=sys.stderr)
    if not out:
        nln = sum(len(r.get("long_names", {})) for r in rows)
        print(f'[roofline] EMPTY join: {len(rows)} trace rows, '
              f'{nln} long_names', file=sys.stderr)
    return out


def print_roofline(per_instr, reps, title, top=25):
    """Every instruction in these programs executes once per dispatch
    (straight-line graphs, no scan/while on the hot path), so per-step
    us = total_us/reps and per-step bytes = the instruction's bytes.
    x-bound = measured time / (bytes / HBM peak): 1.0 = running exactly at
    the bandwidth bound, >>1 = NOT bandwidth-bound (compute or latency)."""
    total_us = sum(x['us'] for x in per_instr) / reps
    total_mb = sum(x['bytes'] for x in per_instr) / 1e6
    total_tf = sum(x['flops'] for x in per_instr) / 1e12
    print(f'== {title}: {total_us / 1e3:.2f} ms device/step, '
          f'{total_mb:.0f} MB/step moved (bytes model), '
          f'{total_tf * 1e3:.1f} GFLOP conv/step')
    bw_floor_ms = total_mb / 1e3 / V5E_HBM_GBS * 1e3
    print(f'   HBM floor at {V5E_HBM_GBS:.0f} GB/s: {bw_floor_ms:.2f} ms '
          f'-> whole-step runs at {total_us / 1e3 / max(bw_floor_ms, 1e-9):.2f}x '
          f'its bytes bound; '
          f'MXU floor at {V5E_BF16_TFLOPS:.0f} TFLOP/s: '
          f'{total_tf / V5E_BF16_TFLOPS * 1e3:.2f} ms')
    buckets = defaultdict(lambda: [0.0, 0.0, 0.0])
    for x in per_instr:
        b = buckets[x['category']]
        b[0] += x['us'] / reps
        b[1] += x['bytes']
        b[2] += x['flops']
    print(f'{"bucket":30s} {"us/step":>9s} {"MB/step":>8s} {"GB/s":>6s} '
          f'{"x-bound":>8s} {"TFLOP/s":>8s}')
    for cat, (us, bts, fl) in sorted(buckets.items(),
                                     key=lambda kv: -kv[1][0]):
        gbs = bts / max(us, 1e-9) / 1e3
        bound_us = bts / V5E_HBM_GBS / 1e3
        tf = fl / max(us, 1e-9) / 1e6
        print(f'{cat[:30]:30s} {us:9.1f} {bts / 1e6:8.2f} {gbs:6.0f} '
              f'{us / max(bound_us, 1e-9):8.2f} {tf:8.1f}')
    print(f'-- top {top} instructions:')
    print(f'{"us/step":>8s} {"MB":>8s} {"GB/s":>6s} {"x-bound":>8s} '
          f'{"TFLOP/s":>8s}  instr')
    for x in sorted(per_instr, key=lambda x: -x['us'])[:top]:
        us = x['us'] / reps
        gbs = x['bytes'] / max(us, 1e-9) / 1e3
        bound_us = x['bytes'] / V5E_HBM_GBS / 1e3
        tf = x['flops'] / max(us, 1e-9) / 1e6
        print(f'{us:8.1f} {x["bytes"] / 1e6:8.2f} {gbs:6.0f} '
              f'{us / max(bound_us, 1e-9):8.2f} {tf:8.1f}  '
              f'{(x["sample"] or x["name"])[:110]}')


def _trace_rows(run, reps):
    from tools.tpuprof import profile_device_ops
    rows, total = profile_device_ops(run, merge_fusion_ids=True)
    return rows, total


def main_train(bs=32, model='mobilenetv2-fpn'):
    import jax
    sys.path.insert(0, '/root/repo')
    from bench_train import _setup
    jstep, carry, batch = _setup(bs, 512, model=model)
    params, state, opt_state = carry
    rngs = jax.random.split(jax.random.PRNGKey(1), 9)
    params, state, opt_state, m = jstep(params, state, opt_state, batch,
                                        rngs[0])
    jax.block_until_ready(m['loss'])
    # compiled HLO of the exact executable that ran
    hlo = jstep.lower(params, state, opt_state, batch,
                      rngs[0]).compile().as_text()

    def run():
        p, s, o = params, state, opt_state
        last = None
        for i in range(8):
            p, s, o, last = jstep(p, s, o, batch, rngs[i + 1])
        jax.block_until_ready(last['loss'])

    rows, total = _trace_rows(run, 8)
    per_instr = roofline_rows(hlo, rows)
    print_roofline(per_instr, 8, f'{model} bs={bs} train step')


def main_forward(bs=16, model='mobilenetv2-fpn', s2d=0):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pqdet_tpu.model.network import DetectionNetwork, fuse_params
    from pqdet_tpu.zoo import get_cfg

    net = DetectionNetwork.from_cfg(get_cfg(model))
    params, state = net.init(jax.random.PRNGKey(0))
    fused = fuse_params(net, params, state)

    @jax.jit
    def fwd(p, x):
        preds, _ = net.apply(p, {}, x, compute_dtype=jnp.bfloat16,
                             s2d_stem=s2d)
        return preds

    x = jnp.asarray(np.random.RandomState(0)
                    .rand(bs, 512, 512, 3).astype(np.float32))
    out = fwd(fused, x)
    jax.block_until_ready(out)
    hlo = fwd.lower(fused, x).compile().as_text()

    def run():
        last = None
        for _ in range(8):
            last = fwd(fused, x)
        jax.block_until_ready(last)

    rows, total = _trace_rows(run, 8)
    per_instr = roofline_rows(hlo, rows)
    tag = f' s2d_stem={s2d}' if s2d else ''
    print_roofline(per_instr, 8, f'{model} bs={bs} forward{tag}')


def main_forward_s2d(bs=16, model='mobilenetv2-fpn'):
    main_forward(bs, model, s2d=2)


def main_int8(bs=16, model='mobilenetv2-fpn'):
    """Requant-edge bytes accounting for the int8 executor (VERDICT r3
    next-round #4): every XLA fusion around the Pallas conv custom-calls is
    requant/dequant/layout traffic; the bytes table quantifies whether a
    fusable residue remains or the pixel-scaling edges close the case."""
    # a plain jitted forward dispatched 8 times — NOT the unrolled chain:
    # chain copies are distinct instructions each executing once per
    # dispatch, which breaks per-instruction counting (the round-3
    # tpuprof lesson, CLAUDE.md)
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pqdet_tpu.compress.qat import QuantCtx, prepare_qat_state
    from pqdet_tpu.compress.quantized import Int8Inference, convert_to_int8
    from pqdet_tpu.model.network import DetectionNetwork
    from pqdet_tpu.zoo import get_cfg

    net = DetectionNetwork.from_cfg(get_cfg(model), quant=True)
    params, state = net.init(jax.random.PRNGKey(0))
    params, state = prepare_qat_state(net, params, state)
    rng = np.random.RandomState(0)
    xc = jnp.asarray(rng.rand(bs, 512, 512, 3), jnp.float32)

    @jax.jit
    def observe_fwd(p, s, x):
        ctx = QuantCtx(s['quant'], observing=True)
        net.apply(p, s, x, quant_ctx=ctx)
        return ctx.new_obs

    state = {**state, 'quant': jax.device_get(observe_fwd(params, state,
                                                          xc))}
    state = jax.tree.map(np.asarray, state)
    qparams = Int8Inference.prepare(convert_to_int8(net, params, state),
                                    network=net)
    int8 = Int8Inference(net, mode='pallas', act=qparams['act'])
    fwd = jax.jit(int8.apply)
    x = jnp.asarray(rng.rand(bs, 512, 512, 3), jnp.float32)
    jax.block_until_ready(fwd(qparams, x))
    hlo = fwd.lower(qparams, x).compile().as_text()

    def run():
        last = None
        for _ in range(8):
            last = fwd(qparams, x)
        jax.block_until_ready(last)

    rows, total = _trace_rows(run, 8)
    per_instr = roofline_rows(hlo, rows)
    print_roofline(per_instr, 8, f'{model} bs={bs} int8 forward', top=30)


if __name__ == '__main__':
    mode = sys.argv[1] if len(sys.argv) > 1 else 'train'
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else (32 if mode == 'train'
                                                     else 16)
    model = sys.argv[3] if len(sys.argv) > 3 else 'mobilenetv2-fpn'
    {'train': main_train, 'forward': main_forward,
     'forward-s2d': main_forward_s2d, 'int8': main_int8}[mode](bs, model)
