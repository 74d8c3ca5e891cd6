"""Single-layer repro for the hardware int8 divergence localised by
tools/bisect_int8_layers.py (clutter ladder, pruned graph): node 4, a
stride-2 depthwise 3x3 (g=80), runs _native_dw3x3 under the bs>=8 auto
policy and shows a CONSTANT fp offset (max == med == 15.1057) vs the
exact-int executor on TPU, while the same code is exact on CPU.

Runs every dw impl ('native', 'xla', 'pallas') on the SAME real-ckpt
qparams and a real recentred-s8 input (node 3's output from the exact
executor), against the int8_conv oracle, printing per-impl level-diff
stats. One jit per impl, so a wedged tunnel costs one compile.

    python tools/repro_native_dw.py [--weight /tmp/weights/clutter_int8.ckpt]
        [--bs 16] [--size 512] [--node 4]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--weight', default='/tmp/weights/clutter_int8.ckpt')
    ap.add_argument('--bs', type=int, default=16)
    ap.add_argument('--size', type=int, default=512)
    ap.add_argument('--node', type=int, default=4)
    args = ap.parse_args()

    import functools

    import jax
    import jax.numpy as jnp

    from pqdet_tpu.compress.quantized import (
        Int8Inference, _native_dw3x3, _quant_s8, _s8_dw3x3, _xla_dw3x3,
        int8_conv, load_quantized)
    from pqdet_tpu.ops.pallas_qconv import qdwconv3x3_s8

    print(f'backend={jax.default_backend()}', flush=True)
    network, qparams = load_quantized(args.weight)
    node = {n.index: n for n in network.graph.nodes}[args.node]
    a = node.attrs
    assert node.kind == 'convolutional' and a['groups'] == a['filters']
    c, stride = a['filters'], a['stride']
    key = str(node.index)
    prev_key = str(node.index - 1)

    # real recentred-s8 input: the previous node's output from the exact
    # 'int' executor (u8 levels), recentred to s8
    exe = Int8Inference(network, mode='int')
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(args.bs, args.size, args.size, 3)
                    .astype(np.float32))
    _, inter = jax.jit(functools.partial(exe.apply, intermediates=True))(
        qparams, x)
    act = qparams['act']
    prev_sz = act[prev_key]
    x_fp = np.asarray(inter[prev_key])  # fp view of the dw input
    xq_u8 = np.clip(np.round(x_fp / prev_sz[0] + prev_sz[1]), 0, 255)
    x_s8 = jnp.asarray((xq_u8 - 128).astype(np.int8))
    print(f'node {args.node}: dw3x3 s{stride} c{c} '
          f'in {x_s8.shape} x_sz {tuple(prev_sz)}', flush=True)

    p = qparams['layers'][key]
    wq = np.asarray(p['wq'])          # (3, 3, 1, C) int8 HWIO
    w_scale = jnp.asarray(p['w_scale'])
    b = jnp.asarray(p['b'])
    out_edge = tuple(act[key]) if key in act else None
    x_sz = (float(prev_sz[0]), float(prev_sz[1]))
    pad_val = jnp.int8(int(round(x_sz[1])) - 128)

    # oracle: exact s32 integer conv on u8 levels
    def oracle():
        acc = int8_conv(jnp.asarray(xq_u8.astype(np.uint8)), x_sz,
                        jnp.asarray(wq), w_scale, b,
                        stride=stride, padding=1, groups=c)
        import pqdet_tpu.model.layers as L
        y = L.apply_activation(a['activation'], acc)
        return _quant_s8(y, out_edge) if out_edge else y
    ref = np.asarray(jax.jit(oracle)())

    wdw = jnp.asarray(wq.reshape(3, 3, c))
    impls = {
        'native': lambda: _native_dw3x3(x_s8, wdw, w_scale, b, stride,
                                        x_sz, out_edge, a['activation'],
                                        pad_val),
        'xla': lambda: _xla_dw3x3(x_s8, wdw, w_scale, b, stride,
                                  x_sz, out_edge, a['activation'], pad_val),
        's8': lambda: _s8_dw3x3(x_s8, wdw, w_scale, b, stride,
                                x_sz, out_edge, a['activation'], pad_val),
        'pallas': lambda: qdwconv3x3_s8(
            x_s8, wdw, w_scale, b, stride=stride, act=a['activation'],
            x_scale=x_sz[0], x_zp=x_sz[1],
            out_scale=out_edge[0] if out_edge else None,
            out_zp=out_edge[1] if out_edge else None,
            interpret=jax.default_backend() != 'tpu'),
    }
    for name, fn in impls.items():
        try:
            got = np.asarray(jax.jit(fn)())
        except Exception as e:  # noqa: BLE001 - survey run, report and go on
            print(f'{name:>7}: ERROR {type(e).__name__}: {e}', flush=True)
            continue
        d = np.abs(got.astype(np.int32) - ref.astype(np.int32))
        lv, cnt = np.unique(d, return_counts=True)
        top = ', '.join(f'{l}:{c_}' for l, c_ in
                        sorted(zip(lv, cnt), key=lambda t: -t[1])[:5])
        print(f'{name:>7}: max level diff {d.max():>3} med {np.median(d):g} '
              f'frac>1 {(d > 1).mean():.4f}  hist[{top}]', flush=True)


if __name__ == '__main__':
    main()
