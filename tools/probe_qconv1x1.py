"""Shape probe: qconv1x1_s8 (Pallas MXU kernel) vs the exact XLA s8-native
oracle over every 1x1-conv shape of a given model graph on the CURRENT
backend. Both compute identical integer algebra, so requantized outputs
must agree to <= 1 quant level (f32-ulp rounding ties); a large max-level
diff marks a Mosaic miscompile for that shape.

    python tools/probe_qconv1x1.py [--cfg /tmp/weights/clutter_pruned.cfg]
        [--bs 16] [--size 512]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--cfg', default='/tmp/weights/clutter_pruned.cfg')
    ap.add_argument('--bs', type=int, default=16)
    ap.add_argument('--size', type=int, default=512)
    ap.add_argument('--act', default='relu')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pqdet_tpu.compress.quantized import _xla_pw1x1
    from pqdet_tpu.model.network import DetectionNetwork
    from pqdet_tpu.ops.pallas_qconv import qconv1x1_s8

    net = DetectionNetwork.from_cfg(open(args.cfg).read())
    # (h, w, cin, cout) for every groups=1 1x1 conv at this input size
    shapes = []
    for node in net.graph.nodes:
        if node.kind != 'convolutional':
            continue
        a = node.attrs
        if a['size'] != 1 or a['groups'] != 1:
            continue
        hw = args.size // node.stride
        shapes.append((node.index, hw, node.in_channels, a['filters']))
    seen = set()
    rng = np.random.RandomState(0)
    interp = jax.default_backend() != 'tpu'
    print(f'backend={jax.default_backend()} interpret={interp}')
    for idx, hw, cin, cout in shapes:
        key = (hw, cin, cout)
        if key in seen:
            continue
        seen.add(key)
        x = rng.randint(-128, 128, (args.bs, hw, hw, cin)).astype(np.int8)
        w = rng.randint(-127, 128, (cin, cout)).astype(np.int8)
        ws = (rng.rand(cout).astype(np.float32) + 0.5) * 2e-3
        b = rng.randn(cout).astype(np.float32) * 0.02
        colsum = w.astype(np.int32).sum(0)
        x_sz = (0.05, 121.0)
        out_edge = (0.04, 131.0)
        xj, wj = jnp.asarray(x), jnp.asarray(w)
        wsj, bj, csj = jnp.asarray(ws), jnp.asarray(b), jnp.asarray(colsum)
        ref = jax.jit(lambda xj=xj: _xla_pw1x1(
            xj, wj, wsj, bj, csj, x_sz, out_edge, args.act))()
        got = qconv1x1_s8(
            xj, wj, wsj, bj, csj, act=args.act,
            x_scale=x_sz[0], x_zp=x_sz[1],
            out_scale=out_edge[0], out_zp=out_edge[1], interpret=interp)
        d = np.abs(np.asarray(got, np.int32) - np.asarray(ref, np.int32))
        frac = (d > 1).mean()
        status = 'OK ' if d.max() <= 1 else 'BAD'
        print(f'{status} node{idx:>3} ({args.bs},{hw:>3},{hw:>3},{cin:>4}) '
              f'-> {cout:>4}: max level diff {d.max():>3}  frac>1 '
              f'{frac:.4f}', flush=True)


if __name__ == '__main__':
    main()
