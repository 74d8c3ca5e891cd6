"""Per-layer bisect of Int8Inference executor modes on a REAL quantized
checkpoint: runs 'pallas' (fast serving path) and 'int' (exact XLA
reference semantics) over the same batch with intermediates captured, and
reports the first graph node whose fp32 output diverges.

Both modes compute the SAME exact integer algebra, so intermediate
quantized edges must agree bit-for-bit (fp views to ~1e-4); a divergence
localises a kernel/lowering bug to one node, whose shape/attrs print.

    python tools/bisect_int8_layers.py --weight /tmp/weights/clutter_int8.ckpt \
        [--bs 16] [--size 512] [--image /tmp/clutter8k/JPEGImages/c0001.jpg]

On CPU the Pallas kernels run in interpret mode (expected: zero diff —
the known failure class is a hardware-only Mosaic miscompile).
"""

import argparse
import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--weight', default='/tmp/weights/clutter_int8.ckpt')
    ap.add_argument('--bs', type=int, default=16)
    ap.add_argument('--size', type=int, default=512)
    ap.add_argument('--image', default='')
    # Benign floor: 'pallas' (recentred-s8) and 'int' (zero-point) round
    # ties differently, so +-1-level disagreements accumulate downstream —
    # measured max rel ~0.23 on CPU over the full clutter_int8 graph with
    # identical preds-level AP. A miscompile shows rel >= O(1) garbage.
    ap.add_argument('--tol', type=float, default=0.35)
    ap.add_argument('--modes', nargs=2, default=['pallas', 'int'])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pqdet_tpu.compress.quantized import Int8Inference, load_quantized

    network, qparams = load_quantized(args.weight)
    nodes = {str(n.index): n for n in network.graph.nodes}

    rng = np.random.RandomState(0)
    if args.image:
        import cv2
        img = cv2.cvtColor(cv2.imread(args.image), cv2.COLOR_BGR2RGB)
        img = cv2.resize(img, (args.size, args.size)).astype(np.float32)
        img = (img / 255.0 - [0.485, 0.456, 0.406]) / [0.229, 0.224, 0.225]
        x = np.broadcast_to(img, (args.bs,) + img.shape).astype(np.float32)
    else:
        x = rng.randn(args.bs, args.size, args.size, 3).astype(np.float32)
    x = jnp.asarray(x)

    results = {}
    for mode in args.modes:
        exe = Int8Inference(network, mode=mode, act=qparams['act'])
        qp = Int8Inference.prepare(qparams, mode=mode, network=network)
        fn = jax.jit(functools.partial(exe.apply, intermediates=True))
        preds, inter = fn(qp, x)
        results[mode] = (np.asarray(preds),
                         {k: np.asarray(v) for k, v in inter.items()})
        print(f'[{mode}] preds abs-mean {np.abs(results[mode][0]).mean():.4f}'
              f' obj-mean {results[mode][0][..., 4].mean():.4f}', flush=True)

    ma, mb = args.modes
    (pa, ia), (pb, ib) = results[ma], results[mb]
    first_bad = None
    # jit canonicalises dict outputs to lexicographic key order; walk the
    # true graph order so "first divergence" means first in execution
    for key in sorted(ia, key=int):
        if key not in ib:
            continue
        a, b = ia[key], ib[key]
        if a.shape != b.shape:
            print(f'node {key}: SHAPE {a.shape} vs {b.shape}')
            continue
        err = np.abs(a.astype(np.float64) - b.astype(np.float64))
        scale = max(np.abs(b).max(), 1e-6)
        n = nodes[key]
        tag = f'{n.kind}'
        if n.kind == 'convolutional':
            tag += (f" s{n.attrs['size']} st{n.attrs['stride']}"
                    f" g{n.attrs['groups']} f{n.attrs['filters']}")
        line = (f'node {key:>3} {tag:<28} out{a.shape!s:<22} '
                f'max {err.max():9.4f} med {np.median(err):9.5f} '
                f'rel {err.max() / scale:8.5f}')
        bad = err.max() / scale > args.tol
        if bad and first_bad is None:
            first_bad = key
            line += '   <-- FIRST DIVERGENCE'
        print(line, flush=True)
    perr = np.abs(pa - pb)
    print(f'preds: max {perr.max():.5f} med {np.median(perr):.6f}')
    if first_bad is None:
        print('NO divergence above tol — executors agree on this input.')
    else:
        n = nodes[first_bad]
        print(f'first divergent node: {first_bad} kind={n.kind} '
              f'attrs={n.attrs}')


if __name__ == '__main__':
    main()
