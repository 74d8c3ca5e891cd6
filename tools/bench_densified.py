"""Per-shape A/B of DENSIFIED grouped-3x3 int8 implementations (RegNet
stacks) on the real chip at a given batch size.

The regnety-400m-fpn bs=1 int8 profile (2026-08-19) shows 2.5 ms/fwd of
s32 s8-conv fusions + 0.6 ms of s8 layout copies where the bf16 fp path
runs the same shapes in ~0.4 ms total — XLA's TPU backend lowers dense
int8 convs poorly at bs=1. Variants (all exact integer semantics with the
requant epilogue):

- s8   : native s8 x s8 -> s32 conv on block-diagonal dense weights
         (_xla_conv3x3_s8 — the executor's default nat_impl)
- bf16 : exact-int bf16 conv, f32 accum (_native_conv3x3)
- im2col: XLA-level patch views into the fused Pallas 1x1 MXU kernel
         (the stem trick generalised: stride 1 = 9 plain slices, stride 2
         = row-parity bitcast views)

Run: python tools/bench_densified.py [bs] [model]
"""

import sys

sys.path.insert(0, '/root/repo')

import numpy as np

CHAIN = 12


def bench_variant(fn, x):
    import jax
    import jax.numpy as jnp
    from tools.tpuprof import profile_device_ops

    @jax.jit
    def chain(x):
        acc = jnp.int32(0)
        for _ in range(CHAIN):
            y = fn(x)
            s = y.astype(jnp.int32).sum()
            acc = acc + s
            x = jnp.bitwise_xor(x, (s % 2).astype(x.dtype))
        return acc

    int(chain(x))
    rows, total = profile_device_ops(lambda: int(chain(x)))
    return total / CHAIN


def main():
    import jax.numpy as jnp
    from pqdet_tpu.compress.quantized import (_densify_int8_weight,
                                              _native_conv3x3,
                                              _stem_im2col_small_batch,
                                              _xla_conv3x3_s8)
    from pqdet_tpu.model.graph import Graph
    from pqdet_tpu.ops.pallas_qconv import qconv1x1_s8
    from pqdet_tpu.zoo import get_cfg

    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    model = sys.argv[2] if len(sys.argv) > 2 else 'regnety-400m-fpn'
    size = 512
    g = Graph.from_cfg(get_cfg(model))
    shapes = {}
    for n in g.nodes:
        if n.kind != 'convolutional':
            continue
        a = n.attrs
        if a['size'] == 3 and a['groups'] > 1 and a['groups'] != a['filters']:
            hin = size // (n.stride // a['stride'])
            key = (hin, n.in_channels, a['filters'], a['stride'], a['groups'])
            shapes[key] = shapes.get(key, 0) + 1

    rng = np.random.RandomState(0)
    x_sz = (0.05, 121.0)
    out_edge = (0.04, 131.0)
    pv = np.int8(round(x_sz[1]) - 128)
    print(f'bs={bs} {model} (us per layer call, device time via tpuprof)')
    for (h, cin, cout, stride, groups), count in sorted(shapes.items(),
                                                        reverse=True):
        x = jnp.asarray(rng.randint(-128, 128, (bs, h, h, cin)), jnp.int8)
        wg = rng.randint(-127, 128, (3, 3, cin // groups, cout)) \
            .astype(np.int8)
        wq = _densify_int8_weight(wg, groups)           # (3,3,cin,cout)
        w_scale = jnp.asarray(rng.rand(cout) * 0.01 + 0.001, jnp.float32)
        b = jnp.asarray(rng.randn(cout) * 0.1, jnp.float32)
        colsum = jnp.asarray(wq.astype(np.int32).sum((0, 1, 2)), jnp.float32)
        wnat = jnp.asarray(wq)
        wim = jnp.asarray(wq.reshape(9 * cin, cout))
        wim_cs = jnp.asarray(wq.reshape(9 * cin, cout).astype(np.int64)
                             .sum(0).astype(np.int32))
        wp = np.zeros((9 * cin, cout), wq.dtype)
        for kh in range(3):
            base = 3 * cin * kh
            wp[base:base + cin] = wq[kh, 1]
            wp[base + cin:base + 2 * cin] = wq[kh, 2]
            wp[base + 2 * cin:base + 3 * cin] = wq[kh, 0]
        p = {'wim': wim, 'wim_colsum': wim_cs,
             'wim_p': jnp.asarray(wp),
             'wim_p_colsum': jnp.asarray(wp.astype(np.int64).sum(0)
                                         .astype(np.int32)),
             'w_scale': w_scale, 'b': b}
        common = dict(act='relu', x_scale=x_sz[0], x_zp=x_sz[1],
                      out_scale=out_edge[0], out_zp=out_edge[1])

        res = {}
        res['s8'] = bench_variant(
            lambda xx: _xla_conv3x3_s8(xx, wnat, w_scale, b, colsum,
                                       stride, x_sz, out_edge, 'relu', pv), x)
        res['bf16'] = bench_variant(
            lambda xx: _native_conv3x3(xx, wnat, w_scale, b, colsum,
                                       stride, x_sz, out_edge, 'relu', pv), x)
        res['im2col'] = bench_variant(
            lambda xx: _stem_im2col_small_batch(xx, p, common, stride, pv,
                                                qconv1x1_s8), x)
        best = min(res, key=res.get)
        print(f'  {h:4d}^2 cin={cin:<4d} cout={cout:<4d} s{stride} '
              f'g{groups} x{count}: ' +
              '  '.join(f'{k}={v:7.1f}' for k, v in res.items()) +
              f'   -> {best}', flush=True)


if __name__ == '__main__':
    main()
