"""Per-shape A/B of depthwise int8 implementations on the real chip.

Variants (all exact integer semantics, requant epilogue included):
- pallas : ops/pallas_qconv.qdwconv3x3_s8 (s8 window, VPU tap FMAs)
- native : lax.conv_general_dilated on RECENTRED-INT-valued bf16 tensors
           (s8 values are exact in bf16; the MXU accumulates f32, so the
           integer accumulation is exact: |acc| <= 9*127*127 << 2^24),
           feature_group_count=C, requant fused by XLA into the epilogue
- xla    : the 9 unrolled tap-slice FMA fusion (compress.quantized._xla_dw3x3)

Run: python tools/microbench_dw.py [bs]
Prints one line per (shape, variant): us/layer-call from a chained jit.
"""

import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np

SHAPES = [  # (h, c, stride) — every dw shape in mobilenetv2-fpn @512
    (256, 32, 1), (256, 96, 2), (128, 144, 1), (128, 144, 2),
    (64, 192, 1), (64, 192, 2), (32, 384, 1), (32, 576, 1), (32, 576, 2),
    (16, 960, 1), (16, 512, 1), (32, 256, 1), (64, 128, 1),
]
CHAIN = 12


def native_dw(xq, wf_bf16, w_scale, b, colsum, stride, x_zp, out_sz):
    import jax
    import jax.numpy as jnp
    pad_val = np.float32(round(x_zp) - 128)
    xf = xq.astype(jnp.bfloat16)
    xf = jnp.pad(xf, ((0, 0), (1, 1), (1, 1), (0, 0)),
                 constant_values=jnp.bfloat16(pad_val))
    acc = jax.lax.conv_general_dilated(
        xf, wf_bf16, window_strides=(stride, stride), padding=((0, 0), (0, 0)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=xq.shape[-1],
        preferred_element_type=jnp.float32)
    alpha = w_scale  # x_scale folded into requant scale for the bench
    beta = alpha * ((128.0 - x_zp) * colsum) + b
    y = jnp.maximum(acc * alpha + beta, 0.0)
    os_, ozp = out_sz
    return jnp.clip(jnp.round(y / os_ + (ozp - 128.0)),
                    -128, 127).astype(jnp.int8)


def bench_variant(fn, x):
    """TRUE device time per layer call from a profiler trace (wall clock
    through the axon tunnel has a ~25 ms per-dispatch floor that buries
    sub-ms kernels)."""
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
    # exclude the chain's own glue (reduce + xor fusions are a few us);
    # report total device time per iteration
    return total / CHAIN


def main():
    import jax.numpy as jnp
    from functools import partial
    from pqdet_tpu.compress.quantized import _xla_dw3x3
    from pqdet_tpu.ops.pallas_qconv import qdwconv3x3_s8

    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    shapes = SHAPES
    if len(sys.argv) > 2:  # derive dw shapes from a cfg (e.g. pruned graph)
        from pqdet_tpu.model.graph import Graph
        size = int(sys.argv[3]) if len(sys.argv) > 3 else 512
        g = Graph.from_cfg(sys.argv[2])
        shapes = sorted({(size // (n.stride // n.attrs['stride']),
                          n.attrs['filters'], n.attrs['stride'])
                         for n in g.nodes if n.kind == 'convolutional'
                         and n.attrs['size'] == 3
                         and n.attrs['groups'] == n.attrs['filters']},
                        reverse=True)
        print(f'dw shapes from {sys.argv[2]} @ {size}: {shapes}')
    rng = np.random.RandomState(0)
    x_zp, out_sz = 117.0, (0.05, 9.0)
    print(f'bs={bs} (us per layer call, chained-jit, includes ~1/{CHAIN} '
          f'dispatch)')
    for h, c, stride in shapes:
        x = jnp.asarray(rng.randint(-128, 128, (bs, h, h, c)), jnp.int8)
        w = rng.randint(-127, 128, (3, 3, c)).astype(np.int8)
        w_scale = jnp.asarray((rng.rand(c) * 0.01 + 0.001), jnp.float32)
        b = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
        colsum = jnp.asarray(w.astype(np.int32).sum((0, 1)), jnp.float32)
        wf = jnp.asarray(w.reshape(3, 3, 1, c), jnp.bfloat16)
        wq = jnp.asarray(w)
        pv = np.int8(round(x_zp) - 128)

        res = {}
        res['pallas'] = bench_variant(
            lambda xx: qdwconv3x3_s8(xx, wq, w_scale, b, act='relu',
                                     stride=stride, x_scale=0.02, x_zp=x_zp,
                                     out_scale=out_sz[0], out_zp=out_sz[1]), x)
        res['native'] = bench_variant(
            partial(native_dw, wf_bf16=wf, w_scale=w_scale, b=b,
                    colsum=colsum, stride=stride, x_zp=x_zp, out_sz=out_sz), x)
        res['xla'] = bench_variant(
            lambda xx: _xla_dw3x3(xx, wq, w_scale, b, stride,
                                  (0.02, x_zp), out_sz, 'relu', pv), x)

        def s8_dw(xx):
            # s8 x s8 -> s32 native depthwise: half the input traffic of
            # the bf16 exact-int trick IF the TPU backend lowers grouped
            # int8 convs well (the open question this row answers)
            import jax
            xs = jnp.pad(xx, ((0, 0), (1, 1), (1, 1), (0, 0)),
                         constant_values=pv)
            acc = jax.lax.conv_general_dilated(
                xs, wq.reshape(3, 3, 1, c), (stride, stride),
                ((0, 0), (0, 0)),
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                feature_group_count=c, preferred_element_type=jnp.int32)
            alpha = w_scale
            beta = alpha * ((128.0 - x_zp) * colsum) + b
            y = jnp.maximum(acc.astype(jnp.float32) * alpha + beta, 0.0)
            os_, ozp = out_sz
            return jnp.clip(jnp.round(y / os_ + (ozp - 128.0)),
                            -128, 127).astype(jnp.int8)
        res['s8'] = bench_variant(s8_dw, x)
        best = min(res, key=res.get)
        print(f'  {h:4d}x{h:<4d} c={c:<4d} s{stride}: ' +
              '  '.join(f'{k}={v:7.1f}' for k, v in res.items()) +
              f'   -> {best}', flush=True)


if __name__ == '__main__':
    main()
