"""A/B the three 1x1-conv serving formulations at real model shapes
(real TPU, per-op device times from a jax.profiler trace):

  bf16   : XLA native conv, bf16 in/out (the fp serving path)
  xla_s8 : XLA native conv on s8 x s8 -> s32 (int8 MXU), requant
           (scale/clamp/round -> s8) left to XLA output fusion
  pallas : ops.pallas_qconv.qconv1x1_s8 (requant fused in the epilogue)

Each variant runs a DEPTH-deep chain of identical layers inside one jit
so per-layer time excludes dispatch and the tensor layout settles to the
variant's steady state — exactly the seam cost a single-layer microbench
hides (round-3 lesson: the mixed auto-policy lost 3.7 ms/fwd to layout
copies between custom-call and XLA-conv layouts at bs=16).

Run:  python tools/microbench_conv1x1.py [batch]
"""

import sys

sys.path.insert(0, '/root/repo')

import numpy as np

DEPTH = 8

# (h, w, cin, cout): the mobilenetv2-fpn@512 1x1 trunk shapes that
# dominate qconv1x1 device time (compress/quantized.py dispatch)
SHAPES = [
    (256, 256, 32, 96),
    (128, 128, 144, 24),
    (64, 64, 192, 64),
    (32, 32, 576, 96),
    (16, 16, 960, 320),
]


def _trace_ms(fn):
    from tools.tpuprof import profile_device_ops
    _, total = profile_device_ops(fn)
    return total / 1e3


def bench_bf16(n, h, w, cin, cout, reps=4):
    import jax
    import jax.numpy as jnp
    rng = np.random.RandomState(0)
    w0 = jnp.asarray(rng.randn(1, 1, cin, cout) * 0.1, jnp.bfloat16)
    wb = jnp.asarray(rng.randn(1, 1, cout, cin) * 0.1, jnp.bfloat16)

    @jax.jit
    def chain(x, w0, wb):
        for _ in range(DEPTH // 2):
            y = jax.lax.conv_general_dilated(
                x, w0, (1, 1), 'VALID',
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
            y = jnp.maximum(y, 0)
            x = jax.lax.conv_general_dilated(
                y, wb, (1, 1), 'VALID',
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
            x = jnp.maximum(x, 0)
        return x.astype(jnp.float32).sum()

    x = jnp.asarray(rng.rand(n, h, w, cin), jnp.bfloat16)
    float(chain(x, w0, wb))
    return _trace_ms(lambda: float(chain(x, w0, wb))) / DEPTH


def bench_xla_s8(n, h, w, cin, cout, reps=4):
    import jax
    import jax.numpy as jnp
    rng = np.random.RandomState(0)

    def conv(x, wq, sc):
        acc = jax.lax.conv_general_dilated(
            x, wq, (1, 1), 'VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * sc            # per-channel requant
        y = jnp.maximum(y, 0)
        return jnp.clip(jnp.round(y), -128, 127).astype(jnp.int8)

    w0 = jnp.asarray(rng.randint(-127, 128, (1, 1, cin, cout)), jnp.int8)
    wb = jnp.asarray(rng.randint(-127, 128, (1, 1, cout, cin)), jnp.int8)
    s0 = jnp.asarray(rng.rand(cout) * 1e-3, jnp.float32)
    sb = jnp.asarray(rng.rand(cin) * 1e-3, jnp.float32)

    @jax.jit
    def chain(x, w0, wb, s0, sb):
        for _ in range(DEPTH // 2):
            x = conv(conv(x, w0, s0), wb, sb)
        return x.astype(jnp.float32).sum()

    x = jnp.asarray(rng.randint(-128, 128, (n, h, w, cin)), jnp.int8)
    float(chain(x, w0, wb, s0, sb))
    return _trace_ms(lambda: float(chain(x, w0, wb, s0, sb))) / DEPTH


def bench_pallas(n, h, w, cin, cout, reps=4):
    import jax
    import jax.numpy as jnp
    from pqdet_tpu.ops.pallas_qconv import qconv1x1_s8
    rng = np.random.RandomState(0)
    w0 = jnp.asarray(rng.randint(-127, 128, (cin, cout)), jnp.int8)
    wb = jnp.asarray(rng.randint(-127, 128, (cout, cin)), jnp.int8)
    s0 = jnp.asarray(rng.rand(cout) * 1e-3, jnp.float32)
    sb = jnp.asarray(rng.rand(cin) * 1e-3, jnp.float32)
    b0 = jnp.zeros(cout, jnp.float32)
    bb = jnp.zeros(cin, jnp.float32)

    c0 = jnp.sum(w0.astype(jnp.int32), axis=0)
    cb = jnp.sum(wb.astype(jnp.int32), axis=0)

    @jax.jit
    def chain(x, w0, wb, s0, sb):
        for _ in range(DEPTH // 2):
            y = qconv1x1_s8(x, w0, s0, b0, c0, act='relu',
                            x_scale=1e-2, x_zp=128.0,
                            out_scale=1e-2, out_zp=0.0)
            x = qconv1x1_s8(y, wb, sb, bb, cb, act='relu',
                            x_scale=1e-2, x_zp=128.0,
                            out_scale=1e-2, out_zp=0.0)
        return x.astype(jnp.float32).sum()

    x = jnp.asarray(rng.randint(-128, 128, (n, h, w, cin)), jnp.int8)
    float(chain(x, w0, wb, s0, sb))
    return _trace_ms(lambda: float(chain(x, w0, wb, s0, sb))) / DEPTH


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    import inspect
    from pqdet_tpu.ops import pallas_qconv
    sig = inspect.signature(pallas_qconv.qconv1x1_s8)
    print(f'batch={n}  (qconv1x1_s8 params: {list(sig.parameters)})')
    print(f'{"shape":24s} {"bf16":>9s} {"xla_s8":>9s} {"pallas":>9s}')
    for h, w, cin, cout in SHAPES:
        r = {}
        for tag, fn in (('bf16', bench_bf16), ('xla_s8', bench_xla_s8),
                        ('pallas', bench_pallas)):
            try:
                r[tag] = fn(n, h, w, cin, cout) * 1e3  # us/layer
            except Exception as e:
                print(f'  [{tag} failed: {str(e).splitlines()[0][:90]}]')
                r[tag] = float('nan')
        print(f'{h}x{w}x{cin}->{cout:<6d} {r["bf16"]:9.1f} '
              f'{r["xla_s8"]:9.1f} {r["pallas"]:9.1f}   us/layer',
              flush=True)


if __name__ == '__main__':
    main()
