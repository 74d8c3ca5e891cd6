"""Profile the int8 vs bf16 serving gap at a given batch size (real TPU).

Round-2 measured bs=16: bf16 8.87 ms/batch vs int8 28.1 (pallas dw) /
25.9 ms (xla dw) — this script answers WHERE the int8 time goes, with true
per-op device times from a jax.profiler trace (wall clock through the axon
tunnel is not trustworthy, CLAUDE.md).

Run:  python tools/profile_int8.py [batch_size] [variants...]
"""

import sys

sys.path.insert(0, '/root/repo')

import numpy as np


def build_bf16(model, batch_size):
    import jax
    import jax.numpy as jnp
    from pqdet_tpu.model.network import (DetectionNetwork,
                                         densify_grouped_convs, fuse_params)
    from pqdet_tpu.zoo import get_cfg

    net = DetectionNetwork.from_cfg(get_cfg(model))
    params, state = net.init(jax.random.PRNGKey(0))
    fused = densify_grouped_convs(net, fuse_params(net, params, state))
    fused = jax.tree.map(lambda x: x.astype(jnp.bfloat16), fused)

    CHAIN = 8

    @jax.jit
    def chain(p, x):
        acc = jnp.float32(0)
        for _ in range(CHAIN):
            y = net.apply(p, {}, x, compute_dtype=jnp.bfloat16)[0]
            s = y.astype(jnp.float32).sum() * 1e-20
            acc = acc + s
            x = x + s.astype(x.dtype)
        return acc

    x = jnp.asarray(np.random.RandomState(0).rand(batch_size, 512, 512, 3),
                    jnp.bfloat16)
    return chain, fused, x, CHAIN


def build_int8(model, batch_size, dw_impl):
    import jax
    import jax.numpy as jnp
    from pqdet_tpu.compress.qat import QuantCtx, prepare_qat_state
    from pqdet_tpu.compress.quantized import Int8Inference, convert_to_int8
    from pqdet_tpu.model.network import DetectionNetwork
    from pqdet_tpu.zoo import get_cfg

    net = DetectionNetwork.from_cfg(get_cfg(model), quant=True)
    params, state = net.init(jax.random.PRNGKey(0))
    params, state = prepare_qat_state(net, params, state)
    rng = np.random.RandomState(0)
    xc = jnp.asarray(rng.rand(batch_size, 512, 512, 3), jnp.float32)

    @jax.jit
    def observe_fwd(p, s, x):
        ctx = QuantCtx(s['quant'], observing=True)
        net.apply(p, s, x, quant_ctx=ctx)
        return ctx.new_obs

    state = {**state, 'quant': jax.device_get(observe_fwd(params, state, xc))}
    state = jax.tree.map(np.asarray, state)
    qparams = Int8Inference.prepare(convert_to_int8(net, params, state),
                                    network=net)
    int8 = Int8Inference(net, mode='pallas', act=qparams['act'],
                         dw_impl=dw_impl)

    CHAIN = 8

    @jax.jit
    def chain(p, x):
        acc = jnp.float32(0)
        for _ in range(CHAIN):
            y = int8.apply(p, x)
            s = y.astype(jnp.float32).sum() * 1e-20
            acc = acc + s
            x = x + s.astype(x.dtype)
        return acc

    x = jnp.asarray(rng.rand(batch_size, 512, 512, 3), jnp.float32)
    return chain, qparams, x, CHAIN


BUCKETS = {
    'qconv1x1_kernel': r'qconv1x1',
    'qdw_kernel': r'qdw',
    'conv_fusion': r'^(%?)(fusion.*conv|conv)',
    'fusion': r'fusion',
    'copy/transpose': r'copy|transpose|bitcast',
    'reduce': r'reduce',
}


def run_variant(tag, build, *args, top=30):
    import time
    from tools.tpuprof import profile_device_ops

    chain, params, x, CHAIN = build(*args)
    t0 = time.perf_counter()
    float(chain(params, x))  # compile + warmup
    print(f'[{tag}] compile {time.perf_counter() - t0:.1f}s', flush=True)
    t0 = time.perf_counter()
    float(chain(params, x))
    wall_ms = (time.perf_counter() - t0) * 1e3 / CHAIN
    rows, total = profile_device_ops(lambda: float(chain(params, x)))
    per_fwd = total / CHAIN
    print(f'\n=== {tag}: wall {wall_ms:.2f} ms/fwd, device '
          f'{per_fwd / 1e3:.2f} ms/fwd (trace total {total / 1e3:.1f} ms '
          f'/ {CHAIN} fwd) ===')
    print('-- by category bucket:')
    for r in rows:
        print(f'  {r["total_us"] / CHAIN:9.1f} us/fwd  x{r["count"]:5d}  '
              f'{r["name"][:60]}')
    # flatten per-instruction splits
    instrs = []
    for r in rows:
        for iname, us in r.get('long_names', {}).items():
            instrs.append((us, iname, r.get('samples', {}).get(iname, '')))
    instrs.sort(key=lambda t: -t[0])
    print(f'-- top {top} instructions:')
    for us, iname, sample in instrs[:top]:
        print(f'  {us / CHAIN:9.1f} us/fwd  {sample[:220]}')
    return rows


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    rest = sys.argv[2:]
    model = 'mobilenetv2-fpn'
    if rest and ('fpn' in rest[0] or 'pan' in rest[0]):  # zoo model name
        model, rest = rest[0], rest[1:]
    variants = rest or ['bf16', 'pallas', 'xla']
    for v in variants:
        if v == 'bf16':
            run_variant(f'bf16 bs={bs}', build_bf16, model, bs)
        else:
            run_variant(f'int8-dw_{v} bs={bs}', build_int8, model, bs, v)


if __name__ == '__main__':
    main()
