"""Benchmark: mobilenetv2-fpn bs=1 512x512 inference forward latency on one
TPU chip, vs the reference's 11.5 ms on a GTX 1080 Ti (BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline > 1 means faster than the reference.

Measurement note: on the axon tunnel, block_until_ready does not reliably
fence device execution, so N forwards are CHAINED inside one jit with a
true value dependency (each iteration's input depends on the previous
output's sum) and the scalar result is fetched — wall time per iteration
is then honest device time.

CHAIN amortises the tunnel's fixed ~25 ms dispatch+fetch roundtrip (an
artifact of this remote-chip harness; a locally-attached TPU host pays
~0.1 ms). Rounds 1-2 used CHAIN=8 as an unrolled Python loop, so every
reported forward carried ~2-3 ms of pure tunnel roundtrip on top of the
~0.8 ms of true device time a jax.profiler trace shows; CHAIN=32 shrinks
that artifact to <1 ms/forward while still reporting a conservative upper
bound (the published number remains wall-clock with 1/CHAIN of the
roundtrip in it, never a trace-derived device-only time). The chain is a
lax.scan so the model body is compiled ONCE whatever CHAIN is (an
unrolled 32x loop would 4x the HLO and the compile time); the carry
dependency (x depends on the previous iteration's output sum) still
serialises iterations on device exactly like the unrolled form.
"""

import json
import sys
import time

import numpy as np

# reference README.md:105-108 bs=1 forward ms on a GTX 1080 Ti
BASELINES_MS = {
    'mobilenetv2-fpn': 11.5,
    'regnetx-600m-fpn': 15.9,
    'regnetx-600m-pan': 14.4,
    'regnety-400m-fpn': 22.9,
}
BASELINE_MS = BASELINES_MS['mobilenetv2-fpn']
CHAIN = 32          # forwards chained per measured call (see note above)


def _measure_chain(chain_call, reps: int):
    """reps timed dispatches of one CHAIN-long jit -> per-forward stats.

    VERDICT r4 #6: the headline drifted 1.40-1.59 ms between identical
    builds from tunnel/chip contention, so a single median is published
    WITH its spread (p10-p90 over dispatches) and, when the profiler
    cooperates, the trace-derived device-only time — the contention-free
    anchor (reference test.py:155-193 reports plain wall; we report both).
    """
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        chain_call()
        times.append((time.perf_counter() - t0) * 1e3)
    arr = np.asarray(times) / CHAIN
    stats = {
        'wall_p50': round(float(np.median(arr)), 3),
        'wall_spread': [round(float(np.percentile(arr, 10)), 3),
                        round(float(np.percentile(arr, 90)), 3)],
    }
    try:
        sys.path.insert(0, '/root/repo')
        from tools.tpuprof import profile_device_ops
        _, total_us = profile_device_ops(chain_call)
        stats['device_ms'] = round(total_us / 1e3 / CHAIN, 3)
    except Exception as e:  # tracing is best-effort on the tunnel
        print(f'bench: no trace-derived device time ({e})',
              file=sys.stderr, flush=True)
    return stats


def bench_forward(model: str = 'mobilenetv2-fpn', batch_size: int = 1,
                  reps: int = 8, s2d: int = 0):
    import jax
    import jax.numpy as jnp
    from pqdet_tpu.model.network import (DetectionNetwork,
                                         densify_grouped_convs, fuse_params)
    from pqdet_tpu.zoo import get_cfg

    net = DetectionNetwork.from_cfg(get_cfg(model))
    params, state = net.init(jax.random.PRNGKey(0))
    fused = densify_grouped_convs(net, fuse_params(net, params, state))
    fused = jax.tree.map(lambda x: x.astype(jnp.bfloat16), fused)

    @jax.jit
    def chain(p, x):
        def step(carry, _):
            x, acc = carry
            y = net.apply(p, {}, x, compute_dtype=jnp.bfloat16,
                          s2d_stem=s2d)[0]
            s = y.astype(jnp.float32).sum() * 1e-20
            # true dependency between iterations: next x needs this y
            return (x + s.astype(x.dtype), acc + s), None
        (_, acc), _ = jax.lax.scan(step, (x, jnp.float32(0)), None,
                                   length=CHAIN)
        return acc

    x = jnp.asarray(np.random.RandomState(0).rand(batch_size, 512, 512, 3),
                    jnp.bfloat16)
    if s2d < 0:
        # host ships the s2d layout directly (serving contract): the
        # device never sees the 3-channel spatial tensor at all
        r = -s2d
        xh = np.asarray(x, np.float32).reshape(
            batch_size, 512 // r, r, 512 // r, r, 3).transpose(
            0, 1, 3, 2, 4, 5).reshape(batch_size, 512 // r, 512 // r,
                                      r * r * 3)
        x = jnp.asarray(xh, jnp.bfloat16)
    float(chain(fused, x))  # compile + warmup

    # CONSERVATIVE: the reported per-forward time still contains 1/CHAIN of
    # the host<->device dispatch+fetch roundtrip (several ms through the
    # axon tunnel) — true device latency is lower than reported
    return _measure_chain(lambda: float(chain(fused, x)), reps)


def bench_quant(model: str = 'mobilenetv2-fpn', mode: str = 'pallas',
                batch_size: int = 1, reps: int = 8, dw_impl: str = 'auto'):
    """Quantized-serving latency (same chained-jit methodology).

    Builds the net in quant mode, runs one observing forward to calibrate
    the activation observers, converts to int8, and times
    Int8Inference.apply in the requested mode ('pallas'/'int'/'dequant').
    """
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
                                    mode=mode, network=net)
    int8 = Int8Inference(net, mode=mode, act=qparams['act'], dw_impl=dw_impl)

    @jax.jit
    def chain(p, x):
        def step(carry, _):
            x, acc = carry
            y = int8.apply(p, x)
            s = y.astype(jnp.float32).sum() * 1e-20
            return (x + s.astype(x.dtype), acc + s), None
        (_, acc), _ = jax.lax.scan(step, (x, jnp.float32(0)), None,
                                   length=CHAIN)
        return acc

    x = jnp.asarray(rng.rand(batch_size, 512, 512, 3), jnp.float32)
    float(chain(qparams, x))  # compile + warmup
    return _measure_chain(lambda: float(chain(qparams, x)), reps)


def wait_backend(max_s: float = 2700, probe_every: float = 180):
    """Bounded wait for the axon tunnel: the TPU drops for minutes-to-hours
    at a time, and a bench invoked during a drop would otherwise fail
    instantly. Probes in a subprocess (an in-process failed backend init is
    cached by JAX for the life of the process); gives up after max_s and
    lets the real run raise. All chatter on stderr — stdout is reserved
    for the single JSON result line."""
    import subprocess
    deadline = time.time() + max_s
    while True:
        try:
            r = subprocess.run(
                [sys.executable, '-c', 'import jax; jax.devices()'],
                timeout=240, stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL)
            if r.returncode == 0:
                return
        except subprocess.TimeoutExpired:
            pass
        if time.time() > deadline:
            print('bench: backend still unavailable, proceeding anyway',
                  file=sys.stderr, flush=True)
            return
        print(f'bench: backend unavailable, retrying ({time.ctime()})',
              file=sys.stderr, flush=True)
        time.sleep(probe_every)


def main():
    wait_backend()
    model = sys.argv[1] if len(sys.argv) > 1 else 'mobilenetv2-fpn'
    variant = sys.argv[2] if len(sys.argv) > 2 else 'fp'
    bs = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    if variant.startswith('quant'):
        mode = variant.split('-', 1)[1] if '-' in variant else 'pallas'
        dw = 'auto'
        if mode == 'xdw':       # pallas executor, XLA unrolled depthwise
            mode, dw = 'pallas', 'xla'
        elif mode == 'pdw':     # force the Pallas dw kernel everywhere
            mode, dw = 'pallas', 'pallas'
        stats = bench_quant(model, mode=mode, batch_size=bs, dw_impl=dw)
        tag = {'xla': f'{mode}_xdw', 'pallas': f'{mode}_pdw'}.get(dw, mode)
        metric = f'{model.replace("-", "_")}_int8_{tag}_forward_ms_bs{bs}_512'
    elif variant == 'fp-s2d':
        # space-to-depth stem ingest (ops/space_to_depth.py) A/B
        stats = bench_forward(model, batch_size=bs, s2d=2)
        metric = f'{model.replace("-", "_")}_s2d_forward_ms_bs{bs}_512'
    elif variant == 'fp-s2dh':
        # s2d done on the HOST (input ships pre-reshaped): isolates the
        # device transpose cost from the folded-conv benefit
        stats = bench_forward(model, batch_size=bs, s2d=-2)
        metric = f'{model.replace("-", "_")}_s2dh_forward_ms_bs{bs}_512'
    else:
        stats = bench_forward(model, batch_size=bs)
        metric = f'{model.replace("-", "_")}_forward_ms_bs{bs}_512'
    ms = stats['wall_p50']
    out = {'metric': metric, 'value': ms, 'unit': 'ms', **stats}
    if model in BASELINES_MS and bs == 1:
        out['vs_baseline'] = round(BASELINES_MS[model] / ms, 3)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
