"""Benchmark: mobilenetv2-fpn bs=1 512x512 inference forward latency on one
TPU chip, vs the reference's 11.5 ms on a GTX 1080 Ti (BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline > 1 means faster than the reference.
"""

import json
import time

import numpy as np

BASELINE_MS = 11.5  # reference README.md:105, mobilenetv2-fpn bs=1 forward


def bench_forward(batch_size: int = 1, iters: int = 100, warmup: int = 10):
    import jax
    import jax.numpy as jnp
    from pqdet_tpu.model.network import DetectionNetwork, fuse_params
    from pqdet_tpu.zoo import get_cfg

    net = DetectionNetwork.from_cfg(get_cfg('mobilenetv2-fpn'))
    params, state = net.init(jax.random.PRNGKey(0))
    fused = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                         fuse_params(net, params, state))

    @jax.jit
    def forward(p, x):
        preds, _ = net.apply(p, {}, x, compute_dtype=jnp.bfloat16)
        return preds

    # pre-staged distinct device inputs so host->device transfer and input
    # reuse artifacts don't pollute the measurement
    rng = np.random.RandomState(0)
    xs = [jnp.asarray(rng.rand(batch_size, 512, 512, 3), jnp.bfloat16)
          for _ in range(8)]
    for x in xs:
        forward(fused, x).block_until_ready()
    for i in range(warmup):
        forward(fused, xs[i % 8]).block_until_ready()

    # per-call synchronised latency
    times = []
    for i in range(iters):
        x = xs[i % 8]
        t0 = time.perf_counter()
        forward(fused, x).block_until_ready()
        times.append((time.perf_counter() - t0) * 1e3)
    p50 = float(np.percentile(times, 50))

    # pipelined throughput (sync once at the end)
    t0 = time.perf_counter()
    out = None
    for i in range(iters):
        out = forward(fused, xs[i % 8])
    out.block_until_ready()
    pipelined_ms = (time.perf_counter() - t0) * 1e3 / iters
    return p50, pipelined_ms


def main():
    p50, pipelined = bench_forward(batch_size=1)
    print(json.dumps({
        'metric': 'mobilenetv2_fpn_forward_p50_ms_bs1_512',
        'value': round(p50, 3),
        'unit': 'ms',
        'vs_baseline': round(BASELINE_MS / p50, 3),
    }))


if __name__ == '__main__':
    main()
