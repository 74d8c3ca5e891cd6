"""MACs/params counting over the graph IR (thop-equivalent, reference
test.py:195-202) and jax.profiler helpers."""

from __future__ import annotations

from contextlib import contextmanager
from typing import Tuple

from pqdet_tpu.model.graph import Graph, solve_padding


def count_macs_params(graph: Graph, input_size: Tuple[int, int]) -> Tuple[int, int]:
    """Multiply-accumulates + parameter count for one forward at the given
    (h, w). Convention matches thop: convs count k*k*cin/groups MACs per
    output element; BN/activation/pool are free; linear counts in*out."""
    h, w = input_size
    sizes = {}   # node index -> (h, w)
    macs = 0
    params = 0
    cur = (h, w)
    for node in graph.nodes:
        a = node.attrs
        if node.kind == 'convolutional':
            pad = solve_padding(a['size'], a['padding'], a['pad'])
            oh = (cur[0] + 2 * pad - a['size']) // a['stride'] + 1
            ow = (cur[1] + 2 * pad - a['size']) // a['stride'] + 1
            cur = (oh, ow)
            k2cin = a['size'] * a['size'] * node.in_channels // a['groups']
            macs += oh * ow * a['filters'] * k2cin
            params += a['filters'] * k2cin
            if node.has_bn:
                # thop parity: affine BatchNorm2d counts 4 ops per element
                macs += 4 * oh * ow * a['filters']
                params += 2 * a['filters']
            else:
                params += a['filters']
        elif node.kind == 'fc':
            macs += a['input'] * a['output']
            params += a['input'] * a['output'] + a['output']
            cur = (1, 1)
        elif node.kind == 'maxpool':
            pad = solve_padding(a['size'], a['padding'], a['pad'])
            cur = ((cur[0] + 2 * pad - a['size']) // a['stride'] + 1,
                   (cur[1] + 2 * pad - a['size']) // a['stride'] + 1)
        elif node.kind == 'avgpool':
            # thop parity: adaptive avg pool counts 1 op per input element
            macs += cur[0] * cur[1] * node.in_channels
            cur = node.out_size
        elif node.kind == 'upsample':
            cur = (cur[0] * a['stride'], cur[1] * a['stride'])
        elif node.kind in ('shortcut', 'scale_channels'):
            cur = sizes[node.refs[0]]
        elif node.kind == 'route':
            cur = sizes[node.refs[0]]
        sizes[node.index] = cur
    return macs, params


def clever_format(n: float, unit_step: float = 1e9, suffixes=('G', 'M', 'K')) -> str:
    for suffix, scale in zip(suffixes, (1e9, 1e6, 1e3)):
        if n >= scale:
            return f'{n / scale:.3f}{suffix}'
    return str(n)


def chained_forward_latency(apply_fn, params, input_shape, chain: int = 8,
                            reps: int = 8, dtype=None) -> float:
    """Honest per-forward latency (ms) via the chained-jit methodology.

    On the axon TPU tunnel ``block_until_ready`` does NOT fence device
    execution (naive timings read ~0.1 ms), so ``chain`` forwards are linked
    inside ONE jit with a true value dependency (each iteration's input is
    perturbed by the previous output's sum) and a scalar is fetched; wall
    time per iteration is then real device time plus 1/chain of the host
    roundtrip (conservative). Same method as bench.py.

    apply_fn(params, x) -> array; input_shape includes the batch dim.
    """
    import time as _time
    import numpy as _np
    import jax
    import jax.numpy as jnp

    dtype = dtype or jnp.float32

    @jax.jit
    def chained(p, x):
        acc = jnp.float32(0)
        for _ in range(chain):
            y = apply_fn(p, x)
            s = y.astype(jnp.float32).sum() * 1e-20
            acc = acc + s
            x = x + s.astype(x.dtype)
        return acc

    x = jnp.asarray(_np.random.RandomState(0).rand(*input_shape), dtype)
    float(chained(params, x))  # compile + warmup
    times = []
    for _ in range(reps):
        t0 = _time.perf_counter()
        float(chained(params, x))
        times.append((_time.perf_counter() - t0) * 1e3)
    return float(_np.median(times)) / chain


@contextmanager
def trace(log_dir: str = '/tmp/pqdet_trace'):
    """jax.profiler trace wrapper (replaces the reference's TicToc-only
    story, SURVEY.md section 5)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
