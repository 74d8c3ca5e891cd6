"""Random NAS search driver (reference nas/search.py:44-110).

Samples DetNet candidates, filters by MACs (and optionally measured
latency), short-trains each via Trainer.run_nas, and appends results to a
JSON log. Failed candidates are caught and skipped, like the reference's
catch-and-continue (nas/search.py:70-83).
"""

from __future__ import annotations

import json
import os
import traceback
from typing import Optional

import numpy as np

from pqdet_tpu.model.graph import Graph
from pqdet_tpu.nas.detnet import detnet_600m
from pqdet_tpu.utils.profiling import count_macs_params


def measure_latency(cfg_text: str, input_size: int = 512, chain: int = 8,
                    reps: int = 4) -> float:
    """Median jitted forward latency (ms) of a candidate via the chained-jit
    methodology (utils.profiling.chained_forward_latency) — block_until_ready
    does not fence device execution on the axon tunnel, so naive per-call
    timing would pass every candidate through the max_latency_ms filter."""
    import jax
    from pqdet_tpu.model.network import DetectionNetwork, fuse_params
    from pqdet_tpu.utils.profiling import chained_forward_latency

    net = DetectionNetwork.from_cfg(cfg_text)
    params, state = net.init(jax.random.PRNGKey(0))
    fused = fuse_params(net, params, state)

    def fwd(p, x):
        return net.apply(p, {}, x)[0]

    return chained_forward_latency(fwd, fused, (1, input_size, input_size, 3),
                                   chain=chain, reps=reps)


def generate_candidates(n: int, max_macs: float = 5e9, min_macs: float = 0.0,
                        max_latency_ms: Optional[float] = None,
                        num_classes: int = 20, seed: Optional[int] = None):
    """Yield up to n (cfg_text, info) candidates passing the filters."""
    rng = np.random.RandomState(seed)
    produced = 0
    while produced < n:
        cfg_text, head = detnet_600m(num_classes=num_classes, rng=rng,
                                     return_head=True)
        try:
            graph = Graph.from_cfg(cfg_text)
        except Exception:
            continue
        macs, params = count_macs_params(graph, (512, 512))
        if not (min_macs <= macs <= max_macs):
            continue
        info = {'macs': macs, 'params': params, 'head': head}
        if max_latency_ms is not None:
            latency = measure_latency(cfg_text)
            if latency > max_latency_ms:
                continue
            info['latency_ms'] = latency
        produced += 1
        yield cfg_text, info


def search(config, rounds: int = 50, max_macs: float = 5e9,
           log_path: str = 'nas_search.json',
           max_latency_ms: Optional[float] = None,
           seed: Optional[int] = None):
    """Short-train candidates and log {macs, params, ap} per round."""
    from pqdet_tpu.train.trainer import Trainer

    records = []
    if os.path.exists(log_path):
        with open(log_path) as fr:
            records = json.load(fr).get('data', [])

    for i, (cfg_text, info) in enumerate(
            generate_candidates(rounds, max_macs=max_macs,
                                max_latency_ms=max_latency_ms,
                                num_classes=len(config.dataset.classes),
                                seed=seed)):
        print(f'=== candidate {i}: {info}')
        try:
            trainer = Trainer(config)
            ap = trainer.run_nas(cfg_text)
        except Exception:
            traceback.print_exc()
            continue
        finally:
            # per-candidate jit executables otherwise accumulate across
            # the sweep (see the evolute.py note)
            import jax
            jax.clear_caches()
        records.append({'cfg': cfg_text, 'ap': float(ap), **info})
        with open(log_path, 'w') as fw:
            json.dump({'data': records}, fw)
        print(f'candidate {i}: AP={ap:.4f}')
    return records
