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
                        num_classes: int = 20, seed: Optional[int] = None,
                        exp_cap: float = 40.0):
    """Yield up to n (cfg_text, info) candidates passing the filters."""
    rng = np.random.RandomState(seed)
    produced = 0
    while produced < n:
        cfg_text, head = detnet_600m(num_classes=num_classes, rng=rng,
                                     return_head=True, exp_cap=exp_cap)
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


def _log_meta(rounds, max_macs, max_latency_ms, seed, exp_cap):
    import subprocess
    import time
    try:
        commit = subprocess.run(
            ['git', 'rev-parse', '--short', 'HEAD'], cwd='/root/repo',
            capture_output=True, text=True).stdout.strip()
    except OSError:
        commit = None
    return {'driver': 'pqdet_tpu/nas/search.py', 'rounds': rounds,
            'max_macs': max_macs, 'max_latency_ms': max_latency_ms,
            'seed': seed, 'exp_cap': exp_cap, 'commit': commit,
            'date': time.strftime('%Y-%m-%d %H:%M UTC', time.gmtime())}


def search(config, rounds: int = 50, max_macs: float = 5e9,
           log_path: str = 'nas_search.json',
           max_latency_ms: Optional[float] = None,
           seed: Optional[int] = None, exp_cap: float = 40.0):
    """Short-train candidates and log EVERY sampled candidate —
    {macs, params, ap, status} per round, with diverged candidates kept
    as status='diverged' + their step of death instead of silently
    dropped (round-4 sweep: the log held only the 4 survivors of 8, so
    the EDF/AUC analysis ran on a biased sample; reference
    nas/search.py:104-110 logs what it trains)."""
    import re

    from pqdet_tpu.train.trainer import Trainer

    records = []
    if os.path.exists(log_path):
        with open(log_path) as fr:
            records = json.load(fr).get('data', [])

    for i, (cfg_text, info) in enumerate(
            generate_candidates(rounds, max_macs=max_macs,
                                max_latency_ms=max_latency_ms,
                                num_classes=len(config.dataset.classes),
                                seed=seed, exp_cap=exp_cap)):
        print(f'=== candidate {i}: {info}')
        rec = {'cfg': cfg_text, **info}
        try:
            trainer = Trainer(config)
            ap = trainer.run_nas(cfg_text)
            rec.update(status='completed', ap=float(ap))
        except Exception as e:
            traceback.print_exc()
            m = re.search(r'near step (\d+)', str(e))
            rec.update(status='diverged', ap=None,
                       step_of_death=int(m.group(1)) if m else None,
                       error=str(e)[:800])
        finally:
            # per-candidate jit executables otherwise accumulate across
            # the sweep (see the evolute.py note)
            import jax
            jax.clear_caches()
        records.append(rec)
        with open(log_path, 'w') as fw:
            json.dump({'meta': _log_meta(rounds, max_macs, max_latency_ms,
                                         seed, exp_cap),
                       'data': records}, fw)
        print(f'candidate {i}: {rec["status"]} AP={rec["ap"]}')
    return records
