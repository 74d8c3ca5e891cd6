"""Trace-driven device-time profiling on the axon TPU tunnel.

`block_until_ready` does not fence device execution here (CLAUDE.md), so
wall-clock numbers need the chained-jit trick — but jax.profiler traces DO
record true per-op device times. This module runs a callable under
jax.profiler.trace and aggregates the XLA-op events from the
.trace.json.gz into a per-op-name device-time table.

Usage:
    from tools.tpuprof import profile_device_ops
    rows, total_us = profile_device_ops(lambda: float(chained(p, x)))
    for r in rows[:15]: print(r)
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
import shutil
import tempfile
from collections import defaultdict
from typing import Callable, Dict, List, Tuple


def _load_trace_events(log_dir: str) -> list:
    paths = glob.glob(os.path.join(log_dir, '**', '*.trace.json.gz'),
                      recursive=True)
    if not paths:
        raise FileNotFoundError(f'no trace.json.gz under {log_dir}')
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, 'rt') as f:
        return json.load(f).get('traceEvents', [])


def summarize_trace(log_dir: str, merge_fusion_ids: bool = True
                    ) -> Tuple[List[Dict], float]:
    """Aggregate device-side XLA-op events into
    ([{name, count, total_us, category, long_name}], total_us).

    Device op events carry ``args.device_duration_ps`` plus the HLO
    instruction text in ``args.long_name`` and its ``hlo_category``
    ('convolution fusion', 'loop fusion', ...). The whole-program envelope
    (``jit_foo(...)``) also has device_duration_ps — excluded by name so op
    times are not double-counted. Aggregation key: the HLO name with the
    trailing id stripped (fusion.9/fusion.21 that dedupe to the same
    computation stay separate only via their deduplicated_name sample).
    """
    events = _load_trace_events(log_dir)
    agg = {}
    total = 0.0
    for e in events:
        if e.get('ph') != 'X':
            continue
        args = e.get('args') or {}
        if 'device_duration_ps' not in args:
            continue
        name = e.get('name', '?')
        if re.match(r'^jit_\w+\(', name):
            continue  # program envelope, not an op
        if re.fullmatch(r'\d+', name) and 'long_name' not in args:
            # newer profiler builds emit per-dispatch program envelopes as
            # bare run-id names ('0','1','2',...) with device_duration_ps
            # equal to the whole program — counting them doubles the total
            continue
        dur = float(e.get('dur', 0.0))
        key = re.sub(r'\.\d+$', '', name) if merge_fusion_ids else name
        cat = args.get('hlo_category', '')
        if key == 'fusion' and cat:
            key = cat.replace(' ', '_')
        row = agg.get(key)
        if row is None:
            row = agg[key] = {'name': key, 'count': 0, 'total_us': 0.0,
                              'category': cat,
                              'long_names': defaultdict(float)}
        row['count'] += 1
        row['total_us'] += dur
        ln = args.get('long_name', '')
        if ln:
            # per-instruction split inside the bucket (dedup by hlo name)
            iname = ln.split(' = ')[0]
            row['long_names'][iname] += dur
            row.setdefault('samples', {})
            if iname not in row['samples'] and len(row['samples']) < 400:
                row['samples'][iname] = ln[:400]
        total += dur
    rows = sorted(agg.values(), key=lambda r: -r['total_us'])
    for r in rows:
        r['total_us'] = round(r['total_us'], 1)
    return rows, total


def profile_device_ops(run: Callable[[], None], log_dir: str = None,
                       merge_fusion_ids: bool = True):
    """Run `run` (should block on a fetched scalar) under a profiler trace
    and return (rows, total_us). Cleans up the trace dir unless given."""
    import jax
    own = log_dir is None
    log_dir = log_dir or tempfile.mkdtemp(prefix='tpuprof_')
    jax.profiler.start_trace(log_dir)
    try:
        run()
    finally:
        jax.profiler.stop_trace()
    try:
        return summarize_trace(log_dir, merge_fusion_ids)
    finally:
        if own:
            shutil.rmtree(log_dir, ignore_errors=True)


def classify(rows: List[Dict], buckets: Dict[str, str]) -> Dict[str, float]:
    """Bucket rows by regex -> total_us per bucket (first match wins),
    'other' for the rest."""
    out = defaultdict(float)
    for r in rows:
        for bname, pat in buckets.items():
            if re.search(pat, r['name']):
                out[bname] += r['total_us']
                break
        else:
            out['other'] += r['total_us']
    return dict(out)
