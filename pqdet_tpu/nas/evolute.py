"""Hyper-parameter evolution driver (reference evolute.py:20-139).

Randomly samples augment probabilities + loss hypers (beta(1.5,1.5) for
probabilities/alphas, multiplicative log-normal-ish for gains), injects
them into the config and the yolo layer attrs, trains ONE epoch from the
same initial weights each round, and logs {hyper, fitness(AP)} to JSON.
"""

from __future__ import annotations

import json
from typing import Dict

import numpy as np

from pqdet_tpu.train.trainer import Trainer

BASE_HYPERS = {
    'hflip_p': 0.5,
    'crop_p': 0.75,
    'color_p': 0.2,
    'mixup_p': 0.5,
    'ignore_thresh': 0.5,
    'bbox_loss_gain': 1.0,
    'conf_loss_gain': 1.0,
    'cls_loss_gain': 1.7,
    'conf_loss_alpha': 0.5,
    'cls_loss_alpha': 0.5,
    'conf_loss_beta': 2.0,
    'cls_loss_beta': 2.0,
}

_P_KEYS = ('hflip_p', 'crop_p', 'color_p', 'mixup_p', 'ignore_thresh',
           'conf_loss_alpha', 'cls_loss_alpha')
_GAIN_KEYS = ('bbox_loss_gain', 'conf_loss_gain', 'cls_loss_gain')
_AUGMENT_KEYS = ('hflip_p', 'crop_p', 'color_p', 'mixup_p')


def sample_hypers(rng: np.random.RandomState) -> Dict[str, float]:
    hypers = {}
    for k, base in BASE_HYPERS.items():
        if k == 'conf_loss_beta':
            hypers[k] = 2.0
        elif k == 'cls_loss_beta':
            hypers[k] = float(rng.choice(range(3)))
        elif k in _P_KEYS:
            hypers[k] = float(rng.beta(1.5, 1.5))
        else:  # gains: multiplicative squared-normal perturbation
            hypers[k] = float(base * (rng.randn() * 0.2 + 1.0) ** 2.0)
    return hypers


class Evoluter:

    def __init__(self, config, rounds: int = 200,
                 log_path: str = 'evolution.json', seed: int = None):
        self.base_config = config
        self.rounds = rounds
        self.log_path = log_path
        self.rng = np.random.RandomState(seed)
        self.records = []

    def _round_config(self, hypers: Dict[str, float]):
        cfg = self.base_config.clone().defrost()
        for k in _AUGMENT_KEYS:
            setattr(cfg.augment, k, hypers[k])
        cfg.train.max_epochs = 1
        cfg.train.warmup_epochs = 0.0
        cfg.train.scheduler = 'step'
        cfg.eval.after = 0
        cfg.freeze()
        return cfg

    def run(self):
        for i in range(self.rounds):
            hypers = sample_hypers(self.rng)
            print(i, hypers)
            cfg = self._round_config(hypers)
            trainer = Trainer(cfg)
            # identical init weights every round (fixed seed in factory)
            trainer.init_all()
            # inject loss hypers into every yolo node before the step jits
            for node in trainer.network.graph.yolo_nodes:
                for k in ('ignore_thresh', 'bbox_loss_gain', 'conf_loss_gain',
                          'cls_loss_gain', 'conf_loss_alpha', 'cls_loss_alpha',
                          'conf_loss_beta', 'cls_loss_beta'):
                    node.attrs[k] = hypers[k]
            try:
                trainer.train_epoch(0)
                fitness = trainer.evaluate().AP
            except Exception as exc:
                print(f'round {i} failed: {exc}')
                continue
            finally:
                # one Trainer per round: release loader workers/shm slabs
                # AND the round's jit executables — every round builds new
                # step closures whose compiled programs otherwise
                # accumulate for the whole run (the round-4 16-round
                # driver died silently after 13 rounds; unbounded
                # cache growth is the suspect). The HBM corpus cache
                # survives (module-level memo, not a jit cache).
                trainer.close()
                import jax
                jax.clear_caches()
            print(fitness)
            self.records.append({'hyper': hypers, 'fitness': float(fitness),
                                 'telemetry': _telemetry()})
            with open(self.log_path, 'w') as fw:
                json.dump({'data': self.records,
                           'exit': {'status': 'running',
                                    'completed_rounds': len(self.records),
                                    'target_rounds': self.rounds}}, fw)
        with open(self.log_path, 'w') as fw:
            json.dump({'data': self.records,
                       'exit': {'status': 'completed',
                                'completed_rounds': len(self.records),
                                'target_rounds': self.rounds}}, fw)
        return self.records


def _telemetry() -> Dict:
    """Per-round host-memory telemetry (VERDICT r4 #3: the 16-round run
    exited silently after round 13 with no traceback — an abrupt death
    leaves the last record's telemetry as the flight recorder; suspects
    were host RSS growth from per-round jit executables)."""
    import gc

    import jax
    rss_kb = 0
    try:
        with open('/proc/self/status') as f:
            for line in f:
                if line.startswith('VmRSS:'):
                    rss_kb = int(line.split()[1])
                    break
    except OSError:
        pass
    return {'rss_gb': round(rss_kb / 1e6, 2),
            'live_arrays': len(jax.live_arrays()),
            'gc_objects': len(gc.get_objects())}
