"""Small host-side metering utilities (reference tools.py:568-641)."""

from __future__ import annotations

import time
from typing import Optional

import numpy as np


class AverageMeter:
    def __init__(self):
        self.sum = 0.0
        self.count = 0

    def reset(self):
        self.sum = 0.0
        self.count = 0

    def update(self, value, n: int = 1):
        self.sum += value
        self.count += n

    def get_avg_reset(self) -> float:
        if self.count == 0:
            return 0.0
        avg = float(self.sum) / float(self.count)
        self.reset()
        return avg

    def get_sum_reset(self):
        s = self.sum
        self.sum = 0.0
        return s


class TicToc:
    """Nanosecond wall timer with running stats."""

    def __init__(self, name: Optional[str] = None):
        self.name = name
        self.last = 0
        self.records = []

    def reset(self):
        self.last = 0
        self.records.clear()

    def tic(self):
        self.last = time.perf_counter_ns()

    def toc(self):
        self.records.append(time.perf_counter_ns() - self.last)

    def __getitem__(self, i):
        return self.records[i]

    def mean(self):
        return float(np.mean(self.records)) if self.records else 0.0

    def sum(self):
        return float(np.sum(self.records)) if self.records else 0.0

    def mean_reset(self):
        m = self.mean()
        self.reset()
        return m

    def sum_reset(self):
        s = self.sum()
        self.reset()
        return s

    def statistics(self):
        if not self.records:
            return {'name': self.name or 'none', 'mean': 0, 'std': 0,
                    '3std': 0, 'min': 0, 'max': 0}
        std = float(np.std(self.records))
        return {
            'name': self.name or 'none',
            'mean': float(np.mean(self.records)),
            'std': std,
            '3std': 3 * std,
            'min': float(np.amin(self.records)),
            'max': float(np.amax(self.records)),
        }
