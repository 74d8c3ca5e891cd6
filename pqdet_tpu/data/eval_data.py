"""Evaluation data pipeline: batches of preprocessed images + host-side GT.

Mirrors the reference EvalDataset (dataset/eval_dataset.py:11-52): batches
are assembled directly (no collate), yielding preprocessed image stacks
plus file names / original shapes / GT boxes / difficult flags. The final
ragged batch is zero-padded to the full batch size so the jitted forward
sees one static shape; `count` marks the real rows. The forward/NMS run
on the pad rows too and their outputs are discarded by `count` — wasted
work only on the single tail batch per eval, which is cheaper than a
second jit specialisation for the remainder shape.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from math import ceil
from typing import Iterator, Optional

import numpy as np

from pqdet_tpu.config import size_fix
from pqdet_tpu.data.samples import SAMPLE_GETTER_REGISTER


class EvalData:

    def __init__(self, config):
        self._name = config.dataset.name.lower()
        self._input_size = size_fix(config.eval.input_size)
        self._batch_size = config.eval.batch_size
        self._classes = list(config.dataset.classes)
        partial = config.eval.partial

        self.sample_getter = SAMPLE_GETTER_REGISTER[self._name](
            mode='eval', classes=self._classes,
        ).set_eval_augment(
            self._input_size,
            normalize=bool(getattr(config.eval, 'host_normalize', False)))

        with open(config.dataset.eval_txt_file, 'r') as fr:
            imgs = [l.strip() for l in fr if l.strip()]
        self._imgs = imgs[:partial] if partial else imgs
        self._num_imgs = len(self._imgs)

    @property
    def length(self):
        return self._num_imgs

    @property
    def input_size(self):
        return self._input_size

    def __len__(self):
        return ceil(self._num_imgs / self._batch_size)

    def batch(self, index: int, pool: Optional[ThreadPoolExecutor] = None) -> dict:
        start = index * self._batch_size
        end = min(self._num_imgs, start + self._batch_size)
        paths = self._imgs[start:end]
        samples = list(pool.map(self.sample_getter, paths)) if pool \
            else [self.sample_getter(p) for p in paths]

        # uint8 stays uint8 (device-side normalize, 4x fewer upload bytes);
        # host-normalized chains (eval.host_normalize) stay float32
        images = np.stack([s[0] for s in samples])
        count = len(samples)
        if count < self._batch_size:  # static shape for jit
            pad = np.zeros((self._batch_size - count,) + images.shape[1:],
                           images.dtype)
            images = np.concatenate([images, pad])
        shapes = np.stack([s[2] for s in samples])
        if count < self._batch_size:
            shapes = np.concatenate(
                [shapes, np.ones((self._batch_size - count, 2), np.float32)])
        return {
            'image': images,
            'file_name': [s[1] for s in samples],
            'shape': shapes,
            'bboxes': [s[3] for s in samples],
            'difficult': [s[4] for s in samples],
            'count': count,
        }

    def batches(self, num_workers: int = 4, prefetch: int = 2) -> Iterator[dict]:
        from collections import deque
        with ThreadPoolExecutor(max_workers=max(num_workers, 1)) as samples, \
                ThreadPoolExecutor(max_workers=max(prefetch, 1)) as assembler:
            pending = deque()
            for i in range(len(self)):
                while len(pending) >= max(prefetch, 1):
                    yield pending.popleft().result()
                pending.append(assembler.submit(self.batch, i, samples))
            while pending:
                yield pending.popleft().result()
