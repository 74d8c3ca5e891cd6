"""Training data pipeline: epoch planning, label assignment, batching.

Replaces the reference's torch DataLoader worker processes
(dataset/train_dataset.py + trainer.py:124-139) with a thread-pool batch
assembler feeding a device prefetcher. Thread (not process) workers fit
here because cv2/numpy release the GIL in the heavy kernels and JAX wants
one process per host.

Epoch plan parity (train_dataset.py:78-84): shuffle WITH replacement over
the image list, one multi-scale input size per batch drawn from
train.input_sizes, first batch forced to the largest size (memory
high-water-mark first). Static shapes for jit: labels are per-scale grids,
raw GT boxes are zero-padded to model.max_gt_boxes.
"""

from __future__ import annotations

import random
import threading
from math import ceil
from typing import Iterator, List, Tuple

import numpy as np

from pqdet_tpu.config import sizes_fix
from pqdet_tpu.data.samples import SAMPLE_GETTER_REGISTER


def smooth_onehot(num_classes: int, index: int, deta: float = 0.01) -> np.ndarray:
    # label smoothing, reference train_dataset.py:126-130
    onehot = np.full(num_classes, deta / num_classes, np.float32)
    onehot[index] += 1.0 - deta
    return onehot


def assign_labels(bboxes: np.ndarray, input_size: Tuple[int, int],
                  strides: np.ndarray, anchors: np.ndarray,
                  num_classes: int, gt_per_grid: int = 3,
                  iou_threshold: float = 0.3, max_gt: int = 64):
    """GT boxes -> per-scale grid labels + padded raw box lists.

    bboxes: (N, 6) [x1, y1, x2, y2, class, mixup_weight].
    Returns 3 label grids (H, W, A, 6+C) and 3 padded (max_gt, 4) box arrays.
    Assignment parity with reference create_label (train_dataset.py:109-150):
    per GT box, anchors at the box's center cell with IoU(wh) > threshold
    get it (argmax fallback when none clear the bar).

    Vectorised over boxes (the per-box Python loop cost ~0.4 ms for a
    crowded 24-box image and holds the GIL, starving the thread-pool
    loader; see tests/test_data.py::test_assign_labels_vectorised_parity
    for the loop-equivalence proof incl. the later-box-wins overwrite
    order at contended cells).
    """
    A = gt_per_grid
    S = len(strides)
    out_sizes = [(input_size[0] // s, input_size[1] // s) for s in strides]
    labels = [np.zeros((h, w, A, 6 + num_classes), np.float32)
              for h, w in out_sizes]
    for lab in labels:
        lab[..., -1] = 1.0  # default mixup weight

    bboxes = np.asarray(bboxes, np.float32).reshape(-1, 6)
    n = len(bboxes)
    padded = [np.zeros((max_gt, 4), np.float32) for _ in range(S)]
    if n == 0:
        return labels, padded

    coor = bboxes[:, :4]
    cls_idx = bboxes[:, 4].astype(np.int32)
    mixw = bboxes[:, 5]
    cxy = (coor[:, 2:] + coor[:, :2]) * 0.5                      # (N, 2)
    wh = coor[:, 2:] - coor[:, :2]                               # (N, 2)

    # label smoothing (reference train_dataset.py:126-130)
    deta = 0.01
    onehot = np.full((n, num_classes), deta / num_classes, np.float32)
    onehot[np.arange(n), cls_idx] += 1.0 - deta

    strides_f = np.asarray(strides, np.float32)
    xy_idx = np.floor(cxy[:, None, :] / strides_f[None, :, None]
                      ).astype(np.int32)                         # (N, S, 2)
    centers = (xy_idx.astype(np.float32) + 0.5) * strides_f[None, :, None]

    # IoU(box, anchor-at-center) in (cx, cy, w, h) space, all pairs at once
    a_cxy = np.repeat(centers, A, axis=1)                        # (N, S*A, 2)
    a_wh = np.broadcast_to(np.asarray(anchors, np.float32)[None],
                           (n, S * A, 2))
    b_min = cxy[:, None] - wh[:, None] * 0.5
    b_max = cxy[:, None] + wh[:, None] * 0.5
    a_min = a_cxy - a_wh * 0.5
    a_max = a_cxy + a_wh * 0.5
    inter = np.prod(np.clip(np.minimum(b_max, a_max)
                            - np.maximum(b_min, a_min), 0, None), axis=-1)
    union = (wh[:, 0] * wh[:, 1])[:, None] + a_wh[..., 0] * a_wh[..., 1] \
        - inter
    ious = inter / np.maximum(union, 1e-12)                      # (N, S*A)

    mask = ious > iou_threshold
    none_hit = ~mask.any(axis=1)
    mask[none_hit, ious[none_hit].argmax(axis=1)] = True

    entries = np.concatenate([coor, np.ones((n, 1), np.float32), onehot,
                              mixw[:, None]], axis=1)            # (N, 6+C)

    truncated = 0
    for s in range(S):
        h, w = out_sizes[s]
        x, y = xy_idx[:, s, 0], xy_idx[:, s, 1]
        in_bounds = (0 <= y) & (y < h) & (0 <= x) & (x < w)
        m = mask[:, s * A:(s + 1) * A] & in_bounds[:, None]      # (N, A)
        bi, ai = np.nonzero(m)   # row-major: ascending box order ->
        # duplicate (y, x, anchor) cells resolve LAST-box-wins, matching
        # the sequential loop's overwrite order
        if len(bi):
            labels[s][y[bi], x[bi], ai] = entries[bi]
        hit = m.any(axis=1)
        nb = int(hit.sum())
        if nb:
            truncated += max(nb - max_gt, 0)
            keep = coor[hit][:max_gt]
            padded[s][:len(keep)] = keep
    if truncated and not getattr(assign_labels, '_warned', False):
        assign_labels._warned = True
        import warnings
        warnings.warn(
            f'GT boxes exceeded model.max_gt_boxes={max_gt} and were dropped '
            f'from the conf-loss ignore mask; raise model.max_gt_boxes for '
            f'crowded datasets (warned once)', stacklevel=2)
    return labels, padded


class TrainData:
    """Epoch-planned training data source (one sample at a time).

    Multi-host (the reference's DataParallel generalised, tools.py:216):
    the epoch PLAN (sample indices + per-batch multi-scale sizes) is drawn
    from a ``system.seed``-seeded generator so every host computes the SAME
    plan, and ``batch_indices`` returns only this host's contiguous slice
    of each global batch (host h of H loads batch rows [h*B/H, (h+1)*B/H)).
    Per-sample augment randomness stays host-local — only the plan must
    agree across hosts.
    """

    def __init__(self, config, num_hosts: int = 1, host_id: int = 0):
        self._config = config  # for process-loader workers (spawn rebuild)
        self._name = config.dataset.name.lower()
        self._input_sizes = sizes_fix(config.train.input_sizes)
        self._strides = np.array(config.model.strides)
        self._batch_size = config.train.batch_size
        self._classes = list(config.dataset.classes)
        self._num_classes = len(self._classes)
        self._gt_per_grid = config.model.gt_per_grid
        self._anchors = np.array(config.model.anchors, np.float32)
        self._iou_threshold = config.model.anchors_iou_threshold
        self._max_gt = config.model.max_gt_boxes
        self._size_group = getattr(config.train, 'unroll_steps', 1)
        # 'device': ship padded GT boxes, grids build in the jitted step
        # (ops/labels.py); 'host': reference-style grids built here
        mode = getattr(config.system, 'label_assign', 'host')
        if mode not in ('device', 'host'):
            raise ValueError(f"system.label_assign must be 'device' or "
                             f"'host', got {mode!r}")
        self._device_labels = mode == 'device'
        if getattr(config.augment, 'device', False) and not self._device_labels:
            raise ValueError(
                "augment.device=on needs system.label_assign='device': the "
                'host assigner cannot see boxes transformed on device')
        if self._batch_size % num_hosts:
            raise ValueError(f'train.batch_size={self._batch_size} must be '
                             f'divisible by num_hosts={num_hosts}')
        self._num_hosts = num_hosts
        self._host_id = host_id
        self._plan_rng = random.Random(getattr(config.system, 'seed', 0))

        with open(config.dataset.train_txt_file, 'r') as fr:
            self._imgs = [l.strip() for l in fr if l.strip()]
        self._num_imgs = len(self._imgs)
        # per-thread current input size: batches at different sizes may
        # assemble concurrently in the prefetcher
        self._tls = threading.local()

        self.sample_getter = SAMPLE_GETTER_REGISTER[self._name](
            mode='train', classes=self._classes,
            cache_images=getattr(config.dataset, 'cache_images', False),
        ).set_train_augment(config.augment, self._current_input_size,
                            self._sample_img_path)
        self.init_shuffle()

    @property
    def length(self):
        return self._num_imgs

    @property
    def batches_per_epoch(self):
        """Batches per epoch, rounded UP to a whole number of size groups
        so scan-unrolled training sees only full groups and the trainer's
        steps_per_epoch matches the steps that actually run (sampling is
        with replacement, so the extra batches are just more samples)."""
        n = ceil(self._num_imgs / self._batch_size)
        g = max(self._size_group, 1)
        return ceil(n / g) * g

    def __len__(self):
        return self._length

    def init_shuffle(self):
        n_batches = self.batches_per_epoch
        self._length = n_batches * self._batch_size
        self._indexes = self._plan_rng.choices(range(self._num_imgs),
                                               k=self._length)
        # one multi-scale size per size_group consecutive batches (group > 1
        # when train steps are scan-unrolled and must share a shape)
        g = max(self._size_group, 1)
        group_sizes = self._plan_rng.choices(self._input_sizes,
                                             k=ceil(n_batches / g))
        self._sizes = [group_sizes[i // g] for i in range(n_batches)]
        largest = int(np.argmax([h * w for h, w in self._input_sizes]))
        for i in range(min(g, n_batches)):
            self._sizes[i] = self._input_sizes[largest]
        self.input_size = self._sizes[0]

    def _current_input_size(self):
        return getattr(self._tls, 'input_size', self.input_size)

    def _sample_img_path(self):
        return self._imgs[random.randint(0, self._num_imgs - 1)]

    def build_sample(self, img_index: int, size):
        """Decode + augment (+ label-assign in host mode) one image-list
        entry at the given input size (plan-independent; both loaders).

        Device mode returns (image, gt) with gt = (max_gt, 6) zero-padded
        raw boxes; host mode returns (image, labels(3), padded_boxes(3))."""
        self._tls.input_size = size
        image, bboxes = self.sample_getter(self._imgs[img_index])
        if len(bboxes) == 0:
            bboxes = np.zeros((0, 6), np.float32)
        if self._device_labels:
            bboxes = np.asarray(bboxes, np.float32)
            if bboxes.shape[-1] == 5:
                # augment.device chains skip host Mixup (the weight-column
                # producer): weights default to 1, set on device instead
                bboxes = np.concatenate(
                    [bboxes, np.ones((len(bboxes), 1), np.float32)], axis=-1)
            bboxes = bboxes.reshape(-1, 6)
            gt = np.zeros((self._max_gt, 6), np.float32)
            n = min(len(bboxes), self._max_gt)
            gt[:n] = bboxes[:n]
            if len(bboxes) > self._max_gt \
                    and not getattr(TrainData, '_warned_truncate', False):
                TrainData._warned_truncate = True
                import warnings
                warnings.warn(
                    f'GT boxes exceeded model.max_gt_boxes={self._max_gt} '
                    f'and were dropped; raise model.max_gt_boxes for '
                    f'crowded datasets (warned once)', stacklevel=2)
            return image, gt
        labels, padded = assign_labels(
            bboxes, size, self._strides, self._anchors,
            self._num_classes, self._gt_per_grid, self._iou_threshold,
            self._max_gt)
        # uint8 images stay uint8 (normalized on device, 4x fewer upload
        # bytes); float images (a host-side Normalize chain) stay float
        return image, labels, padded

    def get(self, index: int):
        """One training sample at the batch's planned size — device-label
        mode (default): (uint8 HWC image, (max_gt, 6) padded gt boxes);
        host mode: (image, labels(3), padded boxes(3))."""
        size = self._sizes[index // self._batch_size]
        return self.build_sample(self._indexes[index], size)

    def batch_indices(self) -> List[List[int]]:
        """This host's slice of each global batch (full batches on 1 host)."""
        b = self._batch_size
        lb = b // self._num_hosts
        lo = self._host_id * lb
        return [list(range(i * b + lo, i * b + lo + lb))
                for i in range(self.batches_per_epoch)]


def make_batch(data: TrainData, indices: List[int], pool=None) -> dict:
    """Assemble one batch dict from sample indices: {'image', 'gt'} in
    device-label mode, {'image', 'targets'} in host mode."""
    samples = list(pool.map(data.get, indices)) if pool is not None \
        else [data.get(i) for i in indices]
    images = np.stack([s[0] for s in samples])
    if len(samples[0]) == 2:  # device-label mode
        return {'image': images, 'gt': np.stack([s[1] for s in samples])}
    labels = [np.stack([s[1][k] for s in samples]) for k in range(3)]
    boxes = [np.stack([s[2][k] for s in samples]) for k in range(3)]
    return {'image': images, 'targets': tuple(labels + boxes)}


def epoch_batches(data: TrainData, num_workers: int = 4,
                  prefetch: int = 2) -> Iterator[dict]:
    """Iterate one epoch of host batches: samples decode/augment in a
    worker thread pool (cv2/numpy release the GIL) while a small assembly
    pool keeps `prefetch` batches in flight ahead of the consumer."""
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor
    samples = ThreadPoolExecutor(max_workers=max(num_workers, 1))
    assembler = ThreadPoolExecutor(max_workers=max(prefetch, 1))
    try:
        pending = deque()
        for idx_list in data.batch_indices():
            while len(pending) >= max(prefetch, 1):
                yield pending.popleft().result()
            pending.append(assembler.submit(make_batch, data, idx_list, samples))
        while pending:
            yield pending.popleft().result()
    finally:
        # wait=False: an abandoned generator finalised during interpreter
        # shutdown cannot join threads (threading internals are already
        # torn down -> "TypeError: 'NoneType' object is not callable"
        # noise in CLI logs); workers are daemonic enough to drop
        assembler.shutdown(wait=False, cancel_futures=True)
        samples.shutdown(wait=False, cancel_futures=True)


# ---------------------------------------------------- process-based loader

_MP_DATA = None
_MP_SLABS = {}


def _mp_init(config, seed: int):
    """Spawned-worker initializer: rebuild TrainData from the (picklable)
    config. The import chain (cv2/numpy/pqdet_tpu.data) never touches JAX,
    so workers stay lean."""
    global _MP_DATA
    import os
    import cv2
    cv2.setNumThreads(0)
    _MP_DATA = TrainData(config)
    wid = os.getpid()
    random.seed((seed * 1_000_003) ^ wid)
    np.random.seed(((seed * 9973) ^ wid) % (2 ** 31))


def _slab(name):
    from multiprocessing import shared_memory
    sm = _MP_SLABS.get(name)
    if sm is None:
        sm = _MP_SLABS[name] = shared_memory.SharedMemory(name=name)
    return sm


def _batch_layout(n, size, strides, gt_per_grid, num_classes, max_gt,
                  device_labels=False):
    """[(shape, dtype, offset)] for one slab: image (uint8) + either the
    raw GT boxes (device-label mode) or labels x3 + boxes x3 (host)."""
    h, w = size
    specs = [((n, h, w, 3), np.uint8)]
    if device_labels:
        specs += [((n, max_gt, 6), np.float32)]
    else:
        specs += [((n, h // s, w // s, gt_per_grid, 6 + num_classes),
                   np.float32) for s in strides]
        specs += [((n, max_gt, 4), np.float32)] * 3
    offs, off = [], 0
    for sh, dt in specs:
        offs.append((sh, dt, off))
        off += int(np.prod(sh)) * np.dtype(dt).itemsize
    return offs, off


def _mp_build_batch(task):
    """(image-list indices, (h, w) size, slab name) -> shapes metadata;
    the arrays land in the shared-memory slab (pickling a ~50 MB batch
    through the multiprocessing pipe measured 19 imgs/s end-to-end —
    SLOWER than the thread loader; shared memory + a parent-side memcpy
    runs at memory speed)."""
    img_indices, size, slab_name = task
    d = _MP_DATA
    samples = [d.build_sample(i, tuple(size)) for i in img_indices]
    layout, total = _batch_layout(len(img_indices), size, d._strides,
                                  d._gt_per_grid, d._num_classes, d._max_gt,
                                  d._device_labels)
    buf = _slab(slab_name).buf
    arrays = [np.ndarray(sh, dt, buf, off) for sh, dt, off in layout]
    for j, sample in enumerate(samples):
        if sample[0].dtype != np.uint8:
            # the slab layout is uint8; a silent downcast of float images
            # (a custom host-side Normalize chain) would train on garbage
            raise TypeError(
                f'system.loader=process requires uint8 train images '
                f'(device-side normalization), got {sample[0].dtype}; '
                f'use the thread loader for float-image chains')
        arrays[0][j] = sample[0]
        if d._device_labels:
            arrays[1][j] = sample[1]
        else:
            for k in range(3):
                arrays[1 + k][j] = sample[1][k]
                arrays[4 + k][j] = sample[2][k]
    return [(sh, np.dtype(dt).str) for sh, dt, _ in layout]


class ProcessLoader:
    """Persistent spawn-based worker pool for epoch iteration.

    The thread-pool loader tops out at ~45 imgs/s on a VOC-scale corpus
    with the full augment chain (mosaic+mixup) — per-sample Python
    (augment control flow, label assignment, small numpy ops) holds the
    GIL, so threads cannot scale past ~1/GIL-share regardless of count,
    while the v5e consumes 389 imgs/s (measured round 3). Processes
    remove the GIL; batches travel through shared-memory slabs (one
    parent-side memcpy each) because pickling them through the pipe
    measured slower than the thread loader.

    The pool and slabs persist across epochs. Workers never see the
    epoch plan: the parent resolves every batch to (image indices, size)
    and ships those, so shuffle/multi-scale semantics are identical to
    the thread loader. Per-sample augment randomness is worker-local
    (the multi-host contract, see TrainData).
    """

    def __init__(self, data: TrainData, num_workers: int = 8,
                 prefetch: int = 4):
        import multiprocessing as mp
        from multiprocessing import shared_memory
        self._data = data
        self._prefetch = max(prefetch, 1)
        n_local = data._batch_size // data._num_hosts
        biggest = max(data._input_sizes, key=lambda s: s[0] * s[1])
        _, slab_bytes = _batch_layout(
            n_local, biggest, data._strides, data._gt_per_grid,
            data._num_classes, data._max_gt, data._device_labels)
        if getattr(data._config.dataset, 'cache_images', False) \
                and num_workers > 1:
            # every spawned worker rebuilds TrainData and fills its OWN
            # decoded-image cache; over an epoch each worker touches most
            # of the corpus, so RAM cost approaches num_workers x the
            # full-corpus cache (~0.8 MB/image each)
            print(f'ProcessLoader: dataset.cache_images duplicates the '
                  f'decoded-image cache in each of the {num_workers} '
                  f'workers (~{num_workers}x corpus RAM); prefer the '
                  f'thread loader or fewer workers with large corpora')
        n_slabs = self._prefetch + 2
        self._slabs = [shared_memory.SharedMemory(create=True,
                                                  size=slab_bytes)
                       for _ in range(n_slabs)]
        self._free = [sm.name for sm in self._slabs]
        ctx = mp.get_context('spawn')
        seed = getattr(data._config.system, 'seed', 0)
        self._pool = ctx.Pool(max(num_workers, 1), initializer=_mp_init,
                              initargs=(data._config, seed))
        self._by_name = {sm.name: sm for sm in self._slabs}

    def _materialise(self, slab_name, specs):
        buf = self._by_name[slab_name].buf
        out, off = [], 0
        for sh, dtype_str in specs:
            dt = np.dtype(dtype_str)
            a = np.ndarray(sh, dt, buf, off)
            out.append(a.copy())  # memcpy out; slab becomes reusable
            off += int(np.prod(sh)) * dt.itemsize
        if self._data._device_labels:
            return {'image': out[0], 'gt': out[1]}
        return {'image': out[0], 'targets': tuple(out[1:])}

    def epoch(self) -> Iterator[dict]:
        """Yield this epoch's batches; bounded in-flight window."""
        data = self._data
        tasks = iter([
            ([data._indexes[i] for i in idx_list], tuple(data._sizes[bi]))
            for bi, idx_list in enumerate(data.batch_indices())])
        from collections import deque
        pending = deque()

        def submit(t):
            name = self._free.pop()
            return name, self._pool.apply_async(_mp_build_batch,
                                                ((t[0], t[1], name),))

        try:
            for t in (next(tasks, None) for _ in range(self._prefetch)):
                if t is not None:
                    pending.append(submit(t))
            while pending:
                name, fut = pending.popleft()
                shapes = fut.get()
                batch = self._materialise(name, shapes)
                self._free.append(name)
                nxt = next(tasks, None)
                if nxt is not None:
                    pending.append(submit(nxt))
                yield batch
        finally:
            # an abandoned generator (exception in the train loop, e.g. the
            # NaN guard) must return in-flight slab names to the free list
            # or the pool shrinks by one per abandonment until submit()
            # pops from an empty list. Wait for each worker write to finish
            # before the slab becomes reusable.
            while pending:
                name, fut = pending.popleft()
                fut.wait(timeout=60)
                if not fut.ready():
                    print(f'ProcessLoader: worker still writing slab {name} '
                          f'60 s after abandon; reclaiming anyway')
                self._free.append(name)

    def close(self):
        self._pool.terminate()
        self._pool.join()
        for sm in self._slabs:
            try:
                sm.close()
                sm.unlink()
            except FileNotFoundError:
                pass
