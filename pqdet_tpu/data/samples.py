"""Per-dataset sample getters + registries.

Mirrors the reference registries (dataset/__init__.py:5-21): a sample getter
parses labels + wires augmentation per dataset; eval-augment factories
preprocess inference inputs; recover entries give the matching on-device
inverse affine (pqdet_tpu.ops.postprocess).

Label formats (parity):
- VOC: per-image XML next to JPEGImages (difficult flag honoured,
  dataset/voc_sample.py:24-48)
- COCO: darknet txt, relative (cls, cx, cy, w, h) (dataset/coco_sample.py:18-41)
- VisDrone: csv txt (x, y, w, h, score, category, ...); categories 0/11
  dropped, score->difficulty (dataset/visdrone_sample.py:19-45)
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Sequence
from xml.etree.ElementTree import parse as xml_parse

import cv2
import numpy as np

from pqdet_tpu.data import augment
from pqdet_tpu.ops.postprocess import letterbox_affine, ratio_pad_affine


class BaseSampleGetter:
    """Loads (image, labels) by image path; mode in 'train'/'eval'/'test'."""

    def __init__(self, mode: str = 'train',
                 classes: Optional[Sequence[str]] = None,
                 cache_images: bool = False):
        self.mode = mode
        self.cls_to_idx = {c: i for i, c in enumerate(classes)} if classes else None
        self.train_augment = augment.Empty()
        self.eval_augment = augment.Empty()
        self.compose_augment = None
        # dataset.cache_images: keep decoded RGB uint8 arrays in RAM and
        # hand out copies (the augment chain mutates crop views in place,
        # e.g. CutOut). A copy is ~0.1 ms vs ~6 ms imdecode — the decode
        # cost dominates per-sample time on loader-bound hosts. Parsed
        # labels are cached alongside (profiling showed the XML re-parse
        # costs ~0.3 ms per sampler call, ~3 calls/sample under mosaic).
        self._img_cache = {} if cache_images else None
        self._label_cache = {} if cache_images else None

    def __call__(self, img_path: str):
        return {'train': self.train, 'eval': self.eval, 'test': self.test}[self.mode](img_path)

    @property
    def is_train(self):
        return self.mode == 'train'

    @staticmethod
    def _decode(img_path: str) -> np.ndarray:
        img = cv2.imread(img_path)
        if img is None:
            raise FileNotFoundError(f'image not found: {img_path}')
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)

    def image(self, img_path: str) -> np.ndarray:
        if self._img_cache is None:
            return self._decode(img_path)
        img = self._img_cache.get(img_path)
        if img is None:
            img = self._img_cache[img_path] = self._decode(img_path)
        return img.copy()

    @staticmethod
    def shape(image: np.ndarray) -> np.ndarray:
        return np.array(image.shape[:2], np.float32)  # (h, w)

    def label(self, img_path: str):
        raise NotImplementedError

    def _cached_label(self, img_path: str):
        """label() through the cache (train mode: a plain bbox array,
        copied out because the augment chain mutates boxes in place)."""
        if self._label_cache is None:
            return self.label(img_path)
        lab = self._label_cache.get(img_path)
        if lab is None:
            lab = self._label_cache[img_path] = self.label(img_path)
        return lab.copy()

    def test(self, img_path: str):
        image = self.image(img_path)
        return image, self.shape(image)

    def base_train(self, img_path: str):
        image = self.image(img_path)
        bboxes = self._cached_label(img_path)
        return self.train_augment(image, bboxes)

    def train(self, img_path: str):
        image, bboxes = self.base_train(img_path)
        if self.compose_augment is not None:
            image, bboxes = self.compose_augment(image, bboxes)
        return image, bboxes

    def eval(self, img_path: str):
        image = self.image(img_path)
        shape = self.shape(image)
        image, _ = self.eval_augment(image, [])
        bboxes, diffs = self.label(img_path)
        return image, os.path.basename(img_path), shape, bboxes, diffs


def _device_augment(augment_cfg) -> bool:
    return bool(getattr(augment_cfg, 'device', False))


def _standard_train_chain(augment_cfg, input_size, extra_head=()):
    """Train chains are uint8 end-to-end: ImageNet normalization runs ON
    DEVICE (ops/preprocess.py device_normalize, dispatched by dtype in the
    train step), so batches ship as raw uint8 — 4x fewer host->device
    bytes and zero host-side float passes on loader-bound hosts. Same
    distribution as the reference's host-side Normalize (the affine
    commutes with the uint8 mixup/mosaic blends; see
    tests/test_data.py::test_device_normalize_parity)."""
    if _device_augment(augment_cfg):
        # augment.device: every stochastic transform runs inside the
        # jitted step (ops/augment_device.py); the host only letterboxes
        return augment.Compose([*extra_head, augment.Resize(input_size)])
    return augment.Compose([
        *extra_head,
        augment.RandomHFlip(p=augment_cfg.hflip_p),
        augment.RandomVFlip(p=augment_cfg.vflip_p),
        augment.RandomSafeCrop(p=augment_cfg.crop_p),
        augment.ColorJitter(p=augment_cfg.color_p),
        augment.Resize(input_size),
    ])


def _mosaic_p(augment_cfg) -> float:
    return getattr(augment_cfg, 'mosaic_p', 0.0)


def _compose_chain(augment_cfg, sampler, input_size):
    """[Mosaic ->] Mixup, the compose-augment stage (reference
    dataset/voc_sample.py:64-74). Both stages blend uint8 (one fused
    cv2.addWeighted instead of three float-image passes); normalization
    happens on device (see _standard_train_chain)."""
    if _device_augment(augment_cfg):
        return []  # mosaic/mixup run on device (ops/augment_device.py)
    chain = []
    if _mosaic_p(augment_cfg) > 0:
        chain.append(augment.Mosaic(sampler, size=input_size,
                                    p=_mosaic_p(augment_cfg)))
    chain.append(augment.Mixup(sampler, p=augment_cfg.mixup_p, beta=1.5))
    return chain


class VOCSampleGetter(BaseSampleGetter):

    def label(self, img_path: str):
        label_path = img_path.replace('JPEGImages', 'Annotations') \
            .replace('.jpg', '.xml')
        root = xml_parse(label_path).getroot()
        bbs, diffs = [], []
        for obj in root.findall('object'):
            diff = int(obj.find('difficult').text)
            if self.is_train and diff == 1:
                continue
            cls_idx = self.cls_to_idx[obj.find('name').text]
            bb = obj.find('bndbox')
            bbs.append([float(bb.find(k).text) for k in
                        ('xmin', 'ymin', 'xmax', 'ymax')] + [cls_idx])
            diffs.append(diff)
        bbs = np.array(bbs, np.float32).reshape(-1, 5)
        if self.is_train:
            return bbs
        return bbs, np.array(diffs)

    def set_train_augment(self, augment_cfg, input_size, img_path_sampler):
        self.train_augment = _standard_train_chain(augment_cfg, input_size)
        sampler = lambda: self.base_train(img_path_sampler())
        self.compose_augment = augment.Compose(
            _compose_chain(augment_cfg, sampler, input_size))
        return self

    def set_eval_augment(self, input_size, normalize=False):
        self.eval_augment = eval_augment_voc(input_size, normalize)
        return self


def eval_augment_voc(input_size, normalize=False):
    """Eval preprocessing. Default ships uint8 (ImageNet normalization runs
    on device via ops/preprocess.device_normalize — 4x fewer upload bytes);
    normalize=True keeps the reference's host-side float path
    (eval.host_normalize, pinned by cli/diffeval for bit-level parity
    against the torch reference's own float preprocessing)."""
    chain = [augment.Resize(input_size)]
    if normalize:
        chain.append(augment.Normalize())
    return augment.Compose(chain)


class COCOSampleGetter(BaseSampleGetter):

    def label(self, img_path: str):
        label_path = img_path.replace('images', 'labels').replace('.jpg', '.txt')
        bbs = []
        with open(label_path, 'r') as fr:
            for line in fr:
                parts = line.split()
                if not parts:
                    continue
                cls_idx = int(parts[0])
                cx, cy, w, h = map(float, parts[1:5])
                bbs.append([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2, cls_idx])
        bbs = np.array(bbs, np.float32).reshape(-1, 5)
        if self.is_train:
            return bbs
        return bbs, np.zeros(len(bbs))

    @staticmethod
    def _to_absolute(bboxes, shape):
        bboxes[:, :4] *= np.tile(shape[[1, 0]], 2)
        return bboxes

    def base_train(self, img_path: str):
        image = self.image(img_path)
        bboxes = self._to_absolute(self._cached_label(img_path),
                                   self.shape(image))
        return self.train_augment(image, bboxes)

    def set_train_augment(self, augment_cfg, input_size, img_path_sampler):
        self.train_augment = _standard_train_chain(augment_cfg, input_size)
        sampler = lambda: self.base_train(img_path_sampler())
        self.compose_augment = augment.Compose(
            _compose_chain(augment_cfg, sampler, input_size))
        return self

    def set_eval_augment(self, input_size, normalize=False):
        self.eval_augment = eval_augment_coco(input_size, normalize)
        return self

    def eval(self, img_path: str):
        image = self.image(img_path)
        shape = self.shape(image)
        bboxes, diffs = self.label(img_path)
        bboxes = self._to_absolute(bboxes, shape)
        image, _ = self.eval_augment(image, [])
        return image, os.path.basename(img_path), shape, bboxes, diffs


eval_augment_coco = eval_augment_voc


class VisDroneSampleGetter(BaseSampleGetter):

    def label(self, img_path: str):
        label_path = img_path.replace('images', 'annotations') \
            .replace('.jpg', '.txt')
        bbs, diffs = [], []
        with open(label_path, 'r') as fr:
            for line in fr:
                ann = line.split(',')
                if len(ann) < 6 or int(ann[5]) in (0, 11):
                    continue  # ignored-regions / others categories
                diff = 0 if int(ann[4]) == 1 else 1
                if self.is_train and diff == 1:
                    continue
                x, y, w, h = (int(ann[i]) for i in range(4))
                bbs.append([float(x), float(y), float(x + w), float(y + h),
                            int(ann[5]) - 1])
                diffs.append(diff)
        bbs = np.array(bbs, np.float32).reshape(-1, 5)
        if self.is_train:
            return bbs
        return bbs, np.array(diffs)

    def set_train_augment(self, augment_cfg, input_size, img_path_sampler):
        chain = [
            augment.RandomCrop((416, 416), p=1.0),
            augment.RandomHFlip(p=augment_cfg.hflip_p),
            augment.RandomVFlip(p=augment_cfg.vflip_p),
            augment.ColorJitter(p=augment_cfg.color_p),
            augment.Resize(input_size),
        ]
        self.train_augment = augment.Compose(chain)
        sampler = lambda: self.base_train(img_path_sampler())
        self.compose_augment = augment.Compose(
            _compose_chain(augment_cfg, sampler, input_size))
        return self

    def set_eval_augment(self, _input_size, normalize=False):
        self.eval_augment = eval_augment_visdrone(_input_size, normalize)
        return self


def eval_augment_visdrone(_input_size, normalize=False):
    chain = [
        augment.ResizeRatio(1.25),
        augment.PadNearestDivisor(),
    ]
    if normalize:
        chain.append(augment.Normalize())
    return augment.Compose(chain)


SAMPLE_GETTER_REGISTER = {
    'voc': VOCSampleGetter,
    'coco': COCOSampleGetter,
    'visdrone': VisDroneSampleGetter,
}

EVAL_AUGMENT_REGISTER = {
    'voc': eval_augment_voc,
    'coco': eval_augment_coco,
    'visdrone': eval_augment_visdrone,
}

# dataset name -> on-device inverse affine for pqdet_tpu.ops.postprocess
RECOVER_AFFINE_REGISTER = {
    'voc': letterbox_affine,
    'coco': letterbox_affine,
    'visdrone': functools.partial(ratio_pad_affine, resize_ratio=1.25, divisor=32),
}
