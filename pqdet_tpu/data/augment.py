"""Host-side image/bbox augmentations (numpy + cv2).

Each transform is a callable ``(image, bboxes) -> (image, bboxes)``; bboxes
are (N, 5+) float arrays [x1, y1, x2, y2, class, (mixup weight)] in absolute
pixels. Semantics follow the reference chain (dataset/augment.py) so
training distributions match; these run on CPU feeding the device pipeline.
"""

from __future__ import annotations

from math import ceil
from typing import Callable, Sequence, Tuple, Union

import cv2
import numpy as np

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

SizeT = Union[Tuple[int, int], Callable[[], Tuple[int, int]]]


def _get_size(size: SizeT) -> Tuple[int, int]:
    return size() if callable(size) else size


def filter_degenerate_boxes(original: np.ndarray, cropped: np.ndarray,
                            iou_threshold=0.3, area_threshold=56,
                            ratio_threshold=10) -> np.ndarray:
    """Drop boxes that a crop mangled: small area, extreme aspect ratio, or
    small survival fraction (reference _filter_bboxes_by_iou_area_ratio,
    dataset/augment.py:22-31)."""
    w = cropped[:, 2] - cropped[:, 0]
    h = cropped[:, 3] - cropped[:, 1]
    area = w * h
    area0 = (original[:, 2] - original[:, 0]) * (original[:, 3] - original[:, 1])
    aspect = np.maximum(w / (h + 1e-16), h / (w + 1e-16))
    keep = (area > area_threshold) & (area / (area0 + 1e-16) > iou_threshold) \
        & (aspect < ratio_threshold)
    return cropped[keep]


class Compose:
    def __init__(self, transforms: Sequence):
        self.transforms = list(transforms)

    def __call__(self, img, bboxes):
        for t in self.transforms:
            img, bboxes = t(img, bboxes)
        return img, bboxes


class Empty:
    def __call__(self, img, bboxes):
        return img, bboxes


class RandomCrop:
    """Fixed-size random crop with degenerate-box filtering."""

    def __init__(self, size: Tuple[int, int], p=0.5, iou_threshold=0.3,
                 area_threshold=56, ratio_threshold=10):
        self.size = size
        self.p = p
        self.filter_args = (iou_threshold, area_threshold, ratio_threshold)

    def __call__(self, img, bboxes):
        if np.random.random() > self.p:
            return img, bboxes
        h, w = img.shape[:2]
        ch, cw = self.size
        x0 = np.random.randint(0, max(w - cw, 0) + 1)
        y0 = np.random.randint(0, max(h - ch, 0) + 1)
        img = img[y0:min(y0 + ch, h), x0:min(x0 + cw, w), :]
        if len(bboxes) == 0:
            return img, bboxes
        new = bboxes.copy()
        new[:, [0, 2]] = np.clip(new[:, [0, 2]] - x0, 0, cw)
        new[:, [1, 3]] = np.clip(new[:, [1, 3]] - y0, 0, ch)
        return img, filter_degenerate_boxes(bboxes, new, *self.filter_args)


class RandomSafeCrop:
    """Random crop that never cuts into a GT box (reference augment.py:81)."""

    def __init__(self, p=0.5):
        self.p = p

    def __call__(self, img, bboxes):
        if np.random.random() > self.p:
            return img, bboxes
        h, w = img.shape[:2]
        if len(bboxes) > 0:
            hull = np.round(np.concatenate([bboxes[:, :2].min(0),
                                            bboxes[:, 2:4].max(0)]))
        else:
            cx, cy = w // 2, h // 2
            hull = np.array([cx, cy, cx + 1, cy + 1])
        x0 = np.random.randint(0, int(hull[0]) + 1)
        y0 = np.random.randint(0, int(hull[1]) + 1)
        x1 = np.random.randint(int(hull[2]), w + 1)
        y1 = np.random.randint(int(hull[3]), h + 1)
        img = img[y0:y1, x0:x1, :]
        if len(bboxes) != 0:
            bboxes[:, [0, 2]] -= x0
            bboxes[:, [1, 3]] -= y0
        return img, bboxes


class RandomHFlip:
    def __init__(self, p=0.5):
        self.p = p

    def __call__(self, img, bboxes):
        if np.random.random() > self.p:
            return img, bboxes
        w = img.shape[1]
        img = img[:, ::-1, :]
        if len(bboxes) != 0:
            bboxes[:, [0, 2]] = w - bboxes[:, [2, 0]]
        return img, bboxes


class RandomVFlip:
    def __init__(self, p=0.5):
        self.p = p

    def __call__(self, img, bboxes):
        if np.random.random() > self.p:
            return img, bboxes
        h = img.shape[0]
        img = img[::-1, :, :]
        if len(bboxes) != 0:
            bboxes[:, [1, 3]] = h - bboxes[:, [3, 1]]
        return img, bboxes


class ColorJitter:
    """Brightness/contrast/saturation in random order (uint8 in/out)."""

    def __init__(self, brightness=(-0.1, 0.1), contrast=(0.8, 1.2),
                 saturation=(0.1, 2.0), p=1.0):
        self.brightness = brightness
        self.contrast = contrast
        self.saturation = saturation
        self.p = p

    def _brightness(self, img):
        b = np.random.uniform(*self.brightness) * 255
        return np.clip(img + round(b), 0, 255)

    def _contrast(self, img):
        c = np.random.uniform(*self.contrast)
        return np.clip(img * c, 0, 255).astype(np.int32)

    def _saturation(self, img):
        gray = cv2.cvtColor(img.astype(np.uint8), cv2.COLOR_RGB2GRAY)
        s = np.random.uniform(*self.saturation)
        return np.clip(s * img + (1 - s) * gray[..., None], 0, 255).astype(np.int32)

    def __call__(self, img, bboxes):
        if np.random.random() > self.p:
            return img, bboxes
        ops = [self._brightness, self._contrast, self._saturation]
        np.random.shuffle(ops)
        img = img.astype(np.int32)
        for op in ops:
            img = op(img)
        return img.astype(np.uint8), bboxes


class CutOut:
    def __init__(self, size: int, n_holes: int, p=0.5, pad_val=128):
        self.half = size // 2
        self.n_holes = n_holes
        self.p = p
        self.pad_val = pad_val

    def __call__(self, img, bboxes):
        if np.random.random() > self.p:
            return img, bboxes
        h, w = img.shape[:2]
        for _ in range(self.n_holes):
            y, x = np.random.randint(0, h), np.random.randint(0, w)
            y0, y1 = np.clip([y - self.half, y + self.half], 0, h)
            x0, x1 = np.clip([x - self.half, x + self.half], 0, w)
            img[y0:y1, x0:x1, :] = self.pad_val
        return img, bboxes


def fold_norm_affine(mean, std):
    """(x/255 - mean)/std == x*scale + bias. THE single definition of the
    folded normalization affine: augment.Normalize (host) and
    ops/preprocess.device_normalize (on-device uint8 path) must stay
    bit-identical, so both derive their constants here."""
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    return ((1.0 / (255.0 * std)).astype(np.float32),
            (-mean / std).astype(np.float32))


NORM_SCALE, NORM_BIAS = fold_norm_affine(IMAGENET_MEAN, IMAGENET_STD)


class Normalize:
    def __init__(self, mean=IMAGENET_MEAN, std=IMAGENET_STD):
        self.mean = np.array(mean, np.float32)
        self.std = np.array(std, np.float32)
        # folded affine applied in-place (the naive expression allocates 3
        # full-image temps and was the single hottest line of the sample
        # pipeline at 3.8 ms/sample on this 1-core host)
        self._scale, self._bias = fold_norm_affine(mean, std)

    def __call__(self, img, bboxes):
        img = img.astype(np.float32)  # always a fresh buffer -> in-place ok
        img *= self._scale
        img += self._bias
        return img, bboxes


class DeNormalize:
    def __init__(self, mean=IMAGENET_MEAN, std=IMAGENET_STD):
        self.mean = np.array(mean, np.float32)
        self.std = np.array(std, np.float32)

    def __call__(self, img, bboxes):
        img = np.clip((img * self.std + self.mean) * 255.0, 0, 255)
        return img.astype(np.uint8), bboxes


class Resize:
    """Letterbox: aspect-preserving resize + center pad to target size."""

    def __init__(self, size: SizeT, pad_val=128, nopad=False):
        self.size = size
        self.pad_val = pad_val
        self.nopad = nopad

    def __call__(self, img, bboxes):
        th, tw = _get_size(self.size)
        ih, iw = img.shape[:2]
        ratio = min(tw / iw, th / ih)
        rw, rh = round(ratio * iw), round(ratio * ih)
        img = cv2.resize(img, (rw, rh), interpolation=cv2.INTER_LINEAR)
        if self.nopad:
            dl = du = 0
        elif (rw, rh) != (tw, th):
            dl = (tw - rw) // 2
            du = (th - rh) // 2
            # full+assign beats np.pad's generic path ~2x on this hot loop
            canvas = np.full((th, tw) + img.shape[2:], self.pad_val,
                             img.dtype)
            canvas[du:du + rh, dl:dl + rw] = img
            img = canvas
        else:
            dl = du = 0
        if len(bboxes) != 0:
            bboxes[:, [0, 2]] = bboxes[:, [0, 2]] * ratio + dl
            bboxes[:, [1, 3]] = bboxes[:, [1, 3]] * ratio + du
        return img, bboxes


class ResizeRatio:
    def __init__(self, ratio: Union[float, Tuple[float, float]]):
        self.ratio = (ratio, ratio) if np.isscalar(ratio) else tuple(ratio)

    def __call__(self, img, bboxes):
        th = round(self.ratio[0] * img.shape[0])
        tw = round(self.ratio[1] * img.shape[1])
        img = cv2.resize(img, (tw, th), interpolation=cv2.INTER_LINEAR)
        if len(bboxes) != 0:
            bboxes[:, [0, 2]] *= self.ratio[1]
            bboxes[:, [1, 3]] *= self.ratio[0]
        return img, bboxes


class PadNearestDivisor:
    def __init__(self, pad_val=128, divisor=32):
        self.pad_val = pad_val
        self.divisor = divisor

    def __call__(self, img, bboxes):
        ih, iw = img.shape[:2]
        th = int(ceil(ih / self.divisor) * self.divisor)
        tw = int(ceil(iw / self.divisor) * self.divisor)
        dl = (tw - iw) // 2
        du = (th - ih) // 2
        img = np.pad(img, ((du, th - ih - du), (dl, tw - iw - dl), (0, 0)),
                     'constant', constant_values=self.pad_val)
        if len(bboxes) != 0:
            bboxes[:, [0, 2]] += dl
            bboxes[:, [1, 3]] += du
        return img, bboxes


class Mixup:
    """Beta-blend with a second sample; appends the mixup weight as a bbox
    column (reference augment.py:300-329)."""

    def __init__(self, sampler: Callable, p=0.5, beta=1.0):
        self.sampler = sampler
        self.p = p
        self.beta = beta

    @staticmethod
    def _with_weight(bboxes, weight):
        if len(bboxes) == 0:
            return bboxes
        col = np.full((len(bboxes), 1), weight, np.float32)
        return np.concatenate([bboxes, col], axis=-1)

    def __call__(self, img, bboxes):
        if np.random.random() > self.p:
            return img, self._with_weight(bboxes, 1.0)
        img2, bboxes2 = self.sampler()
        if img.shape != img2.shape:
            # train chains always Resize both partners to the input size;
            # a silent float blend of mismatched frames would also defeat
            # the uint8==unnormalized / float==normalized dtype contract
            raise ValueError(f'mixup partners must share a shape, got '
                             f'{img.shape} vs {img2.shape}')
        lam = np.random.beta(self.beta, self.beta)
        if img.dtype == np.uint8 and img2.dtype == np.uint8:
            # single fused SIMD blend (sub-LSB rounding vs the float path)
            img = cv2.addWeighted(img, lam, img2, 1.0 - lam, 0.0)
        else:
            img = lam * np.asarray(img, np.float32) \
                + (1 - lam) * np.asarray(img2, np.float32)
        parts = [b for b in (self._with_weight(bboxes, lam),
                             self._with_weight(bboxes2, 1 - lam)) if len(b)]
        if not parts:
            # both partners box-free: empty labels (all-background grids,
            # identical under the host and device label assigners; the
            # reference's zeros-row placeholder instead gridded one
            # mixw=0 pseudo-box at cell (0,0) — loss-inert there, but it
            # would diverge between the two assignment modes here)
            return img, np.zeros((0, 6), np.float32)
        return img, np.concatenate(parts)


class Mosaic:
    """4-image 2x2 mosaic cropped back to the target size
    (reference augment.py:331-388)."""

    def __init__(self, sampler: Callable, size: SizeT, pad_val=128, p=1.0):
        self.sampler = sampler
        self.size = size
        self.pad_val = pad_val
        self.p = p

    def __call__(self, img, bboxes):
        if np.random.random() > self.p:
            return img, bboxes
        ih, iw = _get_size(self.size)
        xc = int(np.random.uniform(iw * 0.5, iw * 1.5))
        yc = int(np.random.uniform(ih * 0.5, ih * 1.5))
        # Box placement runs in the VIRTUAL (2ih, 2iw) mosaic frame (the
        # classic formula), but pixels paste straight into the final
        # (ih, iw) window [ih/2:3ih/2, iw/2:3iw/2) — the full 2x canvas
        # (4x the memset + paste bytes, then a crop) never materialises.
        wx0, wy0 = iw // 2, ih // 2
        canvas = np.full((ih, iw, 3), self.pad_val, np.uint8)

        others = [self.sampler() for _ in range(3)]
        all_imgs = [(img, bboxes)] + list(others)
        originals = np.concatenate([b for _, b in all_imgs if len(b)] or
                                   [np.zeros((0, 5), np.float32)], axis=0)
        placed = []
        for i, (image, bbs) in enumerate(all_imgs):
            h, w = image.shape[:2]
            if i == 0:
                xa = (max(xc - w, 0), max(yc - h, 0), xc, yc)
                xb = (w - (xa[2] - xa[0]), h - (xa[3] - xa[1]), w, h)
            elif i == 1:
                xa = (xc, max(yc - h, 0), min(xc + w, iw * 2), yc)
                xb = (0, h - (xa[3] - xa[1]), min(w, xa[2] - xa[0]), h)
            elif i == 2:
                xa = (max(xc - w, 0), yc, xc, min(ih * 2, yc + h))
                xb = (w - (xa[2] - xa[0]), 0, max(xc, w), min(xa[3] - xa[1], h))
            else:
                xa = (xc, yc, min(xc + w, iw * 2), min(ih * 2, yc + h))
                xb = (0, 0, min(w, xa[2] - xa[0]), min(xa[3] - xa[1], h))
            # intersect the virtual dest rect with the output window and
            # shift the source rect by the clipped amount
            dx0, dy0 = max(xa[0], wx0), max(xa[1], wy0)
            dx1, dy1 = min(xa[2], wx0 + iw), min(xa[3], wy0 + ih)
            if dx0 < dx1 and dy0 < dy1:
                sx0 = xb[0] + (dx0 - xa[0])
                sy0 = xb[1] + (dy0 - xa[1])
                canvas[dy0 - wy0:dy1 - wy0, dx0 - wx0:dx1 - wx0] = \
                    image[sy0:sy0 + (dy1 - dy0), sx0:sx0 + (dx1 - dx0)]
            if len(bbs):
                bbs = bbs.copy()
                bbs[:, [0, 2]] = np.clip(bbs[:, [0, 2]], xb[0], xb[2]) + xa[0] - xb[0]
                bbs[:, [1, 3]] = np.clip(bbs[:, [1, 3]], xb[1], xb[3]) + xa[1] - xb[1]
                placed.append(bbs)

        merged = np.concatenate(placed, axis=0) if placed \
            else np.zeros((0, 5), np.float32)
        if len(merged):
            merged[:, [0, 2]] = np.clip(merged[:, [0, 2]] - iw / 2, 0, iw)
            merged[:, [1, 3]] = np.clip(merged[:, [1, 3]] - ih / 2, 0, ih)
            merged = filter_degenerate_boxes(originals, merged,
                                             iou_threshold=0.2, area_threshold=25)
        return canvas, merged
