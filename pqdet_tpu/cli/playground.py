"""Augmentation playground: visualise the train-time augment chain
(reference dataset/playground.py, which had bit-rotted; this one writes an
image grid instead of an interactive UI so it works headless).

    python -m pqdet_tpu.cli.playground --yaml exp.yaml --img path.jpg \
        [--n 8] [--out playground.jpg]
"""

from __future__ import annotations

import argparse

import cv2
import numpy as np


def augmented_samples(cfg, img_path: str, n: int = 8):
    from pqdet_tpu.data import augment
    from pqdet_tpu.data.samples import SAMPLE_GETTER_REGISTER

    name = cfg.dataset.name.lower()
    getter = SAMPLE_GETTER_REGISTER[name](
        mode='train', classes=list(cfg.dataset.classes))
    getter.set_train_augment(cfg.augment, (416, 416), lambda: img_path)
    denorm = augment.DeNormalize(augment.IMAGENET_MEAN, augment.IMAGENET_STD)

    outs = []
    for _ in range(n):
        image, bboxes = getter(img_path)
        if image.dtype != np.uint8:  # host-normalized float chain
            image, _ = denorm(np.asarray(image, np.float32), [])
        image = np.ascontiguousarray(image, dtype=np.uint8)
        if len(bboxes):
            for bb in np.asarray(bboxes, np.float32):
                x1, y1, x2, y2 = (int(round(v)) for v in bb[:4])
                cv2.rectangle(image, (x1, y1), (x2, y2), (0, 255, 0), 2)
        outs.append(image)
    return outs


def grid(images, cols: int = 4, pad: int = 4) -> np.ndarray:
    h = max(im.shape[0] for im in images)
    w = max(im.shape[1] for im in images)
    rows = (len(images) + cols - 1) // cols
    canvas = np.full((rows * (h + pad), cols * (w + pad), 3), 32, np.uint8)
    for i, im in enumerate(images):
        r, c = divmod(i, cols)
        canvas[r * (h + pad):r * (h + pad) + im.shape[0],
               c * (w + pad):c * (w + pad) + im.shape[1]] = im
    return canvas


def main():
    parser = argparse.ArgumentParser(description='augment playground')
    parser.add_argument('--img', required=True)
    parser.add_argument('--yaml', default=None)
    parser.add_argument('--n', type=int, default=8)
    parser.add_argument('--out', default='playground.jpg')
    args, rest = parser.parse_known_args()

    from pqdet_tpu.config import load_config
    cfg = load_config(args.yaml, rest)
    samples = augmented_samples(cfg, args.img, args.n)
    out = grid(samples)
    cv2.imwrite(args.out, cv2.cvtColor(out, cv2.COLOR_RGB2BGR))
    print(f'saved: {args.out} ({len(samples)} augmented views)')


if __name__ == '__main__':
    main()
