"""Generate VisDrone list files with area-proportional repeat sampling
(reference dataset/scripts/visdrone_txt.py): larger images appear more
often in the train list, with fractional repeats resolved by a Bernoulli
draw. Image sizes are read from JPEG headers via PIL (imagesize is not
installed).

    python -m pqdet_tpu.data.scripts.visdrone_txt [--root .]
"""

import argparse
import glob
import os

import numpy as np
from PIL import Image

SETS = ['VisDrone2019-DET-train', 'VisDrone2019-DET-val',
        'VisDrone2019-DET-test']


def repeat_count(ratio: float, rng: np.random.RandomState) -> int:
    frac = ratio % 1
    if frac == 0:
        return int(ratio)
    return int(np.floor(ratio) + rng.binomial(1, frac))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--root', default=os.getcwd())
    parser.add_argument('--seed', type=int, default=None)
    args = parser.parse_args()
    rng = np.random.RandomState(args.seed)
    root = os.path.abspath(args.root)

    trainval = []
    for s in SETS[:2]:
        trainval.extend(glob.glob(os.path.join(root, s, 'images/*.jpg')))
    test = glob.glob(os.path.join(root, SETS[2], 'images/*.jpg'))

    areas = {}
    for p in trainval:
        with Image.open(p) as img:
            w, h = img.size
        areas[p] = w * h
    min_area = min(set(areas.values()))

    with open(os.path.join(root, 'trainval.txt'), 'w') as fw:
        for p, area in areas.items():
            for _ in range(repeat_count(area / min_area, rng)):
                fw.write(os.path.abspath(p) + '\n')
    with open(os.path.join(root, 'test.txt'), 'w') as fw:
        for p in test:
            fw.write(os.path.abspath(p) + '\n')
    print(f'{len(trainval)} train/val images, {len(test)} test images')


if __name__ == '__main__':
    main()
