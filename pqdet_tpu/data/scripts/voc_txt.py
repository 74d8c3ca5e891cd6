"""Generate VOC train/test image list files (reference
dataset/scripts/voc_txt.py).

    python -m pqdet_tpu.data.scripts.voc_txt [--root .]

Expects the standard VOCdevkit layout; writes per-set txt lists, train.txt
(07+12 trainval) and train.all.txt.
"""

import argparse
import os

SETS = [('2012', 'train'), ('2012', 'val'), ('2007', 'train'),
        ('2007', 'val'), ('2007', 'test')]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--root', default=os.getcwd(),
                        help='directory containing VOCdevkit')
    args = parser.parse_args()
    root = os.path.abspath(args.root)

    written = {}
    for year, image_set in SETS:
        ids_file = os.path.join(root, f'VOCdevkit/VOC{year}/ImageSets/Main/{image_set}.txt')
        with open(ids_file) as fr:
            ids = fr.read().split()
        out = os.path.join(root, f'{year}_{image_set}.txt')
        with open(out, 'w') as fw:
            for image_id in ids:
                fw.write(f'{root}/VOCdevkit/VOC{year}/JPEGImages/{image_id}.jpg\n')
        written[(year, image_set)] = out

    def concat(paths, out):
        with open(out, 'w') as fw:
            for p in paths:
                fw.write(open(p).read())

    trainval = [written[k] for k in [('2007', 'train'), ('2007', 'val'),
                                     ('2012', 'train'), ('2012', 'val')]]
    concat(trainval, os.path.join(root, 'train.txt'))
    concat(trainval + [written[('2007', 'test')]],
           os.path.join(root, 'train.all.txt'))
    print('wrote train.txt / train.all.txt / per-set lists under', root)


if __name__ == '__main__':
    main()
