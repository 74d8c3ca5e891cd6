"""Joint image<->box alignment probe for the augment chains (CPU).

The round-5 epoch-5 matrix (reports/augab5_epoch5.json) exonerated every
MARGINAL statistic — box geometry, grids, sharpness, partner
independence — yet the host chain's crop+mosaic+mixup deliver +34 AP50
over flips-only at epoch 5 while the device chain's deliver ~0. This
probe measures the JOINT structure the marginals cannot see: mean HSV
saturation inside GT boxes minus outside (the clutter corpus draws
saturated shapes on noisy background, so aligned boxes sit on saturated
pixels; label/content misalignment dilutes the contrast).

Measured (48 corpus images, probabilities forced, 2026-08-21):

  stage        host mean/p10    device mean/p10
  flip         87.9 / 56.9      88.0 / 56.9     single stages: parity
  crop         89.5 / 56.7      89.1 / 54.7
  mosaic       88.9 / 60.4      90.6 / 59.7
  mixup        56.0 / 31.4      56.8 / 31.9
  crop+mos     95.8 / 62.8      92.2 / 56.3     compositions: drift
  mos+mix      51.3 / 32.1      50.5 / 24.7
  full chain   78.2 / 48.5      66.5 / 31.4     in-batch partners
  full fresh       -            68.5 / 39.9     fresh partners

The alignment p10 tracks the epoch-5 AP ordering exactly (host 0.82 at
48.5, dev fresh 0.44 at 39.9, dev in-batch 0.40 at 31.4): the device
chain composes a TAIL of weakly-aligned samples that no single stage
produces — the open lead for closing the early-regime gap.

    python tools/aug_joint_probe.py [--stages full-forced ...]
"""

import argparse
import random
import sys

sys.path.insert(0, '/root/repo')

import jax
jax.config.update('jax_platforms', 'cpu')

import cv2  # noqa: E402
import numpy as np  # noqa: E402

STAGES = {
    'flip': dict(hflip_p=0.5, crop_p=0.0, mosaic_p=0.0, mixup_p=0.0),
    'crop': dict(hflip_p=0.0, crop_p=1.0, mosaic_p=0.0, mixup_p=0.0),
    'mosaic': dict(hflip_p=0.0, crop_p=0.0, mosaic_p=1.0, mixup_p=0.0),
    'mixup': dict(hflip_p=0.0, crop_p=0.0, mosaic_p=0.0, mixup_p=1.0),
    'crop+mos': dict(hflip_p=0.0, crop_p=1.0, mosaic_p=1.0, mixup_p=0.0),
    'mos+mix': dict(hflip_p=0.0, crop_p=0.0, mosaic_p=1.0, mixup_p=1.0),
    'crop+mix': dict(hflip_p=0.0, crop_p=1.0, mosaic_p=0.0, mixup_p=1.0),
    'full-forced': dict(hflip_p=0.5, crop_p=0.75, mosaic_p=0.5,
                        mixup_p=0.5),
}


def box_alignment(img, boxes):
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = np.clip(np.round(img), 0, 255).astype(np.uint8)
    sat = cv2.cvtColor(img, cv2.COLOR_RGB2HSV)[..., 1].astype(np.float32)
    boxes = np.asarray(boxes, np.float32).reshape(-1, boxes.shape[-1]) \
        if len(boxes) else np.zeros((0, 6), np.float32)
    m = np.zeros(sat.shape, bool)
    n = 0
    for b in boxes:
        if b[2] > b[0] and b[3] > b[1]:
            m[int(b[1]):int(b[3]), int(b[0]):int(b[2])] = True
            n += 1
    if not n or m.all() or not m.any():
        return None
    return float(sat[m].mean() - sat[~m].mean())


def run_stage(cfg, paths, pdict, fresh=False):
    from pqdet_tpu.data import samples as S
    from pqdet_tpu.ops.augment_device import AugmentParams, device_augment

    random.seed(0)
    c = cfg.clone().defrost()
    c.augment.device = False
    for k, v in pdict.items():
        setattr(c.augment, k, v)
    for k in ('color_p', 'vflip_p'):
        setattr(c.augment, k, 0.0)
    c.freeze()
    gh = S.SAMPLE_GETTER_REGISTER['voc']('train', c.dataset.classes,
                                         cache_images=True)
    gh.set_train_augment(c.augment, (512, 512), lambda: random.choice(paths))
    hv = [v for v in (box_alignment(*gh.train(p)) for p in paths)
          if v is not None]

    random.seed(0)
    c2 = cfg.clone().defrost()
    c2.augment.device = True
    c2.freeze()
    gd = S.SAMPLE_GETTER_REGISTER['voc']('train', c2.dataset.classes,
                                         cache_images=True)
    gd.set_train_augment(c2.augment, (512, 512),
                         lambda: random.choice(paths))
    ap = AugmentParams(**pdict)

    def sample(p):
        img, boxes = gd.train(p)
        boxes = np.asarray(boxes, np.float32)
        if boxes.size and boxes.shape[-1] == 5:
            boxes = np.concatenate(
                [boxes, np.ones((len(boxes), 1), np.float32)], -1)
        g = np.zeros((64, 6), np.float32)
        n = min(len(boxes), 64)
        if n:
            g[:n] = boxes[:n]
        return np.asarray(img), g

    rng = jax.random.PRNGKey(0)
    rs = np.random.RandomState(7)
    dv = []
    for lo in range(0, len(paths) - 15, 16):
        imgs, gts = zip(*(sample(p) for p in paths[lo:lo + 16]))
        rng, k = jax.random.split(rng)
        if fresh:
            pi, pg = zip(*(sample(paths[rs.randint(len(paths))])
                           for _ in range(64)))
            oi, ob = jax.jit(
                lambda i, g, r, pi, pg: device_augment(i, g, r, ap, pi, pg)
            )(np.stack(imgs), np.stack(gts), k, np.stack(pi), np.stack(pg))
        else:
            oi, ob = jax.jit(lambda i, g, r: device_augment(i, g, r, ap))(
                np.stack(imgs), np.stack(gts), k)
        for j in range(16):
            v = box_alignment(np.asarray(oi[j]), np.asarray(ob[j]))
            if v is not None:
                dv.append(v)
    return hv, dv


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--yaml', default='/root/repo/yamls/clutter.yaml')
    ap.add_argument('--n', type=int, default=48)
    ap.add_argument('--stages', nargs='*', default=list(STAGES))
    ap.add_argument('--fresh', action='store_true',
                    help='device arm uses fresh partners')
    args = ap.parse_args()

    from pqdet_tpu.config import load_config
    cfg = load_config(args.yaml, [])
    with open(cfg.dataset.train_txt_file) as f:
        paths = [l.strip() for l in f if l.strip()][:args.n]
    for stage in args.stages:
        hv, dv = run_stage(cfg, paths, STAGES[stage], fresh=args.fresh)
        print('%-11s host %6.1f (p10 %5.1f)   dev %6.1f (p10 %5.1f)' % (
            stage, np.mean(hv), np.percentile(hv, 10),
            np.mean(dv), np.percentile(dv, 10)), flush=True)


if __name__ == '__main__':
    main()
