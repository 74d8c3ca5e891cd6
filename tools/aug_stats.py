"""Per-transform output statistics, host chain vs device chain (CPU).

VERDICT r4 #1 instrumentation: run BOTH augmentation chains over the same
corpus images with the same configured probabilities and compare the
distributions a detector's early training actually sees — box count per
image, box scale, image sharpness (Laplacian variance), letterbox-pad
fraction, mean pixel. A factor-2 epoch-5 AP gap should show up here as a
measurably harsher distribution in one of these axes (the named suspects:
zoom-crop's second resample of letterboxed sources -> blur;
mosaic/mixup in-batch partner correlation -> duplicated content).

Modes (all stages read probabilities from the yaml, default clutter):
  full        full chains (flips+crop+jitter+mosaic+mixup)
  crop        crop stage only (host SafeCrop+Resize vs device zoom_crop)
  none        no stochastic stage (letterbox only) — floor check
  cache416    the dataset.device_cache 512->416 resize path vs host
              letterbox directly at 416 (the second resample the
              multi-scale cache adds; no stochastic stage in either arm)

    python tools/aug_stats.py [--yaml yamls/clutter.yaml] [--n 128]
"""

import argparse
import json
import random
import sys

sys.path.insert(0, '/root/repo')

import jax
jax.config.update('jax_platforms', 'cpu')  # never touch the chip

import cv2  # noqa: E402
import numpy as np  # noqa: E402


def laplacian_var(img_u8):
    gray = cv2.cvtColor(img_u8, cv2.COLOR_RGB2GRAY)
    return float(cv2.Laplacian(gray, cv2.CV_32F).var())


def to6(boxes):
    boxes = np.asarray(boxes, np.float32)
    if boxes.size == 0:
        return np.zeros((0, 6), np.float32)
    if boxes.shape[-1] == 5:
        boxes = np.concatenate(
            [boxes, np.ones((len(boxes), 1), np.float32)], axis=-1)
    return boxes.reshape(-1, 6)


def img_stats(img, boxes):
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = np.clip(np.round(img), 0, 255).astype(np.uint8)
    boxes = to6(boxes)
    valid = (boxes[:, 2] > boxes[:, 0]) & (boxes[:, 3] > boxes[:, 1])
    b = boxes[valid]
    areas = np.sqrt((b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1]))
    pad = np.all(img == 128, axis=-1).mean()
    return {
        'n_boxes': float(valid.sum()),
        'box_sqrt_area': areas.tolist(),
        'sharpness': laplacian_var(img),
        'pad_frac': float(pad),
        'mean_pix': float(img.mean()),
    }


def summarize(rows, name):
    out = {'name': name, 'n': len(rows)}
    out['n_boxes_mean'] = round(float(np.mean([r['n_boxes'] for r in rows])), 2)
    all_areas = np.concatenate([r['box_sqrt_area'] for r in rows]) \
        if rows else np.zeros(0)
    if len(all_areas):
        out['box_sqrt_area_p10_50_90'] = [
            round(float(np.percentile(all_areas, p)), 1) for p in (10, 50, 90)]
    out['sharpness_p10_50_90'] = [
        round(float(np.percentile([r['sharpness'] for r in rows], p)), 1)
        for p in (10, 50, 90)]
    out['pad_frac_mean'] = round(float(np.mean([r['pad_frac'] for r in rows])), 4)
    out['mean_pix'] = round(float(np.mean([r['mean_pix'] for r in rows])), 1)
    return out


def make_getter(cfg, size, device_mode, zeroed=(), all_paths=None):
    """The real registry getter with augment.device forced on/off and the
    named probability keys zeroed (to isolate single stages)."""
    from pqdet_tpu.data import samples as S
    c = cfg.clone().defrost()
    c.augment.device = bool(device_mode)
    for k in zeroed:
        setattr(c.augment, k, 0.0)
    c.freeze()
    getter = S.SAMPLE_GETTER_REGISTER[c.dataset.name](
        'train', c.dataset.classes, cache_images=True)
    sampler = lambda: random.choice(all_paths)
    getter.set_train_augment(c.augment, (size, size), sampler)
    return getter, c.augment


ALL_P = ('hflip_p', 'vflip_p', 'crop_p', 'color_p', 'mosaic_p', 'mixup_p')


def host_rows(cfg, paths, size, mode):
    zero = {'full': (), 'crop': tuple(k for k in ALL_P if k != 'crop_p'),
            'none': ALL_P, 'cache416': ALL_P}[mode]
    getter, _ = make_getter(cfg, size, False, zero, all_paths=paths)
    return [img_stats(*getter.train(p)) for p in paths]


def device_rows(cfg, paths, size, mode, seed=0):
    """Device chain outputs: host letterbox (the device-mode base) then
    ops/augment_device.device_augment on CPU jax, batch 16 like training."""
    from pqdet_tpu.ops.augment_device import AugmentParams, device_augment
    getter, a = make_getter(cfg, 512, True, (), all_paths=paths)
    if mode == 'full':
        params = AugmentParams(
            hflip_p=a.hflip_p, vflip_p=a.vflip_p, crop_p=a.crop_p,
            color_p=a.color_p, mosaic_p=a.mosaic_p, mixup_p=a.mixup_p)
    elif mode == 'crop':
        params = AugmentParams(hflip_p=0., vflip_p=0., crop_p=a.crop_p,
                               color_p=0., mosaic_p=0., mixup_p=0.)
    else:  # none / cache416: no stochastic stage
        params = AugmentParams(hflip_p=0., vflip_p=0., crop_p=0.,
                               color_p=0., mosaic_p=0., mixup_p=0.)
    max_g = 64
    rows = []
    aug = jax.jit(lambda im, gt, k: device_augment(im, gt, k, params))
    rng = jax.random.PRNGKey(seed)
    for lo in range(0, len(paths) - 15, 16):
        imgs, gts = [], []
        for p in paths[lo:lo + 16]:
            img, boxes = getter.train(p)   # device mode: letterbox only
            boxes = to6(boxes)
            if mode == 'cache416':
                # simulate Trainer._cache_gather: cached at 512, resized
                r = size / img.shape[0]
                img = np.clip(np.round(np.asarray(jax.image.resize(
                    np.asarray(img, np.float32), (size, size, 3),
                    'bilinear'))), 0, 255).astype(np.uint8)
                boxes = boxes * np.asarray([r, r, r, r, 1., 1.], np.float32)
            g = np.zeros((max_g, 6), np.float32)
            g[:min(len(boxes), max_g)] = boxes[:max_g]
            imgs.append(np.asarray(img))
            gts.append(g)
        rng, k = jax.random.split(rng)
        out_i, out_b = aug(np.stack(imgs), np.stack(gts), k)
        out_i, out_b = np.asarray(out_i), np.asarray(out_b)
        for j in range(16):
            rows.append(img_stats(out_i[j], out_b[j]))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--yaml', default='/root/repo/yamls/clutter.yaml')
    ap.add_argument('--n', type=int, default=128)
    ap.add_argument('--size', type=int, default=512)
    ap.add_argument('--modes', nargs='*',
                    default=['none', 'crop', 'full', 'cache416'])
    ap.add_argument('--out', default=None)
    args = ap.parse_args()
    random.seed(0)

    from pqdet_tpu.config import load_config
    cfg = load_config(args.yaml, [])
    with open(cfg.dataset.train_txt_file) as f:
        paths = [ln.strip() for ln in f if ln.strip()][:args.n]

    report = {}
    for mode in args.modes:
        size = 416 if mode == 'cache416' else args.size
        h = summarize(host_rows(cfg, paths, size, mode), f'host_{mode}')
        d = summarize(device_rows(cfg, paths, size, mode), f'device_{mode}')
        report[mode] = {'host': h, 'device': d}
        print(json.dumps(report[mode], indent=1), flush=True)
    if args.out:
        json.dump(report, open(args.out, 'w'), indent=1)


if __name__ == '__main__':
    main()
