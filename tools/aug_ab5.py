"""Round-5 device-augment early-regime ablation (VERDICT r4 next #1).

Round 4's matched epoch-5 A/B measured host-augment 81.69 vs
device-augment 40.42 AP50 (reports/clutter_augab_epoch5.json) — the
device chain trains measurably harsher in the early regime, and every
short-horizon consumer (NAS 2-epoch short-trains, evolution 1-epoch
fitness, prune fine-tunes) runs on it. This driver isolates WHICH device
stage carries the gap: each variant trains 6 fresh epochs (0..5) on the
UNCHANGED 40-epoch cosine schedule (identical to both round-4 arms) and
evaluates once at epoch 5, all in one process so the HBM-resident corpus
uploads once (Trainer._CACHE_MEMO).

Variants (device chain unless noted):
  dev_full       replicate the 40.42 arm (harness anchor)
  dev_single512  input_sizes [512]: no multi-scale resize off the cache
                 (the cached-corpus bilinear downscale is a second
                 resample the host arm never does)
  dev_nocrop     crop_p 0: zoom-crop is the one documented semantic
                 divergence (ops/augment_device.py:31-35)
  dev_nomosmix   mosaic_p/mixup_p 0: in-batch partner correlation
  dev_flipsonly  crop/mosaic/mixup all off (flips remain — exact parity)

    python tools/aug_ab5.py [variant ...]   # default: all
"""

import gc
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, '/root/repo')

REPORT = os.environ.get('AB5_REPORT', '/root/repo/reports/augab5_epoch5.json')
YAML = os.environ.get('AB5_YAML', '/root/repo/yamls/clutter.yaml')
EPOCHS = int(os.environ.get('AB5_EPOCHS', '6'))  # train epochs 0..EPOCHS-1

VARIANTS = {
    'dev_full': {},
    'dev_single512': {'train.input_sizes': '[512]'},
    'dev_nocrop': {'augment.crop_p': '0.0'},
    'dev_nomosmix': {'augment.mosaic_p': '0.0', 'augment.mixup_p': '0.0'},
    'dev_flipsonly': {'augment.crop_p': '0.0', 'augment.mosaic_p': '0.0',
                      'augment.mixup_p': '0.0'},
    # --- phase 3: the candidate fix (host-parity independent partners) ---
    'dev_fresh': {'augment.fresh_partners': 'on'},
    'dev_fresh_sharp': {'augment.fresh_partners': 'on',
                        'train.input_sizes': '[512]',
                        'augment.crop_p': '0.0'},
    # --- phase 2 (launched on phase-1 results) ---
    # no extra resamples AT ALL (single size off the cache + no crop):
    # device images are bit-sharp like the host's; mosaic/mixup stay on
    'dev_sharp': {'train.input_sizes': '[512]', 'augment.crop_p': '0.0'},
    'dev_nomosaic': {'augment.mosaic_p': '0.0'},
    'dev_nomixup': {'augment.mixup_p': '0.0'},
    # the NULL device augment: chain runs but every stage is off
    'dev_none': {'augment.hflip_p': '0.0', 'augment.crop_p': '0.0',
                 'augment.mosaic_p': '0.0', 'augment.mixup_p': '0.0'},
    # flips-only WITHOUT the HBM cache (host letterbox + upload per step)
    'dev_nocache_flips': {'augment.crop_p': '0.0',
                          'augment.mosaic_p': '0.0',
                          'augment.mixup_p': '0.0',
                          'dataset.device_cache': 'off'},
    # host-chain anchors (slow: per-step uploads; run them last)
    'host_full': {'augment.device': 'off', 'dataset.device_cache': 'off'},
    'host_flips': {'augment.device': 'off', 'dataset.device_cache': 'off',
                   'augment.crop_p': '0.0', 'augment.mosaic_p': '0.0',
                   'augment.mixup_p': '0.0'},
}


def git_commit():
    try:
        return subprocess.run(['git', 'rev-parse', '--short', 'HEAD'],
                              cwd='/root/repo', capture_output=True,
                              text=True).stdout.strip()
    except OSError:
        return None


def record(name, **kv):
    data = {}
    if os.path.exists(REPORT):
        data = json.load(open(REPORT))
    data.setdefault('meta', {
        'round': 5, 'commit': git_commit(), 'yaml': YAML,
        'recipe': f'fresh epochs 0..{EPOCHS - 1} on the 40-ep cosine '
                  f'schedule, eval at epoch {EPOCHS - 1}, full held-out '
                  f'split; anchors from round 4: host 81.69 / device '
                  f'40.42 AP50',
        'date': time.strftime('%Y-%m-%d %H:%M UTC', time.gmtime()),
    })
    data[name] = kv
    json.dump(data, open(REPORT, 'w'), indent=1)
    print(f'[{name}] {kv}', flush=True)


def run_variant(name, overrides):
    import jax
    from pqdet_tpu.config import load_config
    from pqdet_tpu.train.trainer import Trainer

    opts = ['experiment_name', f'augab5_{name}',
            'weight.dir', '/tmp/weights_ab5']
    for k, v in overrides.items():
        opts += [k, v]
    cfg = load_config(YAML, opts)
    t0 = time.time()
    trainer = Trainer(cfg)
    os.makedirs(trainer._weights_dir, exist_ok=True)
    trainer.init_all()
    try:
        for epoch in range(EPOCHS):
            trainer.train_epoch(epoch)
        ap = trainer.evaluate()
    finally:
        trainer.close()
    record(name, ap50=round(float(ap.mAPs[0]), 4),
           ap=round(float(ap.AP), 4),
           minutes=round((time.time() - t0) / 60, 1),
           overrides=overrides, commit=git_commit())
    del trainer
    jax.clear_caches()   # round-4 evolution lesson: per-run jit caches
    gc.collect()         # accumulate host RSS across sequential Trainers


def main():
    names = sys.argv[1:] or list(VARIANTS)
    for name in names:
        print(f'=== variant {name} ===', flush=True)
        run_variant(name, VARIANTS[name])
    if os.path.exists(REPORT):
        print(json.dumps(json.load(open(REPORT)), indent=1))


if __name__ == '__main__':
    main()
