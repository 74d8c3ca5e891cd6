"""Host data-loader throughput (host side only, no device).

Measures what the loading core(s) can feed: samples/s through
TrainData.epoch_batches under a given yaml, warm decoded cache,
host-augment vs device-augment (augment.device) A/B.

    python tools/bench_loader.py yamls/clutter.yaml [--epochs 2] [--ab]

The first epoch warms the image/label caches and is reported separately.
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')


def run_epochs(cfg, epochs):
    from pqdet_tpu.data.train_data import TrainData, epoch_batches
    data = TrainData(cfg)
    rates = []
    for e in range(epochs):
        n = 0
        t0 = time.perf_counter()
        for batch in epoch_batches(data, num_workers=cfg.system.num_workers,
                                   prefetch=cfg.system.prefetch):
            n += len(batch['image'])
        dt = time.perf_counter() - t0
        rates.append(n / dt)
        print(f'  epoch {e}: {n} samples in {dt:.1f}s = {n / dt:.1f} imgs/s '
              f'{"(cold cache)" if e == 0 else ""}', flush=True)
        data.init_shuffle()
    return rates


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('yaml')
    ap.add_argument('--epochs', type=int, default=2)
    ap.add_argument('--ab', action='store_true',
                    help='run host-augment AND device-augment modes')
    args, rest = ap.parse_known_args()  # trailing key value config opts

    from pqdet_tpu.config import load_config
    modes = [('host-augment', 'off'), ('device-augment', 'on')] if args.ab \
        else [('configured', None)]
    results = {}
    for name, dev in modes:
        opts = list(rest) + ([] if dev is None else ['augment.device', dev])
        cfg = load_config(args.yaml, opts)
        print(f'[{name}] augment.device={dev or cfg.augment.device} '
              f'workers={cfg.system.num_workers} '
              f'mosaic_p={cfg.augment.mosaic_p} mixup_p={cfg.augment.mixup_p}')
        rates = run_epochs(cfg, args.epochs)
        results[name] = rates
    for name, rates in results.items():
        warm = np.mean(rates[1:]) if len(rates) > 1 else rates[0]
        print(f'{name}: warm {warm:.1f} imgs/s (cold {rates[0]:.1f})')


if __name__ == '__main__':
    main()
