"""Post-ladder chip work: runs automatically once tools/run_ladder.py's
process exits, so the single TPU chip never idles between the multi-hour
ladder and the follow-up measurements.

1. diffeval on the clutter corpus: the ladder's fp checkpoint through BOTH
   full eval pipelines (ours on TPU, the actual torch reference on CPU) —
   the "diffeval parity run on the new data" the round-2 verdict asked for
   (VERDICT.md next-round item 4).
2. device-augment convergence comparison: the same clutter fp recipe with
   ``augment.device: on`` (ops/augment_device.py) at the same epoch budget,
   then a 3x-epoch run — wall-clock and AP land next to the host-augment
   ladder's fp stage in reports/clutter_devaug.json.

    python tools/post_ladder.py [--ladder-pid PID] [--skip diffeval ...]
"""

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REPORT = os.path.join(ROOT, 'reports', 'clutter_devaug.json')
LADDER_REPORT = os.path.join(ROOT, 'reports', 'clutter_ladder.json')
YAML = os.path.join(ROOT, 'yamls', 'clutter.yaml')
LOGDIR = os.environ.get('POST_LADDER_LOGDIR', '/tmp/ladder_logs')

sys.path.insert(0, os.path.join(ROOT, 'tools'))
from run_ladder import (all_aps, last_ap, last_split, newest_ckpt,  # noqa: E402
                        wait_backend)


def wait_pid(pid: int):
    while True:
        try:
            os.kill(pid, 0)
        except ProcessLookupError:
            return
        time.sleep(60)


def run(cmd, log):
    print(f'>>> {" ".join(cmd)} (log {log})', flush=True)
    t0 = time.time()
    with open(log, 'w') as fw:
        r = subprocess.run(cmd, cwd=ROOT, stdout=fw, stderr=subprocess.STDOUT)
    if r.returncode != 0:
        subprocess.run(['tail', '-30', log])
        raise RuntimeError(f'{cmd} failed rc={r.returncode}')
    dt = time.time() - t0
    print(f'<<< done in {dt / 60:.1f} min', flush=True)
    return dt


def record(stage, **kv):
    data = {}
    if os.path.exists(REPORT):
        data = json.load(open(REPORT))
    data[stage] = kv
    json.dump(data, open(REPORT, 'w'), indent=1)
    print(f'[{stage}] {kv}', flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--ladder-pid', type=int, default=0)
    ap.add_argument('--stages', nargs='*',
                    default=['diffeval', 'devaug', 'devaug3x'])
    args = ap.parse_args()
    py = sys.executable
    os.makedirs(LOGDIR, exist_ok=True)

    if args.ladder_pid:
        print(f'waiting for ladder pid {args.ladder_pid}', flush=True)
        wait_pid(args.ladder_pid)

    if 'diffeval' in args.stages:
        fp = json.load(open(LADDER_REPORT))['fp']['ckpt']
        wait_backend()
        run([py, '-m', 'pqdet_tpu.cli.diffeval', '--weight', fp,
             '--yaml', YAML, '--limit', '400',
             '--out', os.path.join(ROOT, 'reports', 'diffeval_clutter.json')],
            os.path.join(LOGDIR, 'diffeval_clutter.log'))

    if 'devaug' in args.stages:
        wait_backend()
        log = os.path.join(LOGDIR, 'devaug.log')
        dt = run([py, '-m', 'pqdet_tpu.cli.train', '--yaml', YAML,
                  'experiment_name', 'clutter_devaug',
                  'augment.device', 'on'], log)
        ap50, apv = last_ap(log)
        dl, mt = last_split(log)
        record('devaug_14ep', ap50=ap50, ap=apv, minutes=round(dt / 60, 1),
               dataload_s=dl, model_s=mt, ckpt=newest_ckpt('clutter_devaug'))

    if 'devaug3x' in args.stages:
        wait_backend()
        log = os.path.join(LOGDIR, 'devaug3x.log')
        dt = run([py, '-m', 'pqdet_tpu.cli.train', '--yaml', YAML,
                  'experiment_name', 'clutter_devaug3x',
                  'augment.device', 'on',
                  'train.max_epochs', '42', 'eval.after', '41'], log)
        ap50, apv = last_ap(log)
        dl, mt = last_split(log)
        record('devaug_42ep', ap50=ap50, ap=apv, minutes=round(dt / 60, 1),
               dataload_s=dl, model_s=mt,
               ckpt=newest_ckpt('clutter_devaug3x'), per_eval=all_aps(log))

    if os.path.exists(REPORT):
        print(json.dumps(json.load(open(REPORT)), indent=1))


if __name__ == '__main__':
    main()
