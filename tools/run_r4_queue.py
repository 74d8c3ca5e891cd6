"""Round-4 post-ladder hardware queue: waits for the ladder driver to
exit, then serially runs (one chip, jobs must not overlap):

  1. hyper-parameter evolution end-to-end (VERDICT r3 #3) — 16 rounds of
     1-epoch fitness on clutter -> reports/evolution_clutter.json
  2. NAS re-run with train.grad_clip on, seeded (VERDICT r3 #6)
     -> reports/nas_search_clutter_clip.json
  3. diffeval with the crowding bump eval.max_detections=512
     (VERDICT r3 #8) on the saturated fp checkpoint
     -> reports/diffeval_clutter_bump.json

    LADDER_PID=<pid> python tools/run_r4_queue.py
"""

import json
import os
import subprocess
import sys
import time

ROOT = '/root/repo'


def wait_pid(pid: int):
    while True:
        try:
            os.kill(pid, 0)
        except OSError:
            return
        time.sleep(30)


def run(cmd, log):
    print(f'>>> {" ".join(cmd)} (log {log})', flush=True)
    t0 = time.time()
    env = dict(os.environ, PYTHONUNBUFFERED='1')
    with open(log, 'w') as fw:
        r = subprocess.run(cmd, cwd=ROOT, stdout=fw,
                           stderr=subprocess.STDOUT, env=env)
    print(f'<<< rc={r.returncode} in {(time.time() - t0) / 60:.1f} min',
          flush=True)
    return r.returncode


def main():
    pid = int(os.environ.get('LADDER_PID', '0'))
    if pid:
        print(f'waiting for ladder driver {pid}', flush=True)
        wait_pid(pid)
    py = sys.executable

    run([py, '-m', 'pqdet_tpu.cli.search', '--yaml',
         'yamls/nas_clutter.yaml', '--rounds', '8', '--max-macs', '5e9',
         '--max-latency-ms', '8', '--seed', '0',
         '--log', 'reports/nas_search_clutter_clip.json',
         'train.grad_clip', '10.0'],
        '/tmp/nas_clip_r4.log')
    run([py, '-m', 'pqdet_tpu.nas.analysis',
         'reports/nas_search_clutter_clip.json'],
        '/tmp/nas_clip_analysis.log')

    try:
        fp_ckpt = json.load(open(os.path.join(
            ROOT, 'reports/clutter_ladder.json')))['fp']['ckpt']
        run([py, '-m', 'pqdet_tpu.cli.diffeval', '--weight', fp_ckpt,
             '--yaml', 'yamls/clutter.yaml', '--limit', '400',
             '--out', 'reports/diffeval_clutter_bump.json',
             'eval.max_detections', '512'],
            '/tmp/diffeval_bump.log')
    except (FileNotFoundError, KeyError) as e:
        print(f'diffeval skipped: no fp ckpt in ladder report ({e})',
              flush=True)

    # fused inverted-residual kernel v2 A/B (VERDICT r3 #1 stretch)
    run([py, 'tools/microbench_fused.py', 'full', '16'],
        '/tmp/fused_full16_v2.log')
    run([py, 'tools/microbench_fused.py', 'blocks', '16'],
        '/tmp/fused_blocks16_v2.log')

    # VERDICT r3 #5 tail: the HOST-augment arm of the saturated-scale
    # zoom-crop A/B — same 40-epoch recipe, augment.device off (and
    # therefore per-step uploads; upload-bound, so it runs as far as the
    # round's remaining wall allows and is compared at matched epochs
    # against the devaug fp per_eval curve). 150 min hard cap.
    run(['timeout', '9000', py, '-m', 'pqdet_tpu.cli.train', '--yaml',
         'yamls/clutter.yaml', 'experiment_name', 'clutter_hostaug',
         'augment.device', 'off', 'dataset.device_cache', 'off',
         'eval.after', '5', 'eval.interval', '2'],
        '/tmp/hostaug_arm.log')
    print('queue done', flush=True)


if __name__ == '__main__':
    main()
