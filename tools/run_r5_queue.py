"""Round-5 hardware queue (one chip — jobs strictly serial).

Waits for the running augment-ablation process, then:
  1. aug_ab5 phase 3: dev_fresh / dev_fresh_sharp (the candidate fix —
     host-parity independent mosaic/mixup partners)
  2. bench.py fp + fp-s2d (space-to-depth stem A/B, VERDICT r4 #2)
  3. bench_train profile with and without the fused BN backward
     (VERDICT r4 #5 A/B, PQDET_BN_BWD=autodiff)
  4. hyper-evolution 18 rounds to completion with telemetry
     (VERDICT r4 #3) -> reports/evolution_clutter_r5.json
  5. NAS 8-candidate rerun with full divergence logging + exp_cap
     (VERDICT r4 #4) -> reports/nas_search_clutter_r5.json + analysis
  6. host_full anchor replicate (slow; last)

    AB5_PID=<pid> python tools/run_r5_queue.py [step ...]
"""

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


def run(cmd, log, env_extra=None, timeout_s=None):
    print(f'>>> {" ".join(cmd)} (log {log})', flush=True)
    t0 = time.time()
    env = dict(os.environ, PYTHONUNBUFFERED='1', **(env_extra or {}))
    with open(log, 'w') as fw:
        try:
            r = subprocess.run(cmd, cwd=ROOT, stdout=fw,
                               stderr=subprocess.STDOUT, env=env,
                               timeout=timeout_s)
            rc = r.returncode
        except subprocess.TimeoutExpired:
            rc = 'timeout'
    print(f'<<< rc={rc} in {(time.time() - t0) / 60:.1f} min', flush=True)
    return rc


def main():
    steps = sys.argv[1:] or ['fresh', 'bench', 'bnprof', 'evolve', 'nas',
                             'hostfull']
    pid = int(os.environ.get('AB5_PID', '0'))
    if pid:
        print(f'waiting for ablation driver {pid}', flush=True)
        wait_pid(pid)
    py = sys.executable

    if 'fresh' in steps:
        run([py, 'tools/aug_ab5.py', 'dev_fresh', 'dev_fresh_sharp'],
            '/tmp/augab5_p3.log')

    if 'bench' in steps:
        run([py, 'bench.py'], '/tmp/bench_r5_fp.log')
        run([py, 'bench.py', 'mobilenetv2-fpn', 'fp-s2d'],
            '/tmp/bench_r5_s2d.log')
        run([py, 'bench.py', 'mobilenetv2-fpn', 'fp', '16'],
            '/tmp/bench_r5_fp16.log')
        run([py, 'bench.py', 'mobilenetv2-fpn', 'fp-s2d', '16'],
            '/tmp/bench_r5_s2d16.log')
        run([py, 'tools/roofline.py', 'forward', '16'],
            '/tmp/roofline_fwd16_r5.log', timeout_s=2400)
        run([py, 'tools/roofline.py', 'forward-s2d', '16'],
            '/tmp/roofline_fwd16_s2d_r5.log', timeout_s=2400)

    if 'bnprof' in steps:
        run([py, 'bench_train.py', 'profile'], '/tmp/bnprof_fused.log',
            timeout_s=2400)
        run([py, 'bench_train.py', 'profile'], '/tmp/bnprof_autodiff.log',
            env_extra={'PQDET_BN_BWD': 'autodiff'}, timeout_s=2400)

    if 'evolve' in steps:
        run([py, '-m', 'pqdet_tpu.cli.evolute', '--yaml',
             'yamls/evolute_clutter.yaml', '--rounds', '18', '--seed', '0',
             '--log', 'reports/evolution_clutter_r5.json'],
            '/tmp/evolve_r5.log')

    if 'nas' in steps:
        run([py, '-m', 'pqdet_tpu.cli.search', '--yaml',
             'yamls/nas_clutter.yaml', '--rounds', '8', '--max-macs', '5e9',
             '--max-latency-ms', '8', '--seed', '0',
             '--log', 'reports/nas_search_clutter_r5.json',
             'train.grad_clip', '10.0'],
            '/tmp/nas_r5.log')
        run([py, '-m', 'pqdet_tpu.nas.analysis',
             'reports/nas_search_clutter_r5.json'],
            '/tmp/nas_r5_analysis.log')

    if 'hostfull' in steps:
        run([py, 'tools/aug_ab5.py', 'host_full'], '/tmp/augab5_hostfull.log',
            timeout_s=7200)
    print('r5 queue done', flush=True)


if __name__ == '__main__':
    main()
