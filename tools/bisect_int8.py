"""Bisect the clutter-ladder int8 AP=0.0 on the fast shapes corpus.

Drives the same CLI sequence as tools/run_ladder.py (sparse -> prune ->
QAT -> convert -> int8 eval) starting from an existing fp checkpoint, but
EVALUATES AT EVERY STAGE and evaluates the converted model through all
three executor modes (pallas / exact-int / dequant) so a collapse
localises to (a) QAT weights, (b) conversion/observers, or (c) a specific
executor implementation on hardware.

    python tools/bisect_int8.py [--fp /tmp/weights/shapes_mobilenetv2_fpn/model-5.ckpt]
"""

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
YAML = os.path.join(ROOT, 'yamls', 'shapes.yaml')
W = '/tmp/weights'
LOGDIR = '/tmp/bisect_int8'


def run(cmd, log):
    print(f'>>> {" ".join(cmd)} (log {log})', flush=True)
    t0 = time.time()
    with open(log, 'w') as fw:
        r = subprocess.run(cmd, cwd=ROOT, stdout=fw,
                           stderr=subprocess.STDOUT)
    if r.returncode != 0:
        subprocess.run(['tail', '-30', log])
        raise RuntimeError(f'{cmd} failed rc={r.returncode}')
    print(f'<<< {time.time() - t0:.0f}s', flush=True)


def last_ap(log):
    ap50 = ap = None
    with open(log) as f:
        for line in f:
            if line.startswith('mAPs'):
                try:
                    vals = [float(t) for t in line.split()[1:]]
                    ap50, ap = vals[0] / 100, vals[-1] / 100
                except ValueError:
                    pass
    return ap50, ap


def all_aps(log):
    """Every AP the log printed: per-epoch evals emit format_ap_table,
    whose 'mAPs' row is per-IoU APs x100 then the mean AP."""
    out = []
    with open(log) as f:
        for line in f:
            if line.startswith('mAPs'):
                try:
                    vals = [float(t) for t in line.split()[1:]]
                    out.append((vals[0] / 100, vals[-1] / 100))
                except ValueError:
                    pass
    return out


def newest(exp):
    import glob
    paths = [p for p in glob.glob(os.path.join(W, exp, '*.ckpt'))
             if not p.endswith('-pruned.ckpt')]
    def key(p):
        parts = os.path.basename(p).rsplit('.', 1)[0].split('-')
        i = len(parts) - 1 - parts[::-1].index('model')
        return int(parts[i + 1])
    return max(paths, key=key)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--fp', default=os.path.join(
        W, 'shapes_mobilenetv2_fpn', 'model-5.ckpt'))
    ap.add_argument('--stages', nargs='*', default=[
        'fpeval', 'sparse', 'prune', 'qat', 'int8'])
    args = ap.parse_args()
    os.makedirs(LOGDIR, exist_ok=True)
    py = sys.executable
    report = {}
    base = ['eval.batch_size', '16']

    def rec(stage, log, **kv):
        a50, a = last_ap(log)
        report[stage] = {'ap50': a50, 'ap': a, **kv}
        print(f'[{stage}] {report[stage]}', flush=True)
        json.dump(report, open(os.path.join(LOGDIR, 'report.json'), 'w'),
                  indent=1)

    if 'fpeval' in args.stages:
        log = f'{LOGDIR}/fpeval.log'
        run([py, '-m', 'pqdet_tpu.cli.bench', 'eval', '--yaml', YAML,
             '--weight', args.fp] + base, log)
        rec('fp', log)

    if 'sparse' in args.stages:
        log = f'{LOGDIR}/sparse.log'
        run([py, '-m', 'pqdet_tpu.cli.train', '--yaml', YAML,
             'experiment_name', 'bisect_sparse',
             'weight.resume', args.fp, 'weight.clear_history', 'on',
             'sparse.switch', 'on', 'sparse.ratio', '0.005',
             'train.max_epochs', '2', 'train.learning_rate_init', '1e-4',
             'eval.after', '0'], log)
        rec('sparse', log, ckpt=newest('bisect_sparse'))

    if 'prune' in args.stages:
        sp = report.get('sparse', {}).get('ckpt') or newest('bisect_sparse')
        log = f'{LOGDIR}/prune.log'
        run([py, '-m', 'pqdet_tpu.cli.prune', '--yaml', YAML,
             'experiment_name', 'bisect_pruneft',
             'prune.weight', sp,
             'prune.new_cfg', os.path.join(W, 'bisect_pruned.cfg'),
             'prune.ratio', '0.3', 'prune.finetune_epochs', '2',
             'train.learning_rate_init', '1e-4', 'eval.after', '0'], log)
        rec('prune', log, ckpt=newest('bisect_pruneft'))

    if 'qat' in args.stages:
        pf = report.get('prune', {}).get('ckpt') or newest('bisect_pruneft')
        log = f'{LOGDIR}/qat.log'
        run([py, '-m', 'pqdet_tpu.cli.train', '--yaml', YAML,
             'experiment_name', 'bisect_qat',
             'weight.resume', pf, 'weight.clear_history', 'on',
             'model.cfg_path', os.path.join(W, 'bisect_pruned.cfg'),
             'quant.switch', 'on',
             'quant.disable_observer_after', '1',
             'quant.freeze_bn_after', '1',
             'train.max_epochs', '2',
             'train.learning_rate_init', '5e-5',
             'train.input_sizes', '[512]',
             'augment.mosaic_p', '0.0', 'augment.mixup_p', '0.0',
             'eval.after', '0'], log)
        rec('qat', log, ckpt=newest('bisect_qat'), per_epoch=all_aps(log))

    if 'int8' in args.stages:
        q = report.get('qat', {}).get('ckpt') or newest('bisect_qat')
        int8_path = os.path.join(W, 'bisect_int8.ckpt')
        run([py, '-m', 'pqdet_tpu.cli.convert', 'quantize',
             '--weight', q, '--out', int8_path],
            f'{LOGDIR}/convert.log')
        log = f'{LOGDIR}/int8_pallas.log'
        run([py, '-m', 'pqdet_tpu.cli.bench', 'eval', '--yaml', YAML,
             '--weight', int8_path] + base, log)
        rec('int8_pallas', log)
        log = f'{LOGDIR}/int8_exact.log'
        run([py, '-m', 'pqdet_tpu.cli.bench', 'eval', '--yaml', YAML,
             '--weight', int8_path, '--int8-exact'] + base, log)
        rec('int8_exact', log)

    print(json.dumps(report, indent=1))


if __name__ == '__main__':
    main()
