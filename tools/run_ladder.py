"""Full compression-lifecycle ladder on the clutter benchmark (real TPU).

Stages (reference README.md:103-108 + prune.py:12-30 flow):
  fp       : train mobilenetv2-fpn from scratch (mosaic+mixup ON)
  sparse   : resume fp, L1-sparse BN gammas
  prune    : slimming-prune the sparse ckpt (ratio) + finetune
  qat      : resume the finetuned-pruned ckpt with fake-quant
  int8     : convert + eval through the int8 executor

Each stage's AP50/AP lands in reports/clutter_ladder.json. Run stages
selectively:  python tools/run_ladder.py [fp sparse prune qat int8]
"""

import glob
import json
import os
import subprocess
import sys
import time

# LADDER_ROOT: run the stages from a frozen snapshot of the repo so
# concurrent development on /root/repo cannot break a mid-ladder stage;
# the report always lands in the live repo's reports/.
ROOT = os.environ.get('LADDER_ROOT', '/root/repo')
W = '/tmp/weights'
REPORT = '/root/repo/reports/clutter_ladder.json'
YAML = os.path.join(ROOT, 'yamls', 'clutter.yaml')

CLASSES = ('[red_square, yellow_square, green_square, blue_square, '
           'red_circle, yellow_circle, green_circle, blue_circle, '
           'red_triangle, yellow_triangle, green_triangle, blue_triangle, '
           'red_diamond, yellow_diamond, green_diamond, blue_diamond, '
           'red_bar, yellow_bar, green_bar, blue_bar]')


def newest_ckpt(exp):
    paths = glob.glob(os.path.join(W, exp, '*.ckpt'))
    # exclude only the raw pre-finetune artifact cli.prune writes next to
    # its INPUT ckpt ('<ckpt>-pruned.ckpt'); the fine-tune's own saves are
    # named 'pruned-<ratio>-model-<epoch>[-AP].ckpt' and must be eligible
    paths = [p for p in paths
             if not os.path.basename(p).endswith('-pruned.ckpt')]
    if not paths:
        raise FileNotFoundError(f'no ckpt under {W}/{exp}')
    def key(p):
        parts = os.path.basename(p).rsplit('.', 1)[0].split('-')
        i = len(parts) - 1 - parts[::-1].index('model')  # last 'model' token
        return int(parts[i + 1])
    return max(paths, key=key)


def run(cmd, log):
    print(f'>>> {" ".join(cmd)} (log {log})', flush=True)
    t0 = time.time()
    with open(log, 'w') as fw:
        r = subprocess.run(cmd, cwd=ROOT, stdout=fw, stderr=subprocess.STDOUT)
    dt = time.time() - t0
    if r.returncode != 0:
        subprocess.run(['tail', '-30', log])
        raise RuntimeError(f'{cmd} failed rc={r.returncode}')
    print(f'<<< done in {dt / 60:.1f} min', flush=True)
    return dt


def last_ap(log):
    """Parse the final AP table (evaluator.format_ap_table): the 'mAPs'
    row holds per-IoU APs x100 then the mean AP — first col is AP50."""
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


def record(stage, **kv):
    data = {}
    if os.path.exists(REPORT):
        data = json.load(open(REPORT))
    data[stage] = kv
    os.makedirs(os.path.dirname(REPORT), exist_ok=True)
    json.dump(data, open(REPORT, 'w'), indent=1)
    print(f'[{stage}] {kv}', flush=True)


def main():
    stages = sys.argv[1:] or ['fp', 'sparse', 'prune', 'qat', 'int8']
    py = sys.executable

    if 'fp' in stages:
        dt = run([py, '-m', 'pqdet_tpu.cli.train', '--yaml', YAML],
                 '/tmp/ladder_fp.log')
        ap50, ap = last_ap('/tmp/ladder_fp.log')
        record('fp', ap50=ap50, ap=ap, minutes=round(dt / 60, 1),
               ckpt=newest_ckpt('clutter_mobilenetv2_fpn'))

    if 'sparse' in stages:
        fp_ckpt = json.load(open(REPORT))['fp']['ckpt']
        dt = run([py, '-m', 'pqdet_tpu.cli.train', '--yaml', YAML,
                  'experiment_name', 'clutter_sparse',
                  'weight.resume', fp_ckpt, 'weight.clear_history', 'on',
                  'sparse.switch', 'on', 'sparse.ratio', '0.005',
                  'train.max_epochs', '6',
                  'train.learning_rate_init', '1e-4',
                  'eval.after', '5'], '/tmp/ladder_sparse.log')
        ap50, ap = last_ap('/tmp/ladder_sparse.log')
        record('sparse', ap50=ap50, ap=ap, minutes=round(dt / 60, 1),
               ckpt=newest_ckpt('clutter_sparse'))

    if 'prune' in stages:
        sp_ckpt = json.load(open(REPORT))['sparse']['ckpt']
        dt = run([py, '-m', 'pqdet_tpu.cli.prune', '--yaml', YAML,
                  'experiment_name', 'clutter_pruneft',
                  'prune.weight', sp_ckpt,
                  'prune.new_cfg', '/tmp/weights/clutter_pruned.cfg',
                  'prune.ratio', '0.3',
                  'prune.finetune_epochs', '6',
                  'train.learning_rate_init', '1e-4',
                  'eval.after', '5'], '/tmp/ladder_prune.log')
        ap50, ap = last_ap('/tmp/ladder_prune.log')
        record('prune', ap50=ap50, ap=ap, minutes=round(dt / 60, 1),
               ckpt=newest_ckpt('clutter_pruneft'))

    if 'qat' in stages:
        pf_ckpt = json.load(open(REPORT))['prune']['ckpt']
        dt = run([py, '-m', 'pqdet_tpu.cli.train', '--yaml', YAML,
                  'experiment_name', 'clutter_qat',
                  'weight.resume', pf_ckpt, 'weight.clear_history', 'on',
                  'quant.switch', 'on',
                  'quant.disable_observer_after', '2',
                  'quant.freeze_bn_after', '3',
                  'train.max_epochs', '4',
                  'train.learning_rate_init', '5e-5',
                  'train.input_sizes', '[512]',
                  'augment.mosaic_p', '0.0', 'augment.mixup_p', '0.0',
                  'eval.after', '99'], '/tmp/ladder_qat.log')
        record('qat', minutes=round(dt / 60, 1),
               ckpt=newest_ckpt('clutter_qat'))

    if 'int8' in stages:
        q_ckpt = json.load(open(REPORT))['qat']['ckpt']
        int8_path = '/tmp/weights/clutter_int8.ckpt'
        run([py, '-m', 'pqdet_tpu.cli.convert', 'quantize',
             '--weight', q_ckpt, '--out', int8_path],
            '/tmp/ladder_convert.log')
        dt = run([py, '-m', 'pqdet_tpu.cli.bench', 'eval', '--yaml', YAML,
                  '--weight', int8_path, 'eval.batch_size', '16'],
                 '/tmp/ladder_int8eval.log')
        ap50, ap = last_ap('/tmp/ladder_int8eval.log')
        record('int8', ap50=ap50, ap=ap, minutes=round(dt / 60, 1),
               ckpt=int8_path)

    if os.path.exists(REPORT):
        print(json.dumps(json.load(open(REPORT)), indent=1))


if __name__ == '__main__':
    main()
