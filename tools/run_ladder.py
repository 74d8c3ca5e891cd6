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
# The other LADDER_* env knobs exist so the SAME driver can be rehearsed
# at tiny scale on CPU (tiny yaml + LADDER_EXTRA='train.max_epochs 2 ...'
# appended after each stage's own overrides, so the extras win) before
# burning hours of real-chip time on the full run.
ROOT = os.environ.get('LADDER_ROOT', '/root/repo')
W = os.environ.get('LADDER_WEIGHTS', '/tmp/weights')
REPORT = os.environ.get('LADDER_REPORT',
                        '/root/repo/reports/clutter_ladder.json')
YAML = os.environ.get('LADDER_YAML', os.path.join(ROOT, 'yamls',
                                                  'clutter.yaml'))
EXTRA = os.environ.get('LADDER_EXTRA', '').split()
LOGDIR = os.environ.get('LADDER_LOGDIR', '/tmp')


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


_OPENED = set()


def run(cmd, log):
    print(f'>>> {" ".join(cmd)} (log {log})', flush=True)
    t0 = time.time()
    # truncate on the stage's FIRST open this run (a stale file from a
    # previous run would feed last_ap/last_split old metrics), append
    # across the stage's own retries
    mode = 'a' if log in _OPENED else 'w'
    _OPENED.add(log)
    with open(log, mode) as fw:
        r = subprocess.run(cmd, cwd=ROOT, stdout=fw, stderr=subprocess.STDOUT)
    dt = time.time() - t0
    if r.returncode != 0:
        subprocess.run(['tail', '-30', log])
        raise RuntimeError(f'{cmd} failed rc={r.returncode}')
    print(f'<<< done in {dt / 60:.1f} min', flush=True)
    return dt


def wait_backend():
    """Block until a JAX backend initialises in a fresh subprocess. The
    axon TPU tunnel drops for minutes-to-hours at a time; a multi-hour
    ladder stage must ride through that instead of aborting. Instant
    no-op on CPU rehearsals."""
    while True:
        try:
            r = subprocess.run(
                [sys.executable, '-c', 'import jax; jax.devices()'],
                timeout=180, stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL)
            if r.returncode == 0:
                return
        except subprocess.TimeoutExpired:
            pass
        print(f'[ladder] backend unavailable, retrying ({time.ctime()})',
              flush=True)
        time.sleep(180)


RETRIES = int(os.environ.get('LADDER_RETRIES', '40'))


def run_retry(cmd, log, tries=3):
    """run() that waits for the backend and reruns from scratch on
    failure — for cheap stages (prune rebuild, convert, eval)."""
    for attempt in range(tries):
        wait_backend()
        try:
            return run(cmd, log)
        except RuntimeError:
            if attempt == tries - 1:
                raise
            print(f'[ladder] stage failed, rerun {attempt + 1}/{tries - 1}',
                  flush=True)


def _backend_ok() -> bool:
    """One-shot backend probe (no waiting)."""
    try:
        return subprocess.run(
            [sys.executable, '-c', 'import jax; jax.devices()'],
            timeout=120, stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL).returncode == 0
    except subprocess.TimeoutExpired:
        return False


def run_train(cmd, log, exp):
    """run() with crash resilience for long train stages: on failure,
    wait until the backend answers again and relaunch resuming from the
    experiment's own newest checkpoint (weight.clear_history off so the
    step counter — and therefore the LR schedule and epoch accounting —
    continues where it left off; trailing duplicate keys win in
    load_config). Aborts after 4 consecutive failures that made no new
    checkpoint WHILE the backend stayed up — that is a real bug, not a
    tunnel drop (drop-induced failures, where the backend probe fails
    right after, never count)."""
    total = 0.0
    stale = 0
    prev_ckpt = None
    # LADDER_RESUME=1: a NEW driver run picks a killed train stage back up
    # from the experiment's own newest checkpoint instead of restarting it
    # (the in-run retry loop below already does this for attempt > 0)
    resume0 = os.environ.get('LADDER_RESUME') == '1'
    for attempt in range(RETRIES + 1):
        wait_backend()
        attempt_cmd = list(cmd)
        if attempt > 0 or resume0:
            try:
                ck = newest_ckpt(exp)
                attempt_cmd += ['weight.resume', ck,
                                'weight.clear_history', 'off']
                print(f'[ladder] resuming {exp} from {ck}', flush=True)
            except FileNotFoundError:
                print(f'[ladder] no {exp} ckpt yet, restarting stage',
                      flush=True)
        t0 = time.time()
        try:
            return total + run(attempt_cmd, log)
        except RuntimeError:
            total += time.time() - t0
            try:
                cur = newest_ckpt(exp)
            except FileNotFoundError:
                cur = None
            if cur == prev_ckpt and _backend_ok():
                stale += 1  # failed with the backend up and no progress
            elif cur != prev_ckpt:
                stale = 0
            prev_ckpt = cur
            if stale >= 4:
                raise RuntimeError(
                    f'{exp}: 4 consecutive failures with no checkpoint '
                    f'progress (last: {cur}) — aborting, see {log}')
            if attempt == RETRIES:
                raise
            time.sleep(30)  # don't hot-loop on a flapping tunnel


def _eff(cmd, key, default=None):
    """Effective value of a duplicated trailing override (last wins)."""
    vals = [cmd[i + 1] for i, t in enumerate(cmd[:-1]) if t == key]
    return vals[-1] if vals else default


def run_prune_stage(cmd, log, exp='clutter_pruneft'):
    """cli.prune with resume-aware retries. The stage is prune-rebuild
    (cheap) + a FULL fine-tune training run; rerunning it from scratch on
    a tunnel drop would repeat hours of fine-tuning. Once the fine-tune
    has saved a checkpoint, retries switch to cli.train replicating
    Trainer.run_prune's preset (pruned cfg, 0.2x lr, no warmup, eval
    every epoch — trainer.py run_prune) and resume from the newest one."""
    total = 0.0
    stale = 0
    prev_ckpt = None
    for attempt in range(RETRIES + 1):
        wait_backend()
        ck = None
        if attempt > 0:  # first attempt ALWAYS prunes fresh (a stale
            try:         # ckpt dir from an earlier run must not skip it)
                ck = newest_ckpt(exp)
            except FileNotFoundError:
                pass
        if ck is None:
            attempt_cmd = list(cmd)
        else:
            lr = float(_eff(cmd, 'train.learning_rate_init', '2e-4'))
            attempt_cmd = [sys.executable, '-m', 'pqdet_tpu.cli.train',
                           '--yaml', YAML,
                           'experiment_name', exp,
                           'model.cfg_path', _eff(cmd, 'prune.new_cfg'),
                           'train.max_epochs',
                           _eff(cmd, 'prune.finetune_epochs', '20'),
                           'train.learning_rate_init', repr(lr * 0.2),
                           'train.warmup_epochs', '0.0',
                           'sparse.switch', 'off', 'eval.after', '0',
                           ] + EXTRA + ['weight.resume', ck,
                                        'weight.clear_history', 'off']
            print(f'[ladder] resuming {exp} fine-tune from {ck}', flush=True)
        t0 = time.time()
        try:
            return total + run(attempt_cmd, log)
        except RuntimeError:
            total += time.time() - t0
            try:
                cur = newest_ckpt(exp)
            except FileNotFoundError:
                cur = None
            if cur == prev_ckpt and _backend_ok():
                stale += 1
            elif cur != prev_ckpt:
                stale = 0
            prev_ckpt = cur
            if stale >= 4:
                raise RuntimeError(
                    f'{exp}: 4 consecutive failures with no checkpoint '
                    f'progress (last: {cur}) — aborting, see {log}')
            if attempt == RETRIES:
                raise
            time.sleep(30)


def last_split(log):
    """Last per-epoch 'data load time: Xs, model train time: Ys' pair the
    trainer printed — the loader-vs-device split (reference
    trainer.py:287-289)."""
    dl = mt = None
    import re
    with open(log) as f:
        for line in f:
            m = re.search(r'data load time: ([0-9.]+)s, '
                          r'model train time: ([0-9.]+)s', line)
            if m:
                dl, mt = float(m.group(1)), float(m.group(2))
    return dl, mt


def all_aps(log):
    """Every AP table the log printed (evaluator.format_ap_table): the
    'mAPs' row holds per-IoU APs x100 then the mean AP — first col is
    AP50. Returns [(ap50, ap), ...] in print order, so a stage evaluated
    every epoch (eval.after 0) yields its whole recovery curve."""
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


def last_ap(log):
    aps = all_aps(log)
    return aps[-1] if aps else (None, None)


def _meta():
    """Self-describing provenance header (VERDICT r4 #8: reports/ holds
    several generations of ladder files whose meaning only STATUS could
    decode — every future report says what produced it)."""
    try:
        commit = subprocess.run(
            ['git', 'rev-parse', '--short', 'HEAD'], cwd='/root/repo',
            capture_output=True, text=True).stdout.strip()
    except OSError:
        commit = None
    return {'driver': 'tools/run_ladder.py', 'yaml': YAML,
            'extra': EXTRA, 'commit': commit,
            'date': time.strftime('%Y-%m-%d %H:%M UTC', time.gmtime())}


def record(stage, **kv):
    data = {}
    if os.path.exists(REPORT):
        data = json.load(open(REPORT))
    data.setdefault('meta', _meta())
    data[stage] = kv
    os.makedirs(os.path.dirname(REPORT), exist_ok=True)
    json.dump(data, open(REPORT, 'w'), indent=1)
    print(f'[{stage}] {kv}', flush=True)


def main():
    stages = sys.argv[1:] or ['fp', 'sparse', 'prune', 'qat', 'int8']
    py = sys.executable

    if 'fp' in stages:
        dt = run_train([py, '-m', 'pqdet_tpu.cli.train', '--yaml', YAML]
                       + EXTRA, os.path.join(LOGDIR, 'ladder_fp.log'),
                       'clutter_mobilenetv2_fpn')
        ap50, ap = last_ap(os.path.join(LOGDIR, 'ladder_fp.log'))
        dl, mt = last_split(os.path.join(LOGDIR, 'ladder_fp.log'))
        record('fp', ap50=ap50, ap=ap, minutes=round(dt / 60, 1),
               dataload_s=dl, model_s=mt,
               ckpt=newest_ckpt('clutter_mobilenetv2_fpn'))

    if 'sparse' in stages:
        fp_ckpt = json.load(open(REPORT))['fp']['ckpt']
        dt = run_train([py, '-m', 'pqdet_tpu.cli.train', '--yaml', YAML,
                  'experiment_name', 'clutter_sparse',
                  'weight.resume', fp_ckpt, 'weight.clear_history', 'on',
                  'sparse.switch', 'on', 'sparse.ratio', '0.005',
                  # round 4: 12 sparse epochs (the round-3 6-epoch budget
                  # left the fp baseline's undertraining visible in the
                  # sparse delta; the reference sparse-trains much longer
                  # before pruning, prune.py:12-30)
                  'train.max_epochs', '12',
                  'train.learning_rate_init', '1e-4',
                  'eval.after', '7', 'eval.interval', '2'] + EXTRA,
                 os.path.join(LOGDIR, 'ladder_sparse.log'), 'clutter_sparse')
        log = os.path.join(LOGDIR, 'ladder_sparse.log')
        ap50, ap = last_ap(log)
        dl, mt = last_split(log)
        record('sparse', ap50=ap50, ap=ap, minutes=round(dt / 60, 1),
               dataload_s=dl, model_s=mt, per_eval=all_aps(log),
               ckpt=newest_ckpt('clutter_sparse'))

    if 'prune' in stages:
        sp_ckpt = json.load(open(REPORT))['sparse']['ckpt']
        dt = run_prune_stage([py, '-m', 'pqdet_tpu.cli.prune', '--yaml', YAML,
                  'experiment_name', 'clutter_pruneft',
                  'prune.weight', sp_ckpt,
                  'prune.new_cfg', os.path.join(W, 'clutter_pruned.cfg'),
                  'prune.ratio', '0.3',
                  # 15 finetune epochs, evaluated EVERY epoch (recovery
                  # curve; reference fine-tunes 20 epochs, trainer.py
                  # run_prune — round 3's 10 left the curve still rising)
                  'prune.finetune_epochs', '15',
                  'train.learning_rate_init', '1e-4',
                  'eval.after', '0'] + EXTRA,
                 os.path.join(LOGDIR, 'ladder_prune.log'))
        log = os.path.join(LOGDIR, 'ladder_prune.log')
        ap50, ap = last_ap(log)
        record('prune', ap50=ap50, ap=ap, minutes=round(dt / 60, 1),
               per_eval=all_aps(log), ckpt=newest_ckpt('clutter_pruneft'))

    if 'qat' in stages:
        pf_ckpt = json.load(open(REPORT))['prune']['ckpt']
        dt = run_train([py, '-m', 'pqdet_tpu.cli.train', '--yaml', YAML,
                  'experiment_name', 'clutter_qat',
                  'weight.resume', pf_ckpt, 'weight.clear_history', 'on',
                  # the finetuned ckpt has PRUNED shapes: build from the
                  # pruned cfg the prune stage wrote (reference prune.py
                  # flow trains the new cfg; trainer resolves model.cfg_path
                  # before the ckpt-embedded text)
                  'model.cfg_path', os.path.join(W, 'clutter_pruned.cfg'),
                  'quant.switch', 'on',
                  'quant.disable_observer_after', '2',
                  'quant.freeze_bn_after', '3',
                  'train.max_epochs', '4',
                  'train.learning_rate_init', '5e-5',
                  'train.input_sizes', '[512]',
                  'augment.mosaic_p', '0.0', 'augment.mixup_p', '0.0',
                  # eval every epoch: the QAT stage's own AP localises a
                  # downstream int8 regression (round-3 lesson: the first
                  # clutter ladder ran QAT blind and int8 landed at 0.0
                  # with nothing to bisect against)
                  'eval.after', '0'] + EXTRA,
                 os.path.join(LOGDIR, 'ladder_qat.log'), 'clutter_qat')
        log = os.path.join(LOGDIR, 'ladder_qat.log')
        ap50, ap = last_ap(log)
        record('qat', ap50=ap50, ap=ap, minutes=round(dt / 60, 1),
               per_eval=all_aps(log), ckpt=newest_ckpt('clutter_qat'))

    if 'int8' in stages:
        q_ckpt = json.load(open(REPORT))['qat']['ckpt']
        int8_path = os.path.join(W, 'clutter_int8.ckpt')
        run_retry([py, '-m', 'pqdet_tpu.cli.convert', 'quantize',
             '--weight', q_ckpt, '--out', int8_path],
            os.path.join(LOGDIR, 'ladder_convert.log'))
        dt = run_retry([py, '-m', 'pqdet_tpu.cli.bench', 'eval', '--yaml', YAML,
                  '--weight', int8_path, 'eval.batch_size', '16'] + EXTRA,
                 os.path.join(LOGDIR, 'ladder_int8eval.log'))
        ap50, ap = last_ap(os.path.join(LOGDIR, 'ladder_int8eval.log'))
        record('int8', ap50=ap50, ap=ap, minutes=round(dt / 60, 1),
               ckpt=int8_path)
        if not ap50:
            # bisect a dead int8 eval on the spot: the exact-int XLA
            # executor shares the conversion but none of the Pallas
            # kernels, so pallas=0/exact>0 indicts the kernels and
            # both=0 indicts conversion or the QAT weights
            dt = run_retry([py, '-m', 'pqdet_tpu.cli.bench', 'eval',
                            '--yaml', YAML, '--weight', int8_path,
                            '--int8-exact', 'eval.batch_size', '16'] + EXTRA,
                           os.path.join(LOGDIR, 'ladder_int8exact.log'))
            ap50, ap = last_ap(os.path.join(LOGDIR, 'ladder_int8exact.log'))
            record('int8_exact', ap50=ap50, ap=ap,
                   minutes=round(dt / 60, 1), ckpt=int8_path)

    if os.path.exists(REPORT):
        print(json.dumps(json.load(open(REPORT)), indent=1))


if __name__ == '__main__':
    main()
