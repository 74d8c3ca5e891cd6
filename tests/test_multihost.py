"""Multi-host data loading: a real 2-process CPU cluster trains one step on
the shared-seed epoch plan and must produce the SAME loss as a single-host
run over the same global batch (the reference's DataParallel generalised,
tools.py:216; SURVEY.md section 5 distributed backend).

Each subprocess joins a jax.distributed cluster (1 CPU device per process),
loads its contiguous half of the first global batch via TrainData's
num_hosts/host_id slicing, assembles global arrays with
host_local_batch_to_global, and runs the jitted sharded train step. All
augmentations are disabled so the host slices are deterministic; the epoch
plan is shared through system.seed.
"""

import json
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from tests.test_data import _write_voc_fixture
from tests.test_e2e import TINY_DET

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = textwrap.dedent('''
    import json, os, sys
    os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=1'
    import jax
    jax.config.update('jax_platforms', 'cpu')

    n_proc = int(sys.argv[1]); proc_id = int(sys.argv[2])
    coord = sys.argv[3]; train_txt = sys.argv[4]; cfg_path = sys.argv[5]
    if n_proc > 1:
        jax.distributed.initialize(coordinator_address=coord,
                                   num_processes=n_proc, process_id=proc_id)

    import numpy as np
    from pqdet_tpu.config import load_config
    from pqdet_tpu.train.trainer import Trainer

    cfg = load_config(opts=[
        'dataset.train_txt_file', train_txt,
        'dataset.eval_txt_file', train_txt,
        'dataset.classes', '[cat, dog, bird]',
        'model.cfg_path', cfg_path,
        'model.max_gt_boxes', '8',
        'train.batch_size', '2',
        'train.input_sizes', '[64]',
        'train.max_epochs', '1',
        'train.warmup_epochs', '0',
        'eval.after', '99',
        'eval.input_size', '64',
        'augment.mixup_p', '0', 'augment.color_p', '0',
        'augment.hflip_p', '0', 'augment.vflip_p', '0',
        'augment.crop_p', '0', 'augment.mosaic_p', '0',
        'system.num_workers', '1',
        'system.seed', '7',
        'system.compute_dtype', 'float32',
        'weight.dir', sys.argv[6],
    ])

    t = Trainer(cfg)
    t.init_all()
    batch, steps = next(t._grouped_batches())
    batch = t._put_batch(batch)
    rng = jax.random.PRNGKey(42)
    _, _, _, metrics = t.jstep(t.params, t.state, t.opt_state, batch, rng)
    print('LOSS_JSON:' + json.dumps({'proc': proc_id,
                                     'loss': float(metrics['loss'])}))
''')


def _free_port():
    s = socket.socket()
    s.bind(('localhost', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(n_proc, train_txt, cfg_path, wdir, timeout=600):
    coord = f'localhost:{_free_port()}'
    env = dict(os.environ,
               PYTHONPATH=f'{REPO}:' + os.environ.get('PYTHONPATH', ''),
               JAX_PLATFORMS='')
    procs = [subprocess.Popen(
        [sys.executable, '-c', _WORKER, str(n_proc), str(i), coord,
         train_txt, cfg_path, wdir],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        cwd=REPO) for i in range(n_proc)]
    losses = {}
    for p in procs:
        out, _ = p.communicate(timeout=timeout)
        assert p.returncode == 0, out
        for line in out.splitlines():
            if line.startswith('LOSS_JSON:'):
                rec = json.loads(line[len('LOSS_JSON:'):])
                losses[rec['proc']] = rec['loss']
    return losses


@pytest.mark.slow
def test_two_host_loss_matches_single_host(tmp_path):
    train_txt = _write_voc_fixture(str(tmp_path), n=4)
    cfg_path = tmp_path / 'tiny.cfg'
    cfg_path.write_text(TINY_DET)
    wdir = str(tmp_path / 'w')

    single = _run_workers(1, train_txt, str(cfg_path), wdir)
    multi = _run_workers(2, train_txt, str(cfg_path), wdir)

    assert set(multi) == {0, 1}
    # both hosts see the same (psum-reduced) loss, equal to the single-host
    # loss over the identical global batch
    np.testing.assert_allclose(multi[0], multi[1], rtol=1e-6)
    np.testing.assert_allclose(multi[0], single[0], rtol=1e-5)
