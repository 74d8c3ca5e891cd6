"""Repro harness for the clutter-ladder int8 AP=0.0: run the structural
part of the pruned->QAT->convert->Int8Inference arc at FULL model scale
(zoo mobilenetv2-fpn cfg, 30% slimming prune) on CPU and compare the int8
executor's raw head outputs against the fp and fake-quant forwards.

If parity holds here, the conversion/executor is structurally sound on
pruned graphs and the ladder's 0.0 came from the QAT train stage itself
(which the ladder now bisects by evaluating every epoch).
"""

import os
import sys

import jax

if os.environ.get('REPRO_TPU') != '1':
    jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from pqdet_tpu.compress.prune import prune_slimming
from pqdet_tpu.compress.qat import QuantCtx, prepare_qat_state
from pqdet_tpu.compress.quantized import Int8Inference, convert_to_int8
from pqdet_tpu.model.network import DetectionNetwork

SIZE = int(os.environ.get('REPRO_SIZE', '256'))
BS = int(os.environ.get('REPRO_BS', '2'))
MODEL = os.environ.get('REPRO_MODEL', 'mobilenetv2-fpn')


def main():
    from pqdet_tpu.zoo import get_cfg
    cfg_text = get_cfg(MODEL, num_classes=20)
    net = DetectionNetwork.from_cfg(cfg_text)
    params, state = net.init(jax.random.PRNGKey(0))

    # make BN stats non-trivial (fresh init has mean 0 var 1 everywhere):
    # one train-mode pass so running stats move like a trained ckpt's
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.rand(BS, SIZE, SIZE, 3).astype(np.float32))
    _, state = net.apply(params, state, x0, train=True)

    res = prune_slimming(net.graph, params, state, prune_ratio=0.3)
    pnet = DetectionNetwork.from_cfg(res.cfg_text, quant=True)
    pparams, pstate = res.params, res.state

    pparams, pstate = prepare_qat_state(pnet, pparams, pstate)

    # calibrate observers over a few batches (inference-mode BN, like the
    # converted eval)
    for i in range(4):
        xb = jnp.asarray(rng.rand(BS, SIZE, SIZE, 3).astype(np.float32))
        ctx = QuantCtx(pstate['quant'], observing=True)
        _, _ = pnet.apply(pparams, pstate, xb, quant_ctx=ctx)
        pstate = {**pstate, 'quant': ctx.new_obs}

    x = jnp.asarray(rng.rand(BS, SIZE, SIZE, 3).astype(np.float32))
    out_fp, _ = pnet.apply(pparams, pstate, x)
    ctx = QuantCtx(pstate['quant'], observing=False)
    out_fq, _ = pnet.apply(pparams, pstate, x, quant_ctx=ctx)

    qparams = convert_to_int8(pnet, pparams, pstate)
    for mode in ('int', 'pallas'):
        int8_net = Int8Inference(pnet, mode=mode)
        qp = Int8Inference.prepare(qparams, mode=mode)
        out_i8 = jax.jit(int8_net.apply)(qp, x)
        be = np.abs(np.asarray(out_i8[..., :4] - out_fq[..., :4]))
        se = np.abs(np.asarray(out_i8[..., 4:] - out_fq[..., 4:]))
        print(f'[{mode}] vs fake-quant: box err med {np.median(be):.4f} '
              f'max {be.max():.3f} | score err med {np.median(se):.5f} '
              f'max {se.max():.4f}')
        be = np.abs(np.asarray(out_i8[..., :4] - out_fp[..., :4]))
        se = np.abs(np.asarray(out_i8[..., 4:] - out_fp[..., 4:]))
        print(f'[{mode}] vs fp        : box err med {np.median(be):.4f} '
              f'max {be.max():.3f} | score err med {np.median(se):.5f} '
              f'max {se.max():.4f}')
        objs = np.asarray(out_i8[..., 4])
        print(f'[{mode}] int8 obj-score stats: min {objs.min():.4f} '
              f'max {objs.max():.4f} mean {objs.mean():.4f}')
    objs = np.asarray(out_fp[..., 4])
    print(f'[fp   ] obj-score stats: min {objs.min():.4f} '
          f'max {objs.max():.4f} mean {objs.mean():.4f}')


if __name__ == '__main__':
    main()
