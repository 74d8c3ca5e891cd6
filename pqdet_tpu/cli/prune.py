"""Prune CLI: slimming-prune a checkpoint, eval it, fine-tune it
(reference prune.py:12-30).

    python -m pqdet_tpu.cli.prune --yaml exp.yaml \
        prune.weight model.ckpt prune.new_cfg pruned.cfg prune.ratio 0.3
"""

from __future__ import annotations

import argparse


def main():
    from pqdet_tpu.utils.debug import register_stack_dump
    register_stack_dump()
    parser = argparse.ArgumentParser(description='channel pruning')
    parser.add_argument('--yaml', default=None)
    parser.add_argument('--skip-test', action='store_true')
    parser.add_argument('--skip-finetune', action='store_true')
    args, rest = parser.parse_known_args()

    from pqdet_tpu.config import load_config
    from pqdet_tpu.compress.prune import prune_slimming
    from pqdet_tpu.model.factory import build_detector
    from pqdet_tpu.model.graph import Graph
    from pqdet_tpu.train.checkpoint import save_checkpoint
    from pqdet_tpu.utils.profiling import clever_format, count_macs_params

    cfg = load_config(args.yaml, rest)
    network, params, state, info = build_detector(
        None, weight_path=cfg.prune.weight)
    print(f'load weights from {cfg.prune.weight}')

    result = prune_slimming(network.graph, params, state, cfg.prune.ratio)
    print('\n'.join(result.report))

    with open(cfg.prune.new_cfg, 'w') as fw:
        fw.write(result.cfg_text)
    pruned_weight = cfg.prune.weight.rsplit('.', 1)[0] + '-pruned.ckpt'
    save_checkpoint(pruned_weight, result.params, result.state, step=0,
                    cfg_text=result.cfg_text)
    print('Slimming Pruner done')

    size = (512, 512)
    macs0, params0 = count_macs_params(network.graph, size)
    g1 = Graph.from_cfg(result.cfg_text)
    macs1, params1 = count_macs_params(g1, size)
    print(f'flops: {clever_format(macs0)} -> {clever_format(macs1)}, '
          f'params: {clever_format(params0)} -> {clever_format(params1)}')

    if not args.skip_test:
        _test(cfg, result)
    if not args.skip_finetune:
        from pqdet_tpu.train.trainer import Trainer
        Trainer(cfg).run_prune(pruned_weight)


def _test(cfg, result):
    import jax
    from pqdet_tpu.data.eval_data import EvalData
    from pqdet_tpu.evaluation.evaluator import Evaluator, format_ap_table
    from pqdet_tpu.evaluation.predict import (build_predict_pipeline,
                                              make_batch_predict)
    from pqdet_tpu.model.network import DetectionNetwork, fuse_params

    network = DetectionNetwork.from_cfg(result.cfg_text)
    fused = fuse_params(network, jax.tree.map(jax.numpy.asarray, result.params),
                        jax.tree.map(jax.numpy.asarray, result.state))
    predict = make_batch_predict(build_predict_pipeline(network, cfg), fused)

    data = EvalData(cfg)
    ap = Evaluator(predict, data, cfg).evaluate()
    print(format_ap_table(ap))


if __name__ == '__main__':
    main()
