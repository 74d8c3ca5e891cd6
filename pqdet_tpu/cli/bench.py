"""Eval / benchmark / summary / time CLI (reference test.py:213-250).

    python -m pqdet_tpu.cli.bench eval --yaml ... [--weight ...]
    python -m pqdet_tpu.cli.bench benchmark --yaml ... --weight ...
    python -m pqdet_tpu.cli.bench summary [--cfg zoo-name|file.cfg] [--size 512]
    python -m pqdet_tpu.cli.bench time [--cfg ...] [--bs 1] [--size 512]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def cmd_summary(args, cfg):
    from pqdet_tpu.config import resolve_model_cfg
    from pqdet_tpu.model.graph import Graph
    from pqdet_tpu.utils.profiling import clever_format, count_macs_params

    text = resolve_model_cfg(cfg)
    graph = Graph.from_cfg(text)
    macs, params = count_macs_params(graph, (args.size, args.size))
    print(f'flops:{clever_format(macs)}, params: {clever_format(params)}')


def _build_forward(cfg, weight, compute_dtype=None):
    import jax
    import jax.numpy as jnp
    from pqdet_tpu.config import resolve_model_cfg
    from pqdet_tpu.model.factory import build_detector, inference_params

    cfg_text = None if weight else resolve_model_cfg(cfg)
    network, params, state, _ = build_detector(cfg_text, weight_path=weight or None)
    fused = inference_params(network, params, state, dtype=compute_dtype)

    @jax.jit
    def forward(p, x):
        from pqdet_tpu.ops.preprocess import device_normalize
        preds, _ = network.apply(p, {}, device_normalize(x),
                                 compute_dtype=compute_dtype)
        return preds

    return network, fused, forward


def cmd_time(args, cfg):
    import jax.numpy as jnp
    if args.shlo:
        # time an exported StableHLO serving artifact (the reference's
        # `benchmark --onnx` analogue, test.py:22-40)
        from pqdet_tpu.exporters.export import load_stablehlo
        with open(args.shlo, 'rb') as fr:
            fn = load_stablehlo(fr.read())
        x = jnp.zeros((args.bs, args.size, args.size, 3), jnp.float32)
        import jax
        for _ in range(10):
            jax.block_until_ready(fn(x))
        ts = []
        for _ in range(64):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(x))
            ts.append((time.perf_counter() - t0) * 1e3)
        print(f'stablehlo: {np.mean(ts):.3f}ms (p50 {np.percentile(ts, 50):.3f}ms) '
              f'bs={args.bs} size={args.size}  '
              f'[dispatch-level timing; see bench.py for fenced methodology]')
        return
    dtype = jnp.bfloat16 if args.bf16 else None
    _, fused, forward = _build_forward(cfg, args.weight, dtype)
    x = jnp.asarray(np.zeros((args.bs, args.size, args.size, 3), np.float32))
    for _ in range(10):
        forward(fused, x).block_until_ready()
    if args.trace:
        from pqdet_tpu.utils.profiling import trace
        with trace(args.trace) as log_dir:
            for _ in range(8):
                forward(fused, x).block_until_ready()
        print(f'profiler trace written to {log_dir}')
    ts = []
    for _ in range(64):
        t0 = time.perf_counter()
        forward(fused, x).block_until_ready()
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f'{np.mean(ts):.3f}ms (p50 {np.percentile(ts, 50):.3f}ms) '
          f'bs={args.bs} size={args.size}  '
          f'[dispatch-level timing; see bench.py for fenced methodology]')


def cmd_eval(args, cfg):
    from pqdet_tpu.data.eval_data import EvalData
    from pqdet_tpu.evaluation.evaluator import Evaluator, format_ap_table
    predict = _make_predict(args, cfg)
    data = EvalData(cfg)
    evaluator = Evaluator(predict, data, cfg)
    ap = evaluator.evaluate()
    print(format_ap_table(ap, verbose=True))


def _make_predict(args, cfg):
    from pqdet_tpu.evaluation.predict import (build_predict_pipeline,
                                              make_batch_predict)
    from pqdet_tpu.train.checkpoint import load_checkpoint

    is_quant = bool(args.weight) and \
        load_checkpoint(args.weight).get('type') == 'quant'
    if is_quant:
        # int8 inference path for converted checkpoints
        from pqdet_tpu.compress.quantized import Int8Inference, load_quantized
        network, qparams = load_quantized(args.weight)
        int8 = Int8Inference(network,
                             mode='int' if args.int8_exact else 'pallas',
                             act=qparams['act'])
        run = build_predict_pipeline(network, cfg,
                                     apply_fn=lambda p, x: int8.apply(p, x))
        return make_batch_predict(run, Int8Inference.prepare(
            qparams, mode='int' if args.int8_exact else 'pallas',
            network=network))

    from pqdet_tpu.config import resolve_model_cfg
    from pqdet_tpu.model.factory import build_detector, inference_params
    cfg_text = None if args.weight else resolve_model_cfg(cfg)
    network, params, state, _ = build_detector(cfg_text,
                                               weight_path=args.weight or None)
    fused = inference_params(network, params, state)
    fused_table = None
    if getattr(cfg.eval, 'fused_ir', False):
        from pqdet_tpu.ops.pallas_fused import prepare_fused_ir
        fused_table = prepare_fused_ir(network, fused)
        print(f'fused_ir: {len(fused_table)} inverted-residual chains '
              f'through the Pallas kernel')
    run = build_predict_pipeline(network, cfg, fused_ir=fused_table)
    return make_batch_predict(run, fused)


def cmd_benchmark(args, cfg):
    """Per-stage timing over real eval images, four-way like the reference
    (test.py:155-193): TOTAL / FORWARD (net) / CONVERT (recover affine) /
    NMS, each stage a separate jitted function fetched to completion."""
    import jax
    import jax.numpy as jnp
    from pqdet_tpu.config import size_fix
    from pqdet_tpu.data.eval_data import EvalData
    from pqdet_tpu.data.samples import RECOVER_AFFINE_REGISTER
    from pqdet_tpu.ops.postprocess import nms_batch, recover_bboxes
    from pqdet_tpu.utils.meters import TicToc

    network, fused, forward = _build_forward(cfg, args.weight)
    affine = RECOVER_AFFINE_REGISTER[cfg.dataset.name.lower()]
    input_size = np.array(size_fix(cfg.eval.input_size), np.float32)

    @jax.jit
    def convert(preds, shapes):
        return recover_bboxes(preds, jnp.asarray(input_size), shapes,
                              affine=affine)

    @jax.jit
    def nms(rec):
        return nms_batch(rec, cfg.eval.score_threshold, cfg.eval.iou_threshold,
                         cfg.eval.max_detections,
                         getattr(cfg.eval, 'pool_factor', 4),
                         getattr(cfg.eval, 'nms_method', 'nms'),
                         getattr(cfg.eval, 'nms_sigma', 0.3))

    data = EvalData(cfg)
    fw_tt, cv_tt, nms_tt, total_tt = (TicToc('forward'), TicToc('convert'),
                                      TicToc('nms'), TicToc('total'))
    n_img = 0
    for i, batch in enumerate(data.batches(cfg.system.num_workers)):
        x = jnp.asarray(batch['image'])
        shapes = jnp.asarray(batch['shape'])
        if i == 0:  # compile all stages
            nms(convert(forward(fused, x), shapes)).valid.block_until_ready()
        total_tt.tic()
        fw_tt.tic()
        preds = forward(fused, x)
        preds.block_until_ready()
        fw_tt.toc()
        cv_tt.tic()
        rec = convert(preds, shapes)
        rec.block_until_ready()
        cv_tt.toc()
        nms_tt.tic()
        nms(rec).valid.block_until_ready()
        nms_tt.toc()
        total_tt.toc()
        n_img += batch['count']
        if args.limit and n_img >= args.limit:
            break
    for tt in (total_tt, fw_tt, cv_tt, nms_tt):
        s = tt.statistics()
        print('{}: mean {:.2f}ms/batch ({:.2f}ms/img over {} imgs)'.format(
            s['name'], s['mean'] / 1e6, s['mean'] / 1e6 / max(
                cfg.eval.batch_size, 1), n_img))
    print('[stage timers fence with block_until_ready; through the axon '
          'tunnel that is dispatch-level, not device time — see bench.py '
          'for the fenced chained-jit methodology]')


def main():
    from pqdet_tpu.utils.debug import register_stack_dump
    register_stack_dump()
    parser = argparse.ArgumentParser(description='eval/benchmark CLI')
    parser.add_argument('mode', choices=['eval', 'benchmark', 'summary', 'time'])
    parser.add_argument('--yaml', default=None)
    parser.add_argument('--weight', default='')
    parser.add_argument('--cfg', default='')
    parser.add_argument('--size', type=int, default=512)
    parser.add_argument('--bs', type=int, default=1)
    parser.add_argument('--bf16', action='store_true')
    parser.add_argument('--limit', type=int, default=100)
    parser.add_argument('--trace', default='',
                        help='write a jax.profiler trace to this directory')
    parser.add_argument('--shlo', default='',
                        help='time an exported StableHLO artifact instead '
                             'of a checkpoint')
    parser.add_argument('--int8-exact', action='store_true',
                        help='evaluate quant checkpoints with exact integer '
                             'accumulation instead of the fast dequant mode')
    args, rest = parser.parse_known_args()
    args.opts = rest  # trailing config overrides: key value [...]

    from pqdet_tpu.config import load_config
    cfg = load_config(args.yaml, args.opts, freeze=False)
    if args.cfg:
        cfg.model.cfg_path = args.cfg
    cfg.freeze()

    {'eval': cmd_eval, 'benchmark': cmd_benchmark,
     'summary': cmd_summary, 'time': cmd_time}[args.mode](args, cfg)


if __name__ == '__main__':
    main()
