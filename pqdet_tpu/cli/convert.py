"""Conversion/export CLI (reference convert.py).

    python -m pqdet_tpu.cli.convert stablehlo --weight m.ckpt --out m.shlo [--nms]
    python -m pqdet_tpu.cli.convert onnx --weight m.ckpt --out m.onnx
    python -m pqdet_tpu.cli.convert darknet --weight m.ckpt --out m.weights
    python -m pqdet_tpu.cli.convert from-torch --weight ref.pt --out m.ckpt
    python -m pqdet_tpu.cli.convert partial --weight m.ckpt --out bb.ckpt --layers 61

``onnx`` exports fp checkpoints via export_normal_to_onnx (reference
convert.py:58-69) and 'quant' checkpoints via export_quantized_to_onnx
(reference convert.py:49-56) — the checkpoint type selects the graph.
"""

from __future__ import annotations

import argparse


def main():
    parser = argparse.ArgumentParser(description='export / convert')
    parser.add_argument('mode', choices=['stablehlo', 'onnx', 'darknet',
                                         'from-torch', 'partial', 'quantize'])
    parser.add_argument('--weight', required=True)
    parser.add_argument('--out', required=True)
    parser.add_argument('--size', type=int, default=512)
    parser.add_argument('--bs', type=int, default=1)
    parser.add_argument('--nms', action='store_true')
    parser.add_argument('--layers', type=int, default=0)
    args, _ = parser.parse_known_args()

    if args.mode == 'from-torch':
        from pqdet_tpu.exporters.torch_convert import convert_torch_checkpoint
        convert_torch_checkpoint(args.weight, args.out)
        print(f'saved: {args.out}')
        return
    if args.mode == 'partial':
        from pqdet_tpu.exporters.export import partial_checkpoint
        partial_checkpoint(args.weight, args.out, args.layers)
        print(f'saved: {args.out}')
        return

    if args.mode == 'onnx':
        from pqdet_tpu.train.checkpoint import load_checkpoint
        size = (args.size, args.size)
        if load_checkpoint(args.weight).get('type') == 'quant':
            from pqdet_tpu.compress.quantized import load_quantized
            from pqdet_tpu.exporters.onnx_export import export_quantized_to_onnx
            network, qparams = load_quantized(args.weight)
            blob = export_quantized_to_onnx(network, qparams, size,
                                            batch_size=args.bs)
        else:
            import jax
            import numpy as np
            from pqdet_tpu.exporters.onnx_export import export_normal_to_onnx
            from pqdet_tpu.model.factory import (build_detector,
                                                 inference_params)
            network, params, state, _ = build_detector(
                None, weight_path=args.weight)
            fused = jax.tree.map(np.asarray,
                                 inference_params(network, params, state))
            blob = export_normal_to_onnx(network, fused, size,
                                         batch_size=args.bs)
        with open(args.out, 'wb') as fw:
            fw.write(blob)
        print(f'saved: {args.out}')
        return

    if args.mode == 'stablehlo':
        from pqdet_tpu.train.checkpoint import load_checkpoint
        if load_checkpoint(args.weight).get('type') == 'quant':
            from pqdet_tpu.compress.quantized import load_quantized
            from pqdet_tpu.exporters.export import export_stablehlo_quant
            network, qparams = load_quantized(args.weight)
            blob = export_stablehlo_quant(network, qparams,
                                          input_size=(args.size, args.size),
                                          batch_size=args.bs)
            with open(args.out, 'wb') as fw:
                fw.write(blob)
            print(f'saved: {args.out}')
            return

    from pqdet_tpu.model.factory import build_detector, inference_params
    network, params, state, info = build_detector(None, weight_path=args.weight)

    if args.mode == 'quantize':
        from pqdet_tpu.compress.quantized import convert_to_int8, save_quantized
        qparams = convert_to_int8(network, params, state)
        save_quantized(args.out, network, qparams, info['cfg_text'],
                       step=info['step'], ap=info['AP'])
        print(f'saved: {args.out}')
        return

    if args.mode == 'darknet':
        from pqdet_tpu.exporters.export import save_weights_darknet
        save_weights_darknet(network, params, state, args.out)
    else:
        from pqdet_tpu.exporters.export import export_stablehlo
        fused = inference_params(network, params, state)
        blob = export_stablehlo(network, fused,
                                input_size=(args.size, args.size),
                                batch_size=args.bs, with_nms=args.nms)
        with open(args.out, 'wb') as fw:
            fw.write(blob)
    print(f'saved: {args.out}')


if __name__ == '__main__':
    main()
