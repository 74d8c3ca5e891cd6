"""Model export: StableHLO (the TPU-native serving format), darknet
.weights, and checkpoint surgery utilities.

The reference exports ONNX — a hand-built quantized graph plus
torch.onnx for fp models (convert.py, export/onnx_exporter.py). On TPU the
deployable artifact is StableHLO/jax.export: the full jitted inference
function (forward [+ decode [+ NMS]]) serialises to a portable bytecode
any XLA runtime can load; ``export_stablehlo_quant`` serialises the int8
executor so 'quant' checkpoints have a deployable artifact too. Literal
ONNX files come from exporters/onnx_export.py (self-contained writer, no
onnx package needed).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from pqdet_tpu.model.network import DetectionNetwork


def export_stablehlo(network: DetectionNetwork, fused_params: Dict,
                     input_size: Tuple[int, int] = (512, 512),
                     batch_size: int = 1, with_nms: bool = False,
                     score_threshold: float = 0.1, iou_threshold: float = 0.45,
                     max_detections: int = 256):
    """Serialise the inference function to StableHLO bytecode (bytes).

    The exported function maps (params, image batch) with params baked in:
    images (B, H, W, 3) float32 -> (B, sum HWA, 5+C) decoded predictions,
    or NMS outputs when with_nms.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    if with_nms:
        from pqdet_tpu.ops.postprocess import nms_batch

        def fn(images):
            preds, _ = network.apply(fused_params, {}, images)
            res = nms_batch(preds, score_threshold, iou_threshold,
                            max_detections)
            return res.boxes, res.scores, res.classes, res.valid
    else:
        def fn(images):
            preds, _ = network.apply(fused_params, {}, images)
            return preds

    spec = jax.ShapeDtypeStruct((batch_size, *input_size, 3), jnp.float32)
    exported = jax_export.export(jax.jit(fn))(spec)
    return exported.serialize()


def export_stablehlo_quant(network: DetectionNetwork, qparams: Dict,
                           input_size: Tuple[int, int] = (512, 512),
                           batch_size: int = 1, mode: str = 'int'):
    """Serialise the int8 executor (compress.quantized.Int8Inference) so a
    'quant' checkpoint has a deployable serving artifact: images (B,H,W,3)
    f32 -> (B, sum HWA, 5+C) decoded predictions, int8 weights baked in.

    Default mode 'int' keeps the artifact pure StableHLO (portable to any
    XLA runtime); 'pallas' embeds the fused TPU kernels as custom calls
    (fastest, TPU-only — export on a TPU host).
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export
    from pqdet_tpu.compress.quantized import Int8Inference

    exe = Int8Inference(network, mode=mode)
    staged = Int8Inference.prepare(qparams, mode=mode, network=network)

    def fn(images):
        return exe.apply(staged, images)

    spec = jax.ShapeDtypeStruct((batch_size, *input_size, 3), jnp.float32)
    exported = jax_export.export(jax.jit(fn))(spec)
    return exported.serialize()


def load_stablehlo(blob: bytes):
    """Deserialise an exported inference function; returns a callable."""
    from jax import export as jax_export
    exported = jax_export.deserialize(blob)
    return exported.call


def save_weights_darknet(network: DetectionNetwork, params: Dict, state: Dict,
                         save_path: str, seen: int = 0):
    """Write darknet .weights: int32 header (0, 0, 0, seen) then per conv
    layer [bn beta, gamma, mean, var | bias] + OIHW weights
    (reference convert.py:9-47)."""
    with open(save_path, 'wb') as fw:
        np.array([0, 0, 0, seen], dtype=np.int32).tofile(fw)
        for node in network.graph.nodes:
            key = str(node.index)
            if node.kind == 'fc':
                p = params[key]
                np.asarray(p['b'], np.float32).tofile(fw)
                np.asarray(p['w'], np.float32).T.tofile(fw)
                continue
            if node.kind != 'convolutional':
                continue
            p = params[key]
            if 'bn' in p:
                np.asarray(p['bn']['beta'], np.float32).tofile(fw)
                np.asarray(p['bn']['gamma'], np.float32).tofile(fw)
                np.asarray(state[key]['mean'], np.float32).tofile(fw)
                np.asarray(state[key]['var'], np.float32).tofile(fw)
            else:
                np.asarray(p['b'], np.float32).tofile(fw)
            # HWIO -> darknet OIHW
            w = np.asarray(p['w'], np.float32).transpose(3, 2, 0, 1)
            w.tofile(fw)


def load_weights_darknet(network: DetectionNetwork, path: str,
                         params: Dict, state: Dict) -> Tuple[Dict, Dict]:
    """Read darknet .weights into the params/state pytrees (inverse of
    save_weights_darknet; enables importing darknet-ecosystem weights)."""
    buf = np.fromfile(path, dtype=np.float32)
    pos = 4  # int32 header occupies 4 float32 slots
    new_params = {k: dict(v) for k, v in params.items()}
    new_state = {k: dict(v) for k, v in state.items()}

    def take(n):
        nonlocal pos
        out = buf[pos:pos + n]
        if len(out) != n:
            raise ValueError('darknet weights file truncated')
        pos += n
        return out

    for node in network.graph.nodes:
        key = str(node.index)
        if node.kind == 'fc':
            p = params[key]
            new_params[key]['b'] = take(np.asarray(p['b']).size)
            w_shape = np.asarray(p['w']).shape
            new_params[key]['w'] = take(int(np.prod(w_shape))) \
                .reshape(w_shape[::-1]).T
            continue
        if node.kind != 'convolutional':
            continue
        p = params[key]
        c = node.out_channels
        if 'bn' in p:
            beta, gamma = take(c), take(c)
            mean, var = take(c), take(c)
            new_params[key]['bn'] = {'gamma': gamma, 'beta': beta}
            new_state[key] = {'mean': mean, 'var': var}
        else:
            new_params[key]['b'] = take(c)
        shape_oihw = (np.asarray(p['w']).shape[3], np.asarray(p['w']).shape[2],
                      np.asarray(p['w']).shape[0], np.asarray(p['w']).shape[1])
        w = take(int(np.prod(shape_oihw))).reshape(shape_oihw)
        new_params[key]['w'] = w.transpose(2, 3, 1, 0)
    return new_params, new_state


def partial_checkpoint(weight_path: str, save_path: str, layers: int):
    """Keep only graph nodes with index <= layers (reference
    convert.py:71-79) — a backbone-transfer artifact."""
    from pqdet_tpu.train.checkpoint import load_checkpoint, save_checkpoint
    ckpt = load_checkpoint(weight_path)
    keep_p = {k: v for k, v in ckpt['params'].items() if int(k) <= layers}
    keep_s = {k: v for k, v in ckpt['state'].items()
              if k != 'quant' and int(k) <= layers}
    save_checkpoint(save_path, keep_p, keep_s, step=0,
                    cfg_text=ckpt.get('cfg', ''))
