"""Model factory: build a network + weights from config / checkpoint.

Mirrors the reference build_model state machine (tools.py:158-243):
normal -> (fuse + fake-quant QAT) -> quantized, driven by the checkpoint's
'type' field and the qat/quantized flags. A checkpoint with no cfg path
rebuilds its architecture from the embedded cfg text.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax

from pqdet_tpu.model.network import DetectionNetwork, fuse_params
from pqdet_tpu.train.checkpoint import (load_backbone_into, load_checkpoint,
                                        load_weights_into)


def build_detector(cfg_text: Optional[str] = None,
                   weight_path: Optional[str] = None,
                   backbone_path: Optional[str] = None,
                   clear_history: bool = False,
                   qat: bool = False,
                   quantized: bool = False,
                   rng_seed: int = 0):
    """Returns (network, params, state, info dict).

    info holds {step, AP, type, cfg_text} from the checkpoint (step=0 when
    starting fresh or clear_history).
    """
    info: Dict = {'step': 0, 'AP': None, 'type': 'normal'}
    ckpt = None
    if weight_path:
        ckpt = load_checkpoint(weight_path)
        info['step'] = 0 if clear_history else int(ckpt.get('step', 0))
        ap = ckpt.get('AP', -1.0)
        info['AP'] = None if ap is None or ap < 0 else float(ap)
        info['type'] = ckpt.get('type', 'normal')

    if not cfg_text:
        if ckpt is None:
            raise ValueError('need a model cfg or a checkpoint embedding one')
        cfg_text = ckpt['cfg']
    info['cfg_text'] = cfg_text

    if info['type'] == 'quant':
        raise ValueError(
            'quantized checkpoints hold int8 weights; load them with '
            'compress.quantized.load_quantized (the bench/eval CLIs do this '
            'automatically)')

    needs_quant_graph = qat or quantized or info['type'] == 'qat'
    network = DetectionNetwork.from_cfg(cfg_text, quant=needs_quant_graph)
    params, state = network.init(jax.random.PRNGKey(rng_seed))

    if backbone_path:
        params, state = load_backbone_into(params, state,
                                           load_checkpoint(backbone_path))
    if ckpt is not None and info['type'] == 'normal':
        params, state = load_weights_into(params, state, ckpt)

    if needs_quant_graph:
        from pqdet_tpu.compress.qat import prepare_qat_state
        params, state = prepare_qat_state(network, params, state)
        if ckpt is not None and info['type'] == 'qat':
            params, state = load_weights_into(params, state, ckpt)

    return network, params, state, info


def inference_params(network: DetectionNetwork, params, state,
                     dtype=None, densify_groups: bool = True) -> Dict:
    """BN-folded (and optionally downcast) params for the inference path,
    staged on device (checkpoint loads hand back host numpy arrays, which
    a jitted forward would otherwise re-upload on every call). Grouped
    convs are densified to block-diagonal MXU-friendly weights
    (network.densify_grouped_convs) unless densify_groups=False."""
    import jax.numpy as jnp
    from pqdet_tpu.model.network import densify_grouped_convs
    fused = fuse_params(network, jax.tree.map(jnp.asarray, params),
                        jax.tree.map(jnp.asarray, state))
    if densify_groups:
        fused = densify_grouped_convs(network, fused)
    if dtype is not None:
        fused = jax.tree.map(lambda x: x.astype(dtype), fused)
    return fused
