"""Convert reference (PyTorch PQDet) checkpoints into pqdet_tpu format.

The migration path for users of the torch reference: its checkpoints are
``{step, AP, model: state_dict, cfg, type, backend}`` (trainer.py:194-202)
with module-list-indexed keys like ``module_list.12.conv.weight`` (and an
optional DataParallel ``module.`` prefix). Conv weights convert
OIHW -> HWIO; BN splits into params (gamma/beta) and state (mean/var).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def convert_torch_state_dict(state_dict: Dict, network) -> Tuple[Dict, Dict]:
    """torch state_dict (tensor or ndarray values) -> (params, state)."""
    flat = {}
    for key, val in state_dict.items():
        if key.startswith('module.'):
            key = key[len('module.'):]
        arr = val.detach().cpu().numpy() if hasattr(val, 'detach') else np.asarray(val)
        flat[key] = arr

    params: Dict[str, dict] = {}
    state: Dict[str, dict] = {}
    for node in network.graph.nodes:
        i = str(node.index)
        base = f'module_list.{node.index}'
        if node.kind == 'convolutional':
            w = flat[f'{base}.conv.weight']          # OIHW
            p = {'w': np.ascontiguousarray(w.transpose(2, 3, 1, 0))}
            if node.has_bn:
                p['bn'] = {'gamma': flat[f'{base}.bn.weight'],
                           'beta': flat[f'{base}.bn.bias']}
                state[i] = {'mean': flat[f'{base}.bn.running_mean'],
                            'var': flat[f'{base}.bn.running_var']}
            else:
                p['b'] = flat[f'{base}.conv.bias']
            params[i] = p
        elif node.kind == 'fc':
            params[i] = {'w': np.ascontiguousarray(flat[f'{base}.fc.weight'].T),
                         'b': flat[f'{base}.fc.bias']}
    return params, state


def convert_to_torch_state_dict(params: Dict, state: Dict, network) -> Dict:
    """(params, state) -> reference torch state_dict (numpy values).

    The inverse of convert_torch_state_dict: HWIO -> OIHW conv weights,
    gamma/beta + running stats -> bn entries, fc transposed back. Used by
    the differential evaluation harness (cli/diffeval.py) to run OUR
    trained weights through the actual torch reference's eval pipeline.
    Values are numpy; wrap with torch.from_numpy for load_state_dict.
    """
    flat: Dict[str, np.ndarray] = {}
    for node in network.graph.nodes:
        i = str(node.index)
        base = f'module_list.{node.index}'
        p = params.get(i)
        if p is None:
            continue
        if node.kind == 'convolutional':
            w = np.asarray(p['w'])                    # HWIO
            flat[f'{base}.conv.weight'] = \
                np.ascontiguousarray(w.transpose(3, 2, 0, 1))
            if node.has_bn:
                flat[f'{base}.bn.weight'] = np.asarray(p['bn']['gamma'])
                flat[f'{base}.bn.bias'] = np.asarray(p['bn']['beta'])
                flat[f'{base}.bn.running_mean'] = np.asarray(state[i]['mean'])
                flat[f'{base}.bn.running_var'] = np.asarray(state[i]['var'])
                flat[f'{base}.bn.num_batches_tracked'] = np.asarray(0)
            else:
                flat[f'{base}.conv.bias'] = np.asarray(p['b'])
        elif node.kind == 'fc':
            flat[f'{base}.fc.weight'] = \
                np.ascontiguousarray(np.asarray(p['w']).T)
            flat[f'{base}.fc.bias'] = np.asarray(p['b'])
    return flat


def convert_torch_checkpoint(torch_path: str, save_path: str):
    """Load a reference .pt checkpoint (requires torch) and save a
    pqdet_tpu checkpoint preserving step/AP/cfg-text."""
    import torch
    from pqdet_tpu.model.network import DetectionNetwork
    from pqdet_tpu.train.checkpoint import save_checkpoint

    blob = torch.load(torch_path, map_location='cpu', weights_only=False)
    cfg_text = blob['cfg']
    network = DetectionNetwork.from_cfg(cfg_text)
    params, state = convert_torch_state_dict(blob['model'], network)
    ap = blob.get('AP')
    ap_val = float(ap.AP) if hasattr(ap, 'AP') else None
    save_checkpoint(save_path, params, state, step=int(blob.get('step', 0)),
                    cfg_text=cfg_text, ap=ap_val,
                    ckpt_type=blob.get('type', 'normal'))
    return save_path
