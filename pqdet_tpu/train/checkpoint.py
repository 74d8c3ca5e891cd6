"""Checkpoint save/load.

Keeps the reference checkpoint contract (trainer.py:187-202,
tools.py:194-209): a single file holding {step, AP, params(+state), the raw
architecture cfg TEXT (so a checkpoint can rebuild its own model when no
cfg path is given), type ('normal'|'qat'|'quant'), backend}. Serialised with
msgpack via flax.serialization instead of torch.save.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def _to_numpy_tree(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, params: Dict, state: Dict, step: int,
                    cfg_text: str, ap: Optional[float] = None,
                    ckpt_type: str = 'normal', backend: str = 'none',
                    extra: Optional[Dict[str, Any]] = None):
    payload = {
        'step': step,
        'AP': -1.0 if ap is None else float(ap),
        'params': _to_numpy_tree(params),
        'state': _to_numpy_tree(state),
        'cfg': cfg_text,
        'type': ckpt_type,
        'backend': backend,
    }
    if extra:
        payload['extra'] = _to_numpy_tree(extra)
    os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
    blob = serialization.msgpack_serialize(payload)
    tmp = path + '.tmp'
    with open(tmp, 'wb') as fw:
        fw.write(blob)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, 'rb') as fr:
        payload = serialization.msgpack_restore(fr.read())
    return payload


def load_weights_into(params: Dict, state: Dict,
                      ckpt: Dict[str, Any]) -> Tuple[Dict, Dict]:
    """Strict-by-structure load: checkpoint pytrees must match the model's
    (the reference's load_weight DataParallel-prefix dance, tools.py:120-136,
    has no analogue here — pytrees have no module prefixes)."""
    def merge(template, loaded, path=''):
        if isinstance(template, dict):
            missing = set(template) - set(loaded)
            extra = set(loaded) - set(template)
            if missing or extra:
                raise ValueError(
                    f'checkpoint mismatch at {path or "/"}: missing {sorted(missing)},'
                    f' unexpected {sorted(extra)}')
            return {k: merge(template[k], loaded[k], f'{path}/{k}')
                    for k in template}
        arr = np.asarray(loaded)
        t_shape = np.shape(template)
        if tuple(arr.shape) != tuple(t_shape):
            raise ValueError(f'shape mismatch at {path}: {arr.shape} vs {t_shape}')
        return arr.astype(np.asarray(template).dtype)

    return merge(params, ckpt['params']), merge(state, ckpt['state'])


def load_backbone_into(params: Dict, state: Dict,
                       ckpt: Dict[str, Any]) -> Tuple[Dict, Dict]:
    """Prefix-subset load for backbone transfer (reference load_backbone,
    tools.py:138-156): every layer present in the checkpoint overwrites the
    model's layer; layers beyond the checkpoint keep their init."""
    new_params = dict(params)
    new_state = dict(state)
    for key, val in ckpt['params'].items():
        if key in new_params:
            tmpl = jax.tree.map(lambda x: x, new_params[key])
            ok = jax.tree.structure(tmpl) == jax.tree.structure(val)
            shapes_match = ok and all(
                np.shape(a) == np.shape(b) for a, b in
                zip(jax.tree.leaves(tmpl), jax.tree.leaves(val)))
            if shapes_match:
                new_params[key] = jax.tree.map(np.asarray, val)
    for key, val in ckpt.get('state', {}).items():
        if key in new_state:
            new_state[key] = jax.tree.map(np.asarray, val)
    return new_params, new_state
