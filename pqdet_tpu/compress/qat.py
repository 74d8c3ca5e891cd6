"""Quantisation-aware training: fake-quant int8 (TPU-native analogue of
torch.quantization QAT, reference tools.py:256-304).

Scheme:
- weights: per-output-channel symmetric int8, quantised at use time
- activations: per-tensor affine uint8 with moving-average min/max
  observers stored in the state pytree (observer updates follow the
  reference schedule: disable_observer_after / freeze_bn_after epochs,
  trainer.py:297-303)
- the quant graph forces plain relu activations (Graph(quant=True)), so
  activation ranges are non-negative like the reference's ReLU-only QAT
  graphs (model/parser.py:408-409)

Fake-quant uses a straight-through estimator: rounding is invisible to the
gradient.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

ACT_QMIN, ACT_QMAX = 0, 255       # uint8 activations
W_QMIN, W_QMAX = -127, 127        # symmetric int8 weights
OBSERVER_MOMENTUM = 0.01          # torch MovingAverageMinMaxObserver default


def _ste_round(x):
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def fake_quant_weight(w: jnp.ndarray) -> jnp.ndarray:
    """Per-output-channel symmetric fake-quant (last axis = out channels)."""
    axes = tuple(range(w.ndim - 1))
    absmax = jnp.max(jnp.abs(w), axis=axes, keepdims=True)
    # observer-derived scales are buffers, not differentiable params
    scale = jax.lax.stop_gradient(jnp.maximum(absmax / W_QMAX, 1e-8))
    q = jnp.clip(_ste_round(w / scale), W_QMIN, W_QMAX)
    return q * scale


def observe(obs: Dict, x: jnp.ndarray, enabled: bool) -> Dict:
    """Moving-average min/max observer update (pure)."""
    if not enabled:
        return obs
    x32 = jax.lax.stop_gradient(x.astype(jnp.float32))
    mn, mx = jnp.min(x32), jnp.max(x32)
    m = OBSERVER_MOMENTUM
    init = obs['initialized']
    new_min = jnp.where(init, (1 - m) * obs['min'] + m * mn, mn)
    new_max = jnp.where(init, (1 - m) * obs['max'] + m * mx, mx)
    return {'min': new_min, 'max': new_max,
            'initialized': jnp.ones_like(init)}


def act_qparams(obs: Dict) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(scale, zero_point) for affine uint8 activation quantisation."""
    mn = jnp.minimum(obs['min'], 0.0)
    mx = jnp.maximum(obs['max'], 0.0)
    scale = jnp.maximum((mx - mn) / (ACT_QMAX - ACT_QMIN), 1e-8)
    zp = jnp.clip(jnp.round(ACT_QMIN - mn / scale), ACT_QMIN, ACT_QMAX)
    return scale, zp


def fake_quant_act(x: jnp.ndarray, obs: Dict) -> jnp.ndarray:
    scale, zp = act_qparams(obs)
    q = jnp.clip(_ste_round(x / scale + zp), ACT_QMIN, ACT_QMAX)
    return (q - zp) * scale


def _new_observer():
    return {'min': jnp.zeros(()), 'max': jnp.zeros(()),
            'initialized': jnp.zeros((), jnp.bool_)}


# graph node kinds that produce a quantised activation (the torch analogues
# carry FloatFunctional / fused-module output observers)
QUANT_OUTPUT_KINDS = ('convolutional', 'shortcut', 'scale_channels', 'route',
                      'maxpool', 'avgpool', 'upsample', 'fc')


def prepare_qat_state(network, params, state):
    """Add activation observers for every quantised edge: network input +
    each quantisable node output (except those feeding a yolo head, which
    dequantise first like the reference DeQuantStub,
    model/interpreter.py:52-53)."""
    quant = {'input': _new_observer()}
    yolo_feeders = {n.index - 1 for n in network.graph.nodes if n.kind == 'yolo'}
    for node in network.graph.nodes:
        if node.kind in QUANT_OUTPUT_KINDS and node.index not in yolo_feeders:
            quant[str(node.index)] = _new_observer()
    new_state = dict(state)
    new_state['quant'] = quant
    return params, new_state


class QuantCtx:
    """Hooks threaded through Network.apply in QAT mode.

    ``observing``: update observers this step (disabled after
    quant.disable_observer_after epochs). Collects new observer states in
    ``self.new_obs`` — the caller merges them back into the state pytree.
    """

    def __init__(self, quant_state: Dict, observing: bool = True):
        self.quant_state = quant_state
        self.observing = observing
        self.new_obs = dict(quant_state)

    def quantize_input(self, x):
        return self._fq('input', x)

    def fake_weights(self, node_id: str, w):
        return fake_quant_weight(w)

    def observe_output(self, node_id: str, x):
        return self._fq(node_id, x)

    def _fq(self, key: str, x):
        if key not in self.quant_state:
            return x
        obs = self.quant_state[key]
        if self.observing:
            obs = observe(obs, x, True)
            self.new_obs[key] = obs
        return fake_quant_act(x, obs)
