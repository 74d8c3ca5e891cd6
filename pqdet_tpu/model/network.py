"""Network = compiled Graph + pure init/apply functions.

The reference walks an ``nn.ModuleList`` at runtime and caches every output
(model/interpreter.py:38-65). Here the walk happens once at trace time: the
Python loop below unrolls into a static XLA graph, cached activations are
dropped as soon as their last consumer has run (graph liveness), and the whole
thing jits into a single fused program.

Params and BN statistics are plain pytrees: ``params[str(i)]`` /
``state[str(i)]`` for graph node ``i``. A conv node whose params contain no
``'bn'`` entry is treated as BN-folded (fused inference form).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pqdet_tpu.model import layers as L
from pqdet_tpu.model.decode import decode
from pqdet_tpu.model.graph import Graph, solve_padding
from pqdet_tpu.model.loss import loss_per_scale, sum_scale_losses

# stride -> (grid-label index, raw-box index) in the 6-tuple target
# (reference _TARGET_MAP, model/interpreter.py:16-20)
TARGET_MAP = {8: (0, 3), 16: (1, 4), 32: (2, 5)}


class Network:
    """Graph executor with pure functional init/apply."""

    def __init__(self, graph: Graph):
        self.graph = graph

    @classmethod
    def from_cfg(cls, cfg, quant: bool = False) -> 'Network':
        return cls(Graph.from_cfg(cfg, quant=quant))

    # ---------------------------------------------------------------- init

    def init(self, rng) -> Tuple[Dict, Dict]:
        params: Dict[str, dict] = {}
        state: Dict[str, dict] = {}
        for node in self.graph.nodes:
            if node.kind == 'convolutional':
                rng, key = jax.random.split(rng)
                a = node.attrs
                p = L.init_conv(key, node.in_channels, a['filters'], a['size'],
                                groups=a['groups'], bias=not node.has_bn)
                if node.has_bn:
                    bn_p, bn_s = L.init_bn(a['filters'])
                    p['bn'] = bn_p
                    state[str(node.index)] = bn_s
                params[str(node.index)] = p
            elif node.kind == 'fc':
                rng, key = jax.random.split(rng)
                a = node.attrs
                params[str(node.index)] = L.init_linear(key, a['input'], a['output'])
        return params, state

    # --------------------------------------------------------------- apply

    def apply(self, params: Dict, state: Dict, x: jnp.ndarray,
              targets: Optional[tuple] = None, train: bool = False,
              rng=None, compute_dtype=None, quant_ctx=None,
              pallas_decode: bool = False, remat_segments: int = 0,
              dense_groups: bool = True, fused_ir: Optional[Dict] = None,
              tap=None, s2d_stem: int = 0):
        """Run the graph. Returns (outputs, new_state).

        ``s2d_stem`` (r > 0): space-to-depth the input by r before the
        stem conv and run the stem with trace-time-folded weights
        (ops/space_to_depth.py) — function-preserving; kills the
        narrow-channel lane-padded stem read the roofline identified.
        Requires the graph's first node to be a foldable stem
        (3-channel, stride == r, ungrouped); incompatible with QAT
        (the stem observer would see folded weights).

        ``outputs`` is the list of yolo-head results (decoded preds in
        inference, per-scale loss tuples when ``targets`` is given), or the
        final activation when the graph has no yolo heads (classifier).

        ``quant_ctx`` (compress.qat.QuantCtx): fake-quant hooks for QAT —
        input quantisation, per-channel weight fake-quant, and activation
        observers on quantised edges (the torch QuantStub/FloatFunctional
        analogue, reference model/interpreter.py:27-53).

        ``remat_segments`` > 1 splits the walk into that many
        jax.checkpoint segments: only segment-BOUNDARY activations (the
        running tensor + live skip-connection cache) are stored for the
        backward pass; everything inside a segment is recomputed. This is
        the memory lever for large batch/input training — wrapping the
        WHOLE forward in jax.checkpoint (segments == 1) measurably
        reduces the max batch instead (the backward re-materialises every
        activation at once), so use several segments. Incompatible with
        quant_ctx (its observer side-channel would capture inner-trace
        values).
        """
        if s2d_stem:
            from pqdet_tpu.ops.space_to_depth import stem_foldable
            if quant_ctx is not None:
                raise ValueError('s2d_stem is incompatible with QAT '
                                 '(stem observers would see folded weights)')
            if not stem_foldable(self.graph.nodes[0]) \
                    or self.graph.nodes[0].attrs['stride'] != abs(s2d_stem):
                raise ValueError(
                    f's2d_stem={s2d_stem} needs a 3-channel ungrouped '
                    f'stride-{abs(s2d_stem)} stem conv as node 0')
        if remat_segments > 1:
            if quant_ctx is not None:
                raise ValueError('remat_segments is incompatible with QAT '
                                 'observation (quant_ctx)')
            bounds = np.linspace(0, len(self.graph.nodes),
                                 remat_segments + 1).astype(int)
            segs = [self.graph.nodes[bounds[k]:bounds[k + 1]]
                    for k in range(remat_segments)]
            new_state = dict(state)
            outputs = []
            cache: Dict[int, jnp.ndarray] = {}
            for nodes in segs:
                if not len(nodes):
                    continue
                seg = functools.partial(
                    self._walk, nodes, params, state, targets=targets,
                    train=train, compute_dtype=compute_dtype,
                    quant_ctx=None, pallas_decode=pallas_decode,
                    dense_groups=dense_groups, s2d_stem=s2d_stem)
                x, cache, updates, outs, rng = jax.checkpoint(seg)(
                    x, cache, rng)
                new_state.update(updates)
                outputs += outs
            if not outputs:
                return x, new_state
            return outputs, new_state

        if quant_ctx is not None:
            x = quant_ctx.quantize_input(x)
        new_state = dict(state)
        x, _, updates, outputs, _ = self._walk(
            self.graph.nodes, params, state, x, {}, rng, targets=targets,
            train=train, compute_dtype=compute_dtype, quant_ctx=quant_ctx,
            pallas_decode=pallas_decode, dense_groups=dense_groups,
            fused_ir=fused_ir, tap=tap, s2d_stem=s2d_stem)
        new_state.update(updates)
        if not outputs:
            return x, new_state
        return outputs, new_state

    def _walk(self, nodes, params: Dict, state: Dict, x, cache: Dict,
              rng, targets=None, train: bool = False, compute_dtype=None,
              quant_ctx=None, pallas_decode: bool = False,
              dense_groups: bool = True, fused_ir: Optional[Dict] = None,
              tap=None, s2d_stem: int = 0):
        """Run a contiguous span of graph nodes. Returns
        (x, live cache, state updates, head outputs, rng) — a pure pytree
        signature so spans can be wrapped in jax.checkpoint.

        ``fused_ir`` (inference only; from ops.pallas_fused.prepare_fused_ir
        on BN-fused params): {start_index: fused-block entry} — the walk
        replaces each [1x1 expand]->[dw3x3]->[1x1 project] chain with ONE
        Pallas kernel whose expanded activation never touches HBM, then
        skips the constituent nodes."""
        cache = dict(cache)
        new_state: Dict[str, dict] = {}
        outputs = []
        last_use = self.graph.last_use
        skip = set()

        for node in nodes:
            i = node.index
            kind = node.kind
            if i in skip:
                continue
            if fused_ir is not None and i in fused_ir \
                    and quant_ctx is None and not train:
                from pqdet_tpu.ops.pallas_fused import fused_ir_conv
                f = fused_ir[i]
                x = fused_ir_conv(
                    x, f['we'], f['be'], f['wdw'], f['bdw'], f['wp'],
                    f['bp'], act_e=f['act_e'], act_dw=f['act_dw'],
                    act_p=f['act_p'],
                    interpret=f.get('interpret', False))[..., :f['cout']]
                if compute_dtype is not None and x.dtype != compute_dtype:
                    x = x.astype(compute_dtype)
                skip.update(f['skip'])
                end = f['end']
                if end in last_use:
                    cache[end] = x
                for j in [j for j in cache
                          if last_use.get(j, -1) <= end and j != end]:
                    del cache[j]
                continue
            p = params.get(str(i))
            if kind == 'convolutional':
                a = node.attrs
                padding = solve_padding(a['size'], a['padding'], a['pad'])
                stride = a['stride']
                w = p['w'] if quant_ctx is None else quant_ctx.fake_weights(str(i), p['w'])
                if s2d_stem and i == 0:
                    # space-to-depth ingest: fold the stem onto the
                    # (H/r, W/r, 3 r^2) tensor (ops/space_to_depth.py).
                    # A negative s2d_stem means the CALLER already ships
                    # the input in s2d(|r|) layout (host-side reshape:
                    # the device transpose is itself a narrow-channel op)
                    from pqdet_tpu.ops.space_to_depth import (
                        fold_stem_weight_j, space_to_depth)
                    r = abs(s2d_stem)
                    if s2d_stem > 0:
                        x = space_to_depth(x, r)
                    w, ph, pw = fold_stem_weight_j(w, r, stride, padding)
                    stride, padding = 1, (ph, pw)
                x = L.conv2d(x, w, p.get('b'), stride=stride,
                             padding=padding, groups=a['groups'],
                             compute_dtype=compute_dtype,
                             dense_groups=dense_groups)
                if 'bn' in p:
                    x, bn_s = L.batch_norm(x, p['bn'], state[str(i)], train)
                    if train:
                        new_state[str(i)] = bn_s
                x = L.apply_activation(a['activation'], x)
            elif kind == 'fc':
                x = L.linear(x.reshape(x.shape[0], -1), p)
                x = L.apply_activation(node.attrs['activation'], x)
            elif kind == 'shortcut':
                x = x + cache[node.refs[0]]
                x = L.apply_activation(node.attrs['activation'], x)
            elif kind == 'scale_channels':
                x = cache[node.refs[0]] * x
            elif kind == 'route':
                srcs = [cache[r] for r in node.refs]
                x = srcs[0] if len(srcs) == 1 else jnp.concatenate(srcs, axis=-1)
            elif kind == 'maxpool':
                a = node.attrs
                padding = solve_padding(a['size'], a['padding'], a['pad'])
                x = L.max_pool(x, a['size'], a['stride'], padding)
            elif kind == 'avgpool':
                x = L.adaptive_avg_pool(x, *node.out_size)
            elif kind == 'upsample':
                x = L.upsample_nearest(x, node.attrs['stride'])
            elif kind == 'yolo':
                a = node.attrs
                if pallas_decode and targets is None \
                        and not a.get('exp_cap', 0.0):
                    # fused Pallas decode kernel (inference only: the
                    # kernel has no autodiff rule; bare-exp graphs only)
                    from pqdet_tpu.ops.pallas_decode import decode_pallas
                    pred = decode_pallas(x, a['classes'], a['stride'])
                else:
                    pred = decode(x, a['classes'], a['stride'],
                                  exp_cap=a.get('exp_cap', 0.0))
                if targets is None:
                    x = pred
                else:
                    gi, bi = TARGET_MAP[a['stride']]
                    # optional evolved loss hypers live in the yolo attrs
                    extra = {k: a[k] for k in
                             ('bbox_loss_gain', 'conf_loss_gain',
                              'cls_loss_gain', 'conf_loss_alpha',
                              'cls_loss_alpha', 'conf_loss_beta',
                              'cls_loss_beta') if k in a}
                    x = loss_per_scale(
                        pred, targets[gi], targets[bi],
                        stride=a['stride'], num_classes=a['classes'],
                        bbox_loss_type=a['bbox_loss'],
                        ignore_thresh=a['ignore_thresh'],
                        l1_loss_gain=a['l1_loss_gain'], **extra)
                outputs.append(x)
            elif kind == 'dropout':
                if rng is not None:
                    rng, key = jax.random.split(rng)
                else:
                    key = None
                x = L.dropout(x, node.attrs['probability'], key, train)
            else:
                raise ValueError(f'unknown layer kind: {kind}')

            if quant_ctx is not None and kind != 'yolo':
                x = quant_ctx.observe_output(str(i), x)

            # keep inter-layer activations in the compute dtype: conv
            # accumulation is fp32 (preferred_element_type) but carrying
            # fp32 between layers would double HBM traffic
            if compute_dtype is not None and kind != 'yolo' \
                    and x.dtype != compute_dtype:
                x = x.astype(compute_dtype)

            # trace-time observation hook: tap(node_index, activation) —
            # used by the train step's divergence probe (head magnitudes)
            if tap is not None and kind != 'yolo':
                tap(i, x)

            if i in last_use:
                cache[i] = x
            # free activations whose consumers have all run
            for j in [j for j in cache if last_use.get(j, -1) <= i and j != i]:
                del cache[j]

        return x, cache, new_state, outputs, rng


class DetectionNetwork(Network):
    """Detection graph: concat decoded heads for inference, sum losses for
    training (reference DetectionModel, model/interpreter.py:67-85)."""

    @property
    def num_classes(self) -> int:
        return self.graph.yolo_nodes[0].attrs['classes']

    def apply(self, params, state, x, targets=None, train=False, rng=None,
              compute_dtype=None, quant_ctx=None, pallas_decode=False,
              remat_segments=0, dense_groups=True, fused_ir=None, tap=None,
              s2d_stem=0):
        outputs, new_state = super().apply(
            params, state, x, targets=targets, train=train, rng=rng,
            compute_dtype=compute_dtype, quant_ctx=quant_ctx,
            pallas_decode=pallas_decode, remat_segments=remat_segments,
            dense_groups=dense_groups, fused_ir=fused_ir, tap=tap,
            s2d_stem=s2d_stem)
        if targets is None:
            flat = [o.reshape(o.shape[0], -1, o.shape[-1]) for o in outputs]
            return jnp.concatenate(flat, axis=1), new_state
        return sum_scale_losses(outputs), new_state

    def infer_fn(self, compute_dtype=None):
        """A jittable (params, state, images) -> (B, sum HWA, 5+C) closure."""
        def fn(params, state, images):
            preds, _ = self.apply(params, state, images,
                                  compute_dtype=compute_dtype)
            return preds
        return fn


class ClassifierNetwork(Network):
    pass


def densify_grouped_convs(network: Network, fused: Dict,
                          min_group_width: int = 2) -> Dict:
    """Expand grouped-conv weights to block-diagonal DENSE (kh, kw, Cin,
    Cout) tensors for inference.

    TPU-first trade: grouped convs with group width 8-64 (RegNets) run the
    MXU at a few percent utilisation under feature_group_count — measured
    regnety-400m-fpn at ~0.7 TFLOP/s. A dense conv whose weights are zero
    outside the group blocks computes the identical function at full MXU
    throughput; the extra FLOPs are idle-array cycles. layers.conv2d
    detects the dense shape and drops feature_group_count. Depthwise convs
    (group width < min_group_width) stay grouped — their dense expansion is
    C x waste and XLA's depthwise path is bandwidth-bound anyway.
    """
    out = dict(fused)
    for node in network.graph.nodes:
        key = str(node.index)
        if node.kind != 'convolutional' or key not in fused:
            continue
        g = node.attrs['groups']
        p = fused[key]
        w = np.asarray(p['w'])
        kh, kw, cin_g, cout = w.shape
        if g <= 1 or cin_g < min_group_width:
            continue
        dense = np.zeros((kh, kw, cin_g * g, cout), w.dtype)
        cpg_out = cout // g
        for gi in range(g):
            dense[:, :, gi * cin_g:(gi + 1) * cin_g,
                  gi * cpg_out:(gi + 1) * cpg_out] = \
                w[..., gi * cpg_out:(gi + 1) * cpg_out]
        out[key] = {**p, 'w': jnp.asarray(dense)}
    return out


def fuse_params(network: Network, params: Dict, state: Dict) -> Dict:
    """Fold every conv's BN into its weights -> inference-only params pytree
    (the apply function detects the missing 'bn' entries)."""
    fused = {}
    for node in network.graph.nodes:
        key = str(node.index)
        if key not in params:
            continue
        p = params[key]
        if node.kind == 'convolutional' and 'bn' in p:
            fused[key] = L.fold_bn_into_conv(p, p['bn'], state[key])
        else:
            fused[key] = p
    return fused
