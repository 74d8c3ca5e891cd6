"""The jitted training step: loss -> grads -> optax update, data-parallel
over a 1-D mesh.

Replaces the reference's DataParallel forward/backward + manual LR writes
(trainer.py:204-242): the learning rate is a pure schedule inside the optax
chain, sparse training's BN-gamma L1 subgradient (trainer.py:236-239) is a
gradient transform, and batch sharding makes XLA insert the gradient
all-reduce over ICI.
"""

from __future__ import annotations

from typing import Callable, Optional, Set

import jax
import jax.numpy as jnp
import optax

from pqdet_tpu.model.network import DetectionNetwork
from pqdet_tpu.ops.preprocess import device_normalize
from pqdet_tpu.parallel.mesh import DATA_AXIS


def sparse_bn_gamma_ids(network) -> Set[str]:
    """Graph node ids whose BN gamma receives the L1 sparsity subgradient —
    conv+BN layers not protected by `_notprune` (reference
    tools.get_bn_layers, tools.py:316-333)."""
    ids = set()
    for node in network.graph.nodes:
        if node.kind == 'convolutional' and node.has_bn and not node.notprune:
            ids.add(str(node.index))
    return ids


def add_sparse_l1(grads, params, sparse_ids: Set[str], ratio: float):
    """grad(gamma) += ratio * sign(gamma) for the selected BN layers."""
    out = {}
    for key, g in grads.items():
        if key in sparse_ids and 'bn' in g:
            bn_g = dict(g['bn'])
            bn_g['gamma'] = bn_g['gamma'] + ratio * jnp.sign(params[key]['bn']['gamma'])
            g = {**g, 'bn': bn_g}
        out[key] = g
    return out


def make_optimizer(schedule: Callable, weight_decay: float = 0.0,
                   grad_clip: float = 0.0):
    """Adam with torch-default betas/eps and optional L2 (reference
    trainer.py:160-163 uses optim.Adam(weight_decay=...), which is L2
    regularisation added to the gradient, not decoupled AdamW).

    The transform runs FLATTENED (optax.flatten): per-leaf Adam updates
    on a detection net are hundreds of tiny oddly-tiled fusions — a
    bs=32 mobilenetv2-fpn train-step trace showed 7.0 ms/step across
    1264 multiply_add fusions, with single (3,3,1,32) depthwise-weight
    updates costing 2.2 ms (serial scalar-core code on T(1,128) tiles).
    One ravel + one fused elementwise Adam over the ~7M-param vector is
    bandwidth-optimal instead. Update semantics are identical per leaf
    (elementwise transform), so checkpoints/schedules are unaffected;
    only the in-jit opt_state layout changes (never persisted)."""
    txs = []
    if grad_clip:
        # global-norm clip (train.grad_clip, opt-in): the norm of the
        # flattened vector equals the tree-wide global norm, so clipping
        # inside optax.flatten is semantics-identical to clipping the tree
        txs.append(optax.clip_by_global_norm(grad_clip))
    if weight_decay:
        txs.append(optax.add_decayed_weights(weight_decay))
    txs.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    txs.append(optax.scale_by_learning_rate(schedule))
    return optax.flatten(optax.chain(*txs))


def resume_schedule_step(opt_state, step: int):
    """Fast-forward the LR schedule counter after a checkpoint resume.

    optax's scale_by_learning_rate counts updates from 0 in its own state,
    so a resumed run would otherwise replay warmup+cosine from the top
    (the reference computes LR from global_step, trainer.py:225). Adam's
    bias-correction count is left at 0 on purpose — moments start fresh.
    """
    import jax.numpy as jnp

    def fix(s):
        if isinstance(s, optax.ScaleByScheduleState):
            return optax.ScaleByScheduleState(count=jnp.asarray(step, jnp.int32))
        if isinstance(s, tuple) and not hasattr(s, '_fields'):
            return tuple(fix(x) for x in s)
        return s

    return fix(opt_state)


def make_train_step(network: DetectionNetwork, optimizer,
                    sparse_ratio: float = 0.0,
                    sparse_ids: Optional[Set[str]] = None,
                    compute_dtype=None, remat: int = 0,
                    dense_groups: bool = True, label_fn=None,
                    augment_fn=None, probe_heads: bool = False,
                    s2d_stem: int = 0):
    """Build the pure (params, state, opt_state, batch, rng) -> ... step.

    batch: dict with 'image' (B,H,W,3) and either 'targets' = 6-tuple of
    per-scale grid labels + padded raw boxes (host label assignment) or
    'gt' = (B, max_gt, 6) padded raw GT boxes, which ``label_fn``
    (ops/labels.py label_assigner_from_config) expands to the same grids
    ON DEVICE inside the step. jit it with shardings from parallel.mesh
    (batch sharded on DATA_AXIS, everything else replicated).

    ``remat`` (int, train.remat in config): activation rematerialisation
    for the backward pass. N >= 2 splits the graph walk into N
    jax.checkpoint segments — only segment-boundary activations are
    stored, segment internals recompute during backward (~1/(N) of the
    activation footprint for ~1 extra forward of FLOPs) — lifts the max
    single-chip batch/input size. remat == 1 wraps the WHOLE forward in
    one jax.checkpoint; measured on v5e this REDUCES the max batch
    (the backward re-materialises every activation at once) — kept only
    for comparison.
    ``probe_heads`` (train.head_probe): adds a 'head_max' metric — the
    max |activation| of each yolo head's INPUT conv, per scale. Three
    tiny max-reduces per step; on a NaN the trainer prints the interval's
    head_max history so a divergence names WHICH head overflowed first
    (round-4 NAS sweep: clip-resistant forward NaNs correlated with deep
    sampled heads, diagnosed only by correlation; decode's exp overflows
    past raw ~88.7 — see model/decode.py exp_cap).
    """
    remat_n = int(remat)
    head_in = tuple(n.index - 1 for n in network.graph.yolo_nodes) \
        if probe_heads else ()

    def fwd(params, state, image, targets, rng):
        stats = {}
        tap = None
        if head_in:
            def tap(i, t):
                if i in head_in:
                    stats[i] = jnp.max(jnp.abs(t.astype(jnp.float32)))
        losses, new_state = network.apply(
            params, state, image, targets=targets,
            train=True, rng=rng, compute_dtype=compute_dtype,
            remat_segments=remat_n if remat_n > 1 else 0,
            dense_groups=dense_groups, tap=tap, s2d_stem=s2d_stem)
        return losses['loss'][0], (losses, new_state, stats)

    if remat_n == 1:
        fwd = jax.checkpoint(fwd)

    def loss_fn(params, state, batch, rng):
        if augment_fn is not None and 'gt' in batch:
            # on-device augmentation (ops/augment_device.py): transforms
            # the uint8 batch + GT boxes before normalize/label-assign
            arng, rng = jax.random.split(rng)
            if 'partner_image' in batch:
                # augment.fresh_partners: host-parity independent
                # mosaic/mixup partners gathered from the HBM corpus
                raw, gt = augment_fn(batch['image'], batch['gt'], arng,
                                     batch['partner_image'],
                                     batch['partner_gt'])
            else:
                raw, gt = augment_fn(batch['image'], batch['gt'], arng)
            image = device_normalize(raw)
            targets = label_fn(gt, image.shape[1:3])
            return fwd(params, state, image, targets, rng)
        # uint8 batches normalize on device (ops/preprocess.py); float
        # batches were normalized on host and pass through
        image = device_normalize(batch['image'])
        if 'targets' in batch:
            targets = batch['targets']
        else:  # device-side label assignment from the padded GT boxes
            targets = label_fn(batch['gt'], image.shape[1:3])
        return fwd(params, state, image, targets, rng)

    def train_step(params, state, opt_state, batch, rng):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (losses, new_state, stats)), grads = \
            grad_fn(params, state, batch, rng)
        if sparse_ratio and sparse_ids:
            grads = add_sparse_l1(grads, params, sparse_ids, sparse_ratio)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = {
            'loss': losses['loss'][0],
            'giou_loss': losses['giou_loss'][0],
            'conf_loss': losses['conf_loss'][0],
            'class_loss': losses['class_loss'][0],
            'loss_per_branch': jnp.stack([l[0] for l in losses['loss_per_branch']]),
        }
        if head_in:
            metrics['head_max'] = jnp.stack([stats[i] for i in head_in])
        return params, new_state, opt_state, metrics

    return train_step


def make_multi_step(train_step, unroll: int):
    """Roll ``unroll`` train steps into one program with lax.scan.

    Amortises per-dispatch overhead when steps are small/fast (tiny models,
    small batches). Measured on v5e with mobilenetv2-fpn bs=16 the step is
    device-bound (~40 ms) and unroll=8 changes nothing — it pays off only
    when dispatch dominates. Batches arrive stacked with a leading (K, ...)
    axis (all K at the same spatial size); metrics come back stacked.
    """
    def multi_step(params, state, opt_state, batches, rngs):
        def body(carry, xs):
            p, s, o = carry
            batch, rng = xs
            p, s, o, metrics = train_step(p, s, o, batch, rng)
            return (p, s, o), metrics
        (params, state, opt_state), metrics = jax.lax.scan(
            body, (params, state, opt_state), (batches, rngs), length=unroll)
        return params, state, opt_state, metrics

    return multi_step


def jit_train_step(train_step, mesh, unroll: int = 1, batch_shardings=None):
    """jit with explicit shardings: batch sharded over the data axis,
    params/state/opt replicated; donates the carried pytrees. With
    unroll > 1 the step must be a make_multi_step and batches carry a
    leading scan axis. ``batch_shardings`` overrides the batch slot with a
    per-leaf pytree (e.g. parallel.mesh.spatial_batch_shardings for a
    ('data', 'space') mesh where images also shard their height axis)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    repl = NamedSharding(mesh, P())
    data = batch_shardings
    if data is None:
        data = NamedSharding(mesh, P(DATA_AXIS) if unroll == 1
                             else P(None, DATA_AXIS))
    return jax.jit(
        train_step,
        in_shardings=(repl, repl, repl, data, repl),
        out_shardings=(repl, repl, repl, repl),
        donate_argnums=(0, 1, 2),
    )
