"""Schedules, checkpointing and the sharded train step (8-device CPU mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pqdet_tpu.model.network import DetectionNetwork
from pqdet_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                     pad_batch_to_devices, replicated)
from pqdet_tpu.train.checkpoint import (load_backbone_into, load_checkpoint,
                                        load_weights_into, save_checkpoint)
from pqdet_tpu.train.schedule import cosine_warmup, step_decay_warmup
from pqdet_tpu.train.step import (jit_train_step, make_optimizer,
                                  make_train_step, sparse_bn_gamma_ids)

TINY_CFG = '''
[net]
channels=3
[convolutional]
filters=16
size=3
pad=1
stride=2
batch_normalize=1
activation=relu6
[convolutional]
filters=16
size=3
pad=1
batch_normalize=1
activation=linear
[shortcut]
from=-2
activation=relu
[convolutional]
filters=32
size=3
pad=1
stride=2
batch_normalize=1
activation=leaky
[convolutional]
filters=27
size=1
pad=1
activation=linear
[yolo]
classes=4
[route]
layers=-3
[convolutional]
filters=32
size=3
pad=1
stride=2
batch_normalize=1
activation=relu6
[convolutional]
filters=27
size=1
pad=1
activation=linear
[yolo]
classes=4
[route]
layers=-5
[convolutional]
filters=16
size=3
pad=1
stride=2
batch_normalize=1
activation=relu6
[convolutional]
filters=16
size=3
pad=1
stride=2
batch_normalize=1
activation=relu6
[convolutional]
filters=27
size=1
pad=1
activation=linear
[yolo]
classes=4
'''


def _tiny_net():
    net = DetectionNetwork.from_cfg(TINY_CFG)
    assert sorted(net.graph.output_strides) == [4, 8, 16]
    return net


# the tiny net has strides 4/8/16; remap TARGET_MAP for the test via scaling:
# instead just use input 128 so strides are 4,8,16 — loss lookup uses
# TARGET_MAP keyed on 8/16/32, so build a net with those strides.
TINY_CFG_832 = TINY_CFG.replace('filters=16\nsize=3\npad=1\nstride=2\nbatch_normalize=1\nactivation=relu6\n[convolutional]\nfilters=16\nsize=3\npad=1\nbatch_normalize=1\nactivation=linear',
                                'filters=16\nsize=3\npad=1\nstride=4\nbatch_normalize=1\nactivation=relu6\n[convolutional]\nfilters=16\nsize=3\npad=1\nbatch_normalize=1\nactivation=linear', 1)


def test_cosine_schedule():
    s = cosine_warmup(1e-3, 1e-6, warmup_steps=100, max_steps=1000)
    assert float(s(0)) == 0.0
    assert np.isclose(float(s(50)), 5e-4)
    assert np.isclose(float(s(100)), 1e-3)
    assert np.isclose(float(s(1000)), 1e-6, atol=1e-9)
    # midpoint of cosine
    assert np.isclose(float(s(550)), (1e-3 + 1e-6) / 2, rtol=1e-3)


def test_step_schedule():
    s = step_decay_warmup(1e-3, warmup_steps=10, steps_per_epoch=10,
                          mile_stones=[3, 5], gamma=0.1)
    assert np.isclose(float(s(5)), 5e-4)
    assert np.isclose(float(s(20)), 1e-3)
    assert np.isclose(float(s(35)), 1e-4)
    assert np.isclose(float(s(55)), 1e-5)


def _make_batch(b, hw, nc=4, a=3, n_gt=6, strides=(8, 16, 32), seed=0):
    rng = np.random.RandomState(seed)
    labels, gts = [], []
    for s in strides:
        lab = np.zeros((b, hw // s, hw // s, a, 6 + nc), np.float32)
        lab[..., -1] = 1.0
        labels.append(jnp.asarray(lab))
        gts.append(jnp.zeros((b, n_gt, 4), jnp.float32))
    return {
        'image': jnp.asarray(rng.rand(b, hw, hw, 3), jnp.float32),
        'targets': tuple(labels + gts),
    }


def test_train_step_on_mesh_decreases_loss():
    net = DetectionNetwork.from_cfg(get_mesh_cfg())
    mesh = make_mesh()
    assert mesh.devices.size == 8
    params, state = net.init(jax.random.PRNGKey(0))
    schedule = cosine_warmup(1e-3, 1e-6, 1, 10000)
    opt = make_optimizer(schedule)
    opt_state = opt.init(params)
    step = make_train_step(net, opt, sparse_ratio=0.01,
                           sparse_ids=sparse_bn_gamma_ids(net))
    jstep = jit_train_step(step, mesh)

    batch = _make_batch(8, 64)
    batch = jax.tree.map(lambda x: jax.device_put(x, batch_sharding(mesh)), batch)
    repl = replicated(mesh)
    params, state, opt_state = jax.tree.map(
        lambda x: jax.device_put(x, repl), (params, state, opt_state))

    losses = []
    rngs = jax.random.split(jax.random.PRNGKey(1), 6)
    for i in range(6):
        params, state, opt_state, metrics = jstep(params, state, opt_state,
                                                  batch, rngs[i])
        losses.append(float(metrics['loss']))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
    # branch metrics present
    assert metrics['loss_per_branch'].shape == (3,)


def test_gt_mode_step_matches_targets_mode():
    """The device-label step path ('gt' batches + on-device assignment,
    uint8 images + on-device normalize) must produce the SAME loss as the
    host path ('targets' batches of pre-built grids, host-normalized f32
    images) — the two production pipelines are interchangeable."""
    from pqdet_tpu.data.augment import Normalize
    from pqdet_tpu.data.train_data import assign_labels
    from pqdet_tpu.ops.labels import assign_labels_device  # noqa: F401
    from pqdet_tpu.train.schedule import cosine_warmup

    nc, hw, b, max_gt = 4, 64, 4, 8
    strides = np.array([8, 16, 32])
    anchors = np.array([[10, 13], [16, 30], [33, 23], [30, 61], [62, 45],
                        [59, 119], [116, 90], [156, 198], [373, 326]],
                       np.float32)
    rng = np.random.RandomState(3)
    gt = np.zeros((b, max_gt, 6), np.float32)
    per_image_targets = []
    for i in range(b):
        n = rng.randint(1, max_gt + 1)
        cxy = rng.rand(n, 2) * (hw - 16) + 8
        wh = rng.rand(n, 2) * 24 + 6
        boxes = np.concatenate([cxy - wh / 2, cxy + wh / 2,
                                rng.randint(0, nc, (n, 1)).astype(np.float64),
                                rng.rand(n, 1)], 1).astype(np.float32)
        gt[i, :n] = boxes
        la, pa = assign_labels(boxes, (hw, hw), strides, anchors, nc,
                               max_gt=max_gt)
        per_image_targets.append(tuple(la) + tuple(pa))
    targets = tuple(jnp.asarray(np.stack([t[k] for t in per_image_targets]))
                    for k in range(6))
    img_u8 = rng.randint(0, 256, (b, hw, hw, 3)).astype(np.uint8)
    img_f32, _ = Normalize()(img_u8.copy(), [])

    net = DetectionNetwork.from_cfg(get_mesh_cfg())
    params, state = net.init(jax.random.PRNGKey(0))
    opt = make_optimizer(cosine_warmup(1e-3, 1e-6, 1, 1000))

    def label_fn(g, size):
        return assign_labels_device(g, size, strides, anchors, nc)

    step = make_train_step(net, opt, label_fn=label_fn)
    srng = jax.random.PRNGKey(9)
    _, _, _, m_host = jax.jit(step)(params, state, opt.init(params),
                                    {'image': jnp.asarray(img_f32),
                                     'targets': targets}, srng)
    _, _, _, m_dev = jax.jit(step)(params, state, opt.init(params),
                                   {'image': jnp.asarray(img_u8),
                                    'gt': jnp.asarray(gt)}, srng)
    # label grids are bit-identical (test_device_label_assignment_parity);
    # the image affine differs by 1 ulp because XLA fuses x*scale+bias into
    # an FMA (single rounding) where the host path rounds twice
    np.testing.assert_allclose(float(m_host['loss']), float(m_dev['loss']),
                               rtol=1e-5)


def get_mesh_cfg():
    """Tiny 3-head net whose heads land on strides 8/16/32."""
    from pqdet_tpu.zoo.builder import CfgBuilder
    b = CfgBuilder()
    b.conv(8, size=3, stride=2)
    b.conv(16, size=3, stride=2)
    t8 = b.conv(16, size=3, stride=2)   # stride 8
    t16 = b.conv(24, size=3, stride=2)  # stride 16
    b.conv(32, size=3, stride=2)        # stride 32
    b.conv(27, size=1, bn=False, activation='linear')
    b.yolo(4)
    b.route(t16)
    b.conv(27, size=1, bn=False, activation='linear')
    b.yolo(4)
    b.route(t8)
    b.conv(27, size=1, bn=False, activation='linear')
    b.yolo(4)
    return b.text()


def test_sparse_ids_exclude_notprune():
    net = _tiny_net()
    ids = sparse_bn_gamma_ids(net)
    # convs feeding yolo heads and shortcut members are protected
    for node in net.graph.nodes:
        if node.notprune:
            assert str(node.index) not in ids


def test_checkpoint_roundtrip(tmp_path):
    net = _tiny_net()
    params, state = net.init(jax.random.PRNGKey(0))
    path = str(tmp_path / 'model-1.ckpt')
    save_checkpoint(path, params, state, step=123, cfg_text=TINY_CFG, ap=0.5)
    ckpt = load_checkpoint(path)
    assert ckpt['step'] == 123 and ckpt['type'] == 'normal'
    assert ckpt['cfg'] == TINY_CFG

    # rebuild the model from the embedded cfg text alone
    net2 = DetectionNetwork.from_cfg(ckpt['cfg'])
    params2, state2 = net2.init(jax.random.PRNGKey(1))
    params2, state2 = load_weights_into(params2, state2, ckpt)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_mismatch_raises(tmp_path):
    net = _tiny_net()
    params, state = net.init(jax.random.PRNGKey(0))
    path = str(tmp_path / 'm.ckpt')
    save_checkpoint(path, params, state, step=1, cfg_text=TINY_CFG)
    ckpt = load_checkpoint(path)
    other = DetectionNetwork.from_cfg(get_mesh_cfg())
    p2, s2 = other.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError):
        load_weights_into(p2, s2, ckpt)


def test_backbone_prefix_load(tmp_path):
    """Backbone transfer: shared prefix layers load, rest keep their init."""
    net = _tiny_net()
    params, state = net.init(jax.random.PRNGKey(0))
    path = str(tmp_path / 'bb.ckpt')
    save_checkpoint(path, {'0': params['0'], '1': params['1']},
                    {k: v for k, v in state.items() if k in ('0', '1')},
                    step=0, cfg_text='')
    ckpt = load_checkpoint(path)
    p2, s2 = net.init(jax.random.PRNGKey(42))
    p3, s3 = load_backbone_into(p2, s2, ckpt)
    np.testing.assert_array_equal(np.asarray(p3['0']['w']),
                                  np.asarray(params['0']['w']))
    # non-backbone layer untouched
    np.testing.assert_array_equal(np.asarray(p3['3']['w']),
                                  np.asarray(p2['3']['w']))


def test_pad_batch():
    assert pad_batch_to_devices(12, 8) == 16
    assert pad_batch_to_devices(16, 8) == 16


def test_host_local_batch_to_global():
    """Single-process path of the multi-host batch assembly helper."""
    from pqdet_tpu.parallel.mesh import host_local_batch_to_global
    mesh = make_mesh()
    batch = {'image': np.ones((8, 4, 4, 3), np.float32),
             'targets': (np.zeros((8, 2, 4), np.float32),)}
    out = host_local_batch_to_global(mesh, batch)
    assert out['image'].shape == (8, 4, 4, 3)
    # sharded over the data axis
    assert len(out['image'].sharding.device_set) == 8


def test_multi_step_unroll_equivalence():
    """A scanned 4-step dispatch must land on the same params as 4 single
    dispatches with the same batches/rngs."""
    from pqdet_tpu.train.step import make_multi_step
    net = DetectionNetwork.from_cfg(get_mesh_cfg())
    mesh = make_mesh()
    params, state = net.init(jax.random.PRNGKey(0))
    opt = make_optimizer(cosine_warmup(1e-3, 1e-6, 1, 10000))
    opt_state = opt.init(params)
    step = make_train_step(net, opt)

    batch = _make_batch(8, 64)
    rngs = jax.random.split(jax.random.PRNGKey(1), 4)
    # host copies: the jitted steps donate their carried pytrees
    host = jax.device_get((params, state, opt_state))

    # single-step path
    jstep = jit_train_step(step, mesh)
    repl = replicated(mesh)
    p1, s1, o1 = jax.tree.map(lambda x: jax.device_put(x, repl), host)
    b1 = jax.tree.map(lambda x: jax.device_put(x, batch_sharding(mesh)), batch)
    metrics_single = []
    for i in range(4):
        p1, s1, o1, m = jstep(p1, s1, o1, b1, rngs[i])
        metrics_single.append(float(m['loss']))

    # scanned path: same batch repeated on the leading axis
    from jax.sharding import NamedSharding, PartitionSpec as P
    jmulti = jit_train_step(make_multi_step(step, 4), mesh, unroll=4)
    p2, s2, o2 = jax.tree.map(lambda x: jax.device_put(x, repl), host)
    stacked = jax.tree.map(lambda x: jnp.stack([x] * 4), batch)
    stacked = jax.tree.map(lambda x: jax.device_put(
        x, NamedSharding(mesh, P(None, 'data'))), stacked)
    p2, s2, o2, m = jmulti(p2, s2, o2, stacked, rngs)
    np.testing.assert_allclose(np.asarray(m['loss']).reshape(-1),
                               metrics_single, rtol=2e-4)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_remat_step_matches_plain():
    """remat=1 (whole-forward jax.checkpoint) and remat=4 (segmented graph
    walk) must be numerically identical to the plain step: same loss and
    same updated params."""
    net = DetectionNetwork.from_cfg(get_mesh_cfg())
    mesh = make_mesh()
    params, state = net.init(jax.random.PRNGKey(0))
    opt = make_optimizer(cosine_warmup(1e-3, 1e-6, 1, 10000))
    opt_state = opt.init(params)
    batch = _make_batch(8, 64)
    host = jax.device_get((params, state, opt_state))
    rng = jax.random.PRNGKey(3)

    results = []
    for remat in (0, 1, 4):
        step = make_train_step(net, opt, remat=remat)
        jstep = jit_train_step(step, mesh)
        repl = replicated(mesh)
        p, s, o = jax.tree.map(lambda x: jax.device_put(x, repl), host)
        b = jax.tree.map(lambda x: jax.device_put(x, batch_sharding(mesh)),
                         batch)
        p, s, o, m = jstep(p, s, o, b, rng)
        results.append((float(m['loss']), jax.device_get(p)))

    for k in (1, 2):
        assert results[0][0] == pytest.approx(results[k][0], rel=1e-6), k
        for a, b in zip(jax.tree.leaves(results[0][1]),
                        jax.tree.leaves(results[k][1])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)


def test_grad_clip_optimizer():
    """train.grad_clip: global-norm clipping inside the flattened
    optimizer is semantics-identical to feeding pre-scaled gradients to
    an unclipped optimizer (the flattened vector's norm IS the tree's
    global norm); a non-binding clip is a no-op; 0 disables (reference
    semantics -- it has none)."""
    import optax

    from pqdet_tpu.train.step import make_optimizer

    grads = {'a': {'w': jnp.full((4, 4), 3.0)},
             'b': {'w': jnp.full((8,), -2.0)}}
    params = jax.tree.map(jnp.zeros_like, grads)
    gnorm = float(optax.global_norm(grads))
    clip = 0.25 * gnorm

    def first_update(g, grad_clip):
        opt = make_optimizer(lambda _: 1e-3, grad_clip=grad_clip)
        st = opt.init(params)
        upd, _ = opt.update(g, st, params)
        return jax.tree.leaves(upd)

    # binding clip == manual pre-scale through the unclipped optimizer
    scaled = jax.tree.map(lambda x: x * (clip / gnorm), grads)
    for a, b in zip(first_update(grads, clip), first_update(scaled, 0.0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    # non-binding clip is a no-op
    for a, b in zip(first_update(grads, 2 * gnorm), first_update(grads, 0.0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
