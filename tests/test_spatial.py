"""Spatial partitioning (train.spatial): image height sharded over the
'space' mesh axis. XLA GSPMD inserts the conv halo exchanges; these tests
pin numerical parity against the unsharded step on the same batch."""

import jax
import jax.numpy as jnp
import numpy as np

from pqdet_tpu.model.network import DetectionNetwork
from pqdet_tpu.ops.labels import assign_labels_device
from pqdet_tpu.parallel.mesh import (make_mesh_2d, replicated,
                                     spatial_batch_shardings)
from pqdet_tpu.train.schedule import cosine_warmup
from pqdet_tpu.train.step import (jit_train_step, make_optimizer,
                                  make_train_step)
from pqdet_tpu.zoo.builder import CfgBuilder

STRIDES = np.array([8, 16, 32])
ANCHORS = np.array([[10, 13], [16, 30], [33, 23], [30, 61], [62, 45],
                    [59, 119], [116, 90], [156, 198], [373, 326]],
                   np.float32)


def _tiny_cfg():
    b = CfgBuilder()
    b.conv(8, size=3, stride=2)
    b.conv(16, size=3, stride=2)
    t8 = b.conv(16, size=3, stride=2)
    t16 = b.conv(24, size=3, stride=2)
    b.conv(32, size=3, stride=2)
    b.conv(27, size=1, bn=False, activation='linear')
    b.yolo(4)
    b.route(t16)
    b.conv(27, size=1, bn=False, activation='linear')
    b.yolo(4)
    b.route(t8)
    b.conv(27, size=1, bn=False, activation='linear')
    b.yolo(4)
    return b.text()


def _label_fn(g, size):
    return assign_labels_device(g, size, STRIDES, ANCHORS, 4)


def _batch(b=4, hw=64, seed=0):
    rng = np.random.default_rng(seed)
    imgs = (rng.random((b, hw, hw, 3)) * 255).astype(np.uint8)
    gt = np.zeros((b, 8, 6), np.float32)
    gt[:, 0] = [6, 6, 30, 30, 1, 1.0]
    gt[:, 1] = [34, 20, 60, 50, 2, 1.0]
    return {'image': imgs, 'gt': gt}


def test_spatial_step_loss_matches_unsharded():
    """One train step on a (2 data x 4 space) mesh == the same step on one
    device, to f32 collective-order noise. A halo-exchange bug would shift
    the loss O(1)."""
    net = DetectionNetwork.from_cfg(_tiny_cfg())
    params, state = net.init(jax.random.PRNGKey(0))
    opt = make_optimizer(cosine_warmup(1e-3, 1e-6, 0, 1000))
    step = make_train_step(net, opt, label_fn=_label_fn)

    batch = _batch()
    rng = jax.random.PRNGKey(5)
    _, _, _, m1 = jax.jit(step)(params, state, opt.init(params),
                                jax.tree.map(jnp.asarray, batch), rng)
    loss_1 = float(m1['loss'])

    mesh = make_mesh_2d(2, 4)
    shardings = spatial_batch_shardings(mesh)
    jstep = jit_train_step(step, mesh, batch_shardings=shardings)
    sharded = jax.tree.map(lambda x, sh: jax.device_put(jnp.asarray(x), sh),
                           batch, shardings)
    repl = replicated(mesh)
    p, s, o = jax.tree.map(lambda x: jax.device_put(x, repl),
                           (params, state, opt.init(params)))
    p, s, o, m_n = jstep(p, s, o, sharded, rng)
    loss_n = float(m_n['loss'])
    assert np.isfinite(loss_n)
    assert abs(loss_n - loss_1) <= 1e-3 * max(1.0, abs(loss_1)), \
        f'spatial loss {loss_n!r} != unsharded {loss_1!r}'
    # and the sharded step keeps training: a second step stays finite
    sharded = jax.tree.map(lambda x, sh: jax.device_put(jnp.asarray(x), sh),
                           _batch(seed=1), shardings)
    _, _, _, m2 = jstep(p, s, o, sharded, jax.random.PRNGKey(6))
    assert np.isfinite(float(m2['loss']))


def test_trainer_validates_spatial_config():
    import pytest
    from pqdet_tpu.config import load_config
    from pqdet_tpu.train.trainer import Trainer
    cfg = load_config(None, [
        'dataset.classes', '[a,b,c]', 'model.cfg_path', 'mobilenetv2-fpn',
        'train.spatial', '4', 'train.unroll_steps', '2',
        'dataset.train_txt_file', '/nonexistent'])
    with pytest.raises(ValueError, match='unroll_steps'):
        Trainer(cfg).init_all()
    cfg2 = load_config(None, [
        'dataset.classes', '[a,b,c]', 'model.cfg_path', 'mobilenetv2-fpn',
        'train.spatial', '4', 'system.label_assign', 'host',
        'dataset.train_txt_file', '/nonexistent'])
    with pytest.raises(ValueError, match='label_assign'):
        Trainer(cfg2).init_all()
