"""Differential parity vs the actual torch reference implementation.

Imports the reference (read-only at /root/reference) with a minimal
torchvision stub (only `ops` is referenced at import time), builds the SAME
architecture in both frameworks, transfers the torch weights through the
migration converter, and compares forward outputs and losses numerically.

Skipped when the reference tree is unavailable.
"""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = '/root/reference'
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason='reference tree not mounted')


@pytest.fixture(scope='module')
def reference():
    """Import the reference package with torchvision stubbed out."""
    if 'torchvision' not in sys.modules:
        tv = types.ModuleType('torchvision')
        tv_ops = types.ModuleType('torchvision.ops')
        tv_ops.boxes = types.SimpleNamespace(batched_nms=None)
        tv.ops = tv_ops
        sys.modules['torchvision'] = tv
        sys.modules['torchvision.ops'] = tv_ops
    sys.path.insert(0, REF)
    try:
        # tools must come first: the reference has a tools <-> interpreter
        # import cycle that only resolves in this order
        import tools as ref_tools  # noqa
        import model.interpreter as ref_interp  # noqa
        import model.parser as ref_parser  # noqa
        import model.loss as ref_loss  # noqa
    finally:
        sys.path.remove(REF)
    return types.SimpleNamespace(interpreter=ref_interp, parser=ref_parser,
                                 loss=ref_loss, tools=ref_tools)


def _cfg_text():
    from pqdet_tpu.zoo import get_cfg
    return get_cfg('mobilenetv2-fpn', num_classes=20)


def test_forward_parity_mobilenetv2_fpn(reference, tmp_path):
    """Same cfg, same weights: reference torch model and pqdet_tpu network
    must produce the same decoded predictions."""
    import io
    import torch
    from pqdet_tpu.exporters.torch_convert import convert_torch_state_dict
    from pqdet_tpu.model.network import DetectionNetwork

    cfg_text = _cfg_text()
    torch.manual_seed(0)
    ref_model = reference.interpreter.DetectionModel(io.StringIO(cfg_text))
    ref_model.eval()

    net = DetectionNetwork.from_cfg(cfg_text)
    params, state = convert_torch_state_dict(ref_model.state_dict(), net)
    params = jax.tree.map(jnp.asarray, params)
    state = jax.tree.map(jnp.asarray, state)

    rng = np.random.RandomState(0)
    x = rng.rand(1, 3, 128, 128).astype(np.float32)

    with torch.no_grad():
        ref_out = ref_model(torch.from_numpy(x)).numpy()  # (B, sum HWA, 25)

    ours, _ = net.apply(params, state, jnp.asarray(x.transpose(0, 2, 3, 1)))
    ours = np.asarray(ours)

    assert ours.shape == ref_out.shape
    # boxes are in pixel units; scores in [0, 1]
    np.testing.assert_allclose(ours[..., :4], ref_out[..., :4],
                               rtol=1e-3, atol=5e-2)
    np.testing.assert_allclose(ours[..., 4:], ref_out[..., 4:],
                               rtol=1e-3, atol=1e-4)


def test_loss_parity(reference):
    """loss_per_scale parity against the reference on identical inputs."""
    import torch
    from pqdet_tpu.model.loss import loss_per_scale

    rng = np.random.RandomState(0)
    b, h, w, a, nc, stride = 2, 8, 8, 3, 20, 16
    # decoded-style predictions: positive-extent boxes + probabilities
    cx = rng.rand(b, h, w, a, 1) * h * stride
    cy = rng.rand(b, h, w, a, 1) * w * stride
    bw = rng.rand(b, h, w, a, 1) * 40 + 2
    bh = rng.rand(b, h, w, a, 1) * 40 + 2
    pred = np.concatenate([
        cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2,
        rng.rand(b, h, w, a, 1), rng.rand(b, h, w, a, nc)], -1).astype(np.float32)

    label = np.zeros((b, h, w, a, 6 + nc), np.float32)
    label[..., -1] = 1.0
    for bi in range(b):
        for _ in range(4):
            y, xx, ai = rng.randint(h), rng.randint(w), rng.randint(a)
            x1, y1 = rng.rand(2) * 60
            label[bi, y, xx, ai, :4] = [x1, y1, x1 + 30, y1 + 40]
            label[bi, y, xx, ai, 4] = 1.0
            label[bi, y, xx, ai, 5 + rng.randint(nc)] = 0.99
    gt = np.zeros((b, 6, 4), np.float32)
    gt[:, :3, :2] = rng.rand(b, 3, 2) * 60
    gt[:, :3, 2:] = gt[:, :3, :2] + rng.rand(b, 3, 2) * 40 + 5

    for loss_type in ['giou', 'iou', 'l1']:
        opt = {'stride': stride, 'bbox_loss': loss_type, 'ignore_thresh': 0.5,
               'l1_loss_gain': 0.05}
        ref = reference.loss.loss_per_scale(
            torch.from_numpy(pred), torch.from_numpy(label),
            torch.from_numpy(gt), opt)
        ref_vals = [float(t) for t in ref]

        ours = loss_per_scale(jnp.asarray(pred), jnp.asarray(label),
                              jnp.asarray(gt), stride=stride, num_classes=nc,
                              bbox_loss_type=loss_type, ignore_thresh=0.5,
                              l1_loss_gain=0.05)
        ours_vals = [float(t[0]) for t in ours]
        np.testing.assert_allclose(ours_vals, ref_vals, rtol=2e-4,
                                   err_msg=loss_type)


def test_loss_parity_diou_ciou(reference):
    """diou/ciou parity needs every label cell populated: the reference's
    arctan(w/h) NaNs on zero-padded label boxes (tools.py:472), which our
    arctan2 form avoids — so compare only on fully-positive labels."""
    import torch
    from pqdet_tpu.model.loss import loss_per_scale

    rng = np.random.RandomState(1)
    b, h, w, a, nc, stride = 1, 4, 4, 3, 5, 16
    cx = rng.rand(b, h, w, a, 1) * h * stride
    cy = rng.rand(b, h, w, a, 1) * w * stride
    bw = rng.rand(b, h, w, a, 1) * 40 + 2
    bh = rng.rand(b, h, w, a, 1) * 40 + 2
    pred = np.concatenate([
        cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2,
        rng.rand(b, h, w, a, 1), rng.rand(b, h, w, a, nc)], -1).astype(np.float32)

    lx = rng.rand(b, h, w, a, 1) * 40
    ly = rng.rand(b, h, w, a, 1) * 40
    lw = rng.rand(b, h, w, a, 1) * 30 + 5
    lh = rng.rand(b, h, w, a, 1) * 30 + 5
    label = np.concatenate([
        lx, ly, lx + lw, ly + lh,
        (rng.rand(b, h, w, a, 1) > 0.5).astype(np.float32),
        rng.rand(b, h, w, a, nc) * 0.9,
        np.ones((b, h, w, a, 1), np.float32)], -1).astype(np.float32)
    gt = np.concatenate([lx[:, 0, 0], ly[:, 0, 0],
                         lx[:, 0, 0] + lw[:, 0, 0],
                         ly[:, 0, 0] + lh[:, 0, 0]], -1).astype(np.float32)

    for loss_type in ['diou', 'ciou']:
        opt = {'stride': stride, 'bbox_loss': loss_type, 'ignore_thresh': 0.5,
               'l1_loss_gain': 0.05}
        ref_vals = [float(t) for t in reference.loss.loss_per_scale(
            torch.from_numpy(pred), torch.from_numpy(label),
            torch.from_numpy(gt), opt)]
        ours_vals = [float(t[0]) for t in loss_per_scale(
            jnp.asarray(pred), jnp.asarray(label), jnp.asarray(gt),
            stride=stride, num_classes=nc, bbox_loss_type=loss_type)]
        np.testing.assert_allclose(ours_vals, ref_vals, rtol=2e-4,
                                   err_msg=loss_type)


def test_cfg_grammar_parity(reference):
    """Both parsers produce the same layer dicts for every zoo model."""
    import io
    from pqdet_tpu.model.cfgparse import parse_cfg
    from pqdet_tpu.zoo import MODEL_ZOO, get_cfg

    for name in sorted(MODEL_ZOO):
        text = get_cfg(name)
        ref_layers = list(reference.parser.Parser(io.StringIO(text)).gen_layers())
        ours = parse_cfg(text)
        assert len(ref_layers) == len(ours)
        for r, o in zip(ref_layers, ours):
            assert r == {k: v for k, v in o.items()}, (name, r, o)


def test_neck_variant_structure_parity():
    """The rpan / yolo neck generators reproduce the reference's shipped
    cfg files (model/cfg/regnetx-600m-{rpan,yolo}.cfg) section for
    section. Route/shortcut indices are normalised to absolute layer
    indices (we emit absolute, the reference files use relative — same
    graph); bbox_loss is excluded (a training hyper our builders expose
    as a parameter, giou/ciou/l1 per variant)."""
    from pqdet_tpu.model.cfgparse import parse_cfg
    from pqdet_tpu.zoo import get_cfg

    def absolutize(sections):
        out = []
        for i, s in enumerate(sections):
            s = dict(s)
            if s['name'] == 'route':
                layers = s['layers'] if isinstance(s['layers'], list) \
                    else [s['layers']]
                s['layers'] = [l if l >= 0 else (i - 1) + l for l in layers]
            if s['name'] == 'shortcut':
                f = s['from']
                s['from'] = f if f >= 0 else (i - 1) + f
            s.pop('bbox_loss', None)
            out.append(s)
        return out

    for name in ('regnetx-600m-rpan', 'regnetx-600m-yolo'):
        ref_path = os.path.join(REF, 'model', 'cfg', f'{name}.cfg')
        with open(ref_path) as fr:
            ref_secs = absolutize(parse_cfg(fr.read()))
        ours = absolutize(parse_cfg(get_cfg(name)))
        assert len(ours) == len(ref_secs), name
        for i, (a, b) in enumerate(zip(ours, ref_secs)):
            assert a == b, (name, i, a, b)


def test_neck_variants_forward():
    """rpan / yolo variants build and run a jitted forward (3 scales,
    finite outputs) — the graph executor handles their neck topologies
    (residual-PAN shortcut-after-route; depthwise conv5 stacks)."""
    from pqdet_tpu.model.network import DetectionNetwork
    from pqdet_tpu.zoo import get_cfg

    for name in ('regnetx-600m-rpan', 'regnetx-600m-yolo'):
        net = DetectionNetwork.from_cfg(get_cfg(name))
        params, state = net.init(jax.random.PRNGKey(0))
        out = jax.jit(net.infer_fn())(params, state,
                                      jnp.ones((1, 128, 128, 3)))
        assert out.shape == (1, 3 * (16 * 16 + 8 * 8 + 4 * 4), 25)
        assert bool(jnp.isfinite(out).all()), name


def test_classifier_zoo_structure_parity():
    """The classifier generators reproduce the reference's shipped
    classifier cfgs (model/cfg/classifier/{resnet50,regnetx-600m,
    regnety-400m}.cfg) section for section. resnet50-1g.cfg is excluded:
    its irregular widths are a slimming-pruner artifact (that capability
    is compress/prune.py's cfg re-emission, not a designed zoo entry)."""
    from pqdet_tpu.model.cfgparse import parse_cfg
    from pqdet_tpu.zoo import get_classifier_cfg

    def absolutize(sections):
        out = []
        for i, s in enumerate(sections):
            s = dict(s)
            if s['name'] == 'route':
                layers = s['layers'] if isinstance(s['layers'], list) \
                    else [s['layers']]
                s['layers'] = [l if l >= 0 else (i - 1) + l for l in layers]
            if s['name'] == 'shortcut':
                f = s['from']
                s['from'] = f if f >= 0 else (i - 1) + f
            out.append(s)
        return out

    for name in ('resnet50', 'regnetx-600m', 'regnety-400m'):
        path = os.path.join(REF, 'model', 'cfg', 'classifier', f'{name}.cfg')
        with open(path) as fr:
            ref_secs = absolutize(parse_cfg(fr.read()))
        ours = absolutize(parse_cfg(get_classifier_cfg(name)))
        assert len(ours) == len(ref_secs), name
        for i, (a, b) in enumerate(zip(ours, ref_secs)):
            assert a == b, (name, i, a, b)


def test_classifier_zoo_forward():
    """Classifier zoo models build and run a jitted forward to (B, 1000)
    logits through ClassifierNetwork."""
    from pqdet_tpu.model.network import ClassifierNetwork
    from pqdet_tpu.zoo import CLASSIFIER_ZOO, get_classifier_cfg

    for name in sorted(CLASSIFIER_ZOO):
        net = ClassifierNetwork.from_cfg(get_classifier_cfg(name))
        params, state = net.init(jax.random.PRNGKey(0))
        logits, _ = jax.jit(net.apply)(params, state,
                                       jnp.ones((2, 64, 64, 3)))
        assert logits.shape == (2, 1000), name
        assert bool(jnp.isfinite(logits).all()), name


def test_grad_parity_mobilenetv2_fpn(reference):
    """End-to-end TRAINING-gradient parity: d(total loss)/d(conv weights)
    of the full model vs torch autograd on identical weights, batch and
    label grids (train-mode BN both sides).

    Deep f32 detector backwards are chaotic: torch against ITSELF with a
    1e-6 input perturbation diverges ~6% at the stem (train-mode BN
    backward subtracts near-cancelling means, amplifying noise layer by
    layer). So the assertion is calibrated per layer against that
    measured self-divergence floor: our grads must sit within 3x of
    torch's own noise, and the loss + head-adjacent grads (short, well-
    conditioned paths) must match tightly in absolute terms."""
    import io
    import torch
    from pqdet_tpu.data.train_data import assign_labels
    from pqdet_tpu.exporters.torch_convert import convert_torch_state_dict
    from pqdet_tpu.model.network import DetectionNetwork

    cfg_text = _cfg_text()
    torch.manual_seed(2)
    ref_model = reference.interpreter.DetectionModel(io.StringIO(cfg_text))
    ref_model.train()

    net = DetectionNetwork.from_cfg(cfg_text)
    params, state = convert_torch_state_dict(ref_model.state_dict(), net)
    params = jax.tree.map(jnp.asarray, params)
    state = jax.tree.map(jnp.asarray, state)

    rng = np.random.RandomState(2)
    B, S, nc = 2, 128, 20
    x = rng.rand(B, S, S, 3).astype(np.float32)
    strides = np.array([8, 16, 32])
    anchors = np.array([[10, 13], [16, 30], [33, 23], [30, 61], [62, 45],
                        [59, 119], [116, 90], [156, 198], [373, 326]],
                       np.float32)
    per_image = []
    for _ in range(B):
        boxes = []
        for _ in range(3):
            x1, y1 = rng.rand(2) * (S - 50)
            w, h = rng.rand(2) * 40 + 8
            boxes.append([x1, y1, x1 + w, y1 + h, rng.randint(nc), 1.0])
        per_image.append(assign_labels(np.array(boxes, np.float32), (S, S),
                                       strides, anchors, nc, max_gt=8))
    targets = tuple(np.stack([pi[0][k] for pi in per_image])
                    for k in range(3)) + \
        tuple(np.stack([pi[1][k] for pi in per_image]) for k in range(3))
    tt = tuple(torch.from_numpy(t) for t in targets)

    def loss_fn(p):
        losses, _ = net.apply(p, state, jnp.asarray(x),
                              targets=tuple(jnp.asarray(t) for t in targets),
                              train=True)
        return losses['loss'][0]

    loss_ours, grads = jax.value_and_grad(loss_fn)(params)

    def torch_grads(xx):
        ref_model.zero_grad()
        xt = torch.from_numpy(np.ascontiguousarray(xx.transpose(0, 3, 1, 2)))
        out = ref_model(xt, tt)
        out['loss'].backward()
        return float(out['loss'].detach()), {
            n: p.grad.clone().numpy()
            for n, p in ref_model.named_parameters() if p.grad is not None}

    ref_loss, g_ref = torch_grads(x)
    # torch's own f32 chaos floor: two independent 1e-6 perturbations
    _, g_e1 = torch_grads(x + 1e-6)
    noise = np.random.RandomState(7).randn(*x.shape).astype(np.float32)
    _, g_e2 = torch_grads(x * (1 + 1e-6 * noise))
    assert abs(ref_loss - float(loss_ours)) / max(abs(ref_loss), 1) < 2e-3

    checked = head_checked = 0
    ratios = []
    yolo_feeders = {n.index - 1 for n in net.graph.nodes if n.kind == 'yolo'}
    for node in net.graph.nodes:
        if node.kind != 'convolutional':
            continue
        name = f'module_list.{node.index}.conv.weight'
        if name not in g_ref:
            continue
        rg = g_ref[name].transpose(2, 3, 1, 0)  # OIHW -> HWIO
        og = np.asarray(grads[str(node.index)]['w'])
        nref = np.linalg.norm(rg) + 1e-12
        ours_err = float(np.linalg.norm(og - rg) / nref)
        floor = max(
            float(np.linalg.norm(g_e1[name].transpose(2, 3, 1, 0) - rg) / nref),
            float(np.linalg.norm(g_e2[name].transpose(2, 3, 1, 0) - rg) / nref))
        ratios.append(ours_err / max(floor, 1e-9))
        assert ours_err < max(2.5 * floor, 5e-4), \
            (node.index, ours_err, floor)
        if node.index in yolo_feeders:
            assert ours_err < 1e-3, (node.index, ours_err)
            head_checked += 1
        checked += 1
    assert checked > 50 and head_checked == 3, (checked, head_checked)
    # in aggregate, our grads are as close to torch's as torch is to itself
    assert float(np.median(ratios)) < 1.0, np.median(ratios)
