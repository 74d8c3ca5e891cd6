"""Minimal numpy evaluator for the ONNX op subset our exporters emit.

Plays the role onnxruntime plays for the reference (test.py:22-40 runs the
exported model and compares): round-trip tests execute the serialized graph
here and compare against the JAX network / int8 executor, proving the
export is semantically faithful without an onnx install. Supports exactly
the ops onnx_export.py produces (fp + QDQ/QLinearConv quantized graphs).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from pqdet_tpu.exporters import onnx_proto as P


def _conv2d(x, w, b, strides, pads, group):
    n, cin, h, wd = x.shape
    cout, cin_g, kh, kw = w.shape
    ph, pw = pads[0], pads[1]
    sh, sw = strides
    xp = np.pad(x, ((0, 0), (0, 0), (ph, ph), (pw, pw)))
    oh = (h + 2 * ph - kh) // sh + 1
    ow = (wd + 2 * pw - kw) // sw + 1
    out = np.zeros((n, cout, oh, ow), np.float64)
    cpg_in = cin // group
    cpg_out = cout // group
    # im2col per group
    for g in range(group):
        xs = xp[:, g * cpg_in:(g + 1) * cpg_in]
        cols = np.empty((n, cpg_in * kh * kw, oh * ow), np.float64)
        idx = 0
        for c in range(cpg_in):
            for i in range(kh):
                for j in range(kw):
                    patch = xs[:, c, i:i + sh * oh:sh, j:j + sw * ow:sw]
                    cols[:, idx] = patch.reshape(n, -1)
                    idx += 1
        wg = w[g * cpg_out:(g + 1) * cpg_out].reshape(cpg_out, -1)
        out[:, g * cpg_out:(g + 1) * cpg_out] = \
            (wg @ cols).reshape(n, cpg_out, oh, ow)
    if b is not None:
        out += b.reshape(1, -1, 1, 1)
    return out.astype(np.float32)


def run_model(model_bytes: bytes, feeds: Dict[str, np.ndarray]):
    """Execute a serialized model; returns list of graph output arrays."""
    m = P.decode_model(model_bytes)
    P.check_model(m)
    g = m['graph']
    env: Dict[str, np.ndarray] = dict(feeds)
    for t in g['initializer']:
        env[t['name']] = P.tensor_to_numpy(t)

    for n in g['node']:
        op = n['op_type']
        a = P.node_attrs(n)
        x = [env[i] if i else None for i in n['input']]
        if op == 'Conv':
            y = _conv2d(x[0], x[1], x[2] if len(x) > 2 else None,
                        a.get('strides', [1, 1]), a.get('pads', [0] * 4),
                        a.get('group', 1))
        elif op == 'QLinearConv':
            xq, xs, xzp, wq, ws, wzp, ys, yzp = x[:8]
            bias = x[8] if len(x) > 8 else None
            xf = (xq.astype(np.int32) - int(np.asarray(xzp).item())).astype(np.float64)
            wf = (wq.astype(np.int32)
                  - np.asarray(wzp, np.int32).reshape(-1, 1, 1, 1))
            acc = _conv2d(xf, wf.astype(np.float64), None,
                          a.get('strides', [1, 1]), a.get('pads', [0] * 4),
                          a.get('group', 1)).astype(np.float64)
            if bias is not None:
                acc += bias.astype(np.float64).reshape(1, -1, 1, 1)
            yf = acc * (np.asarray(xs).item() * np.asarray(ws, np.float64)
                        ).reshape(1, -1, 1, 1)
            y = np.clip(np.round(yf / np.asarray(ys).item()
                                 + int(np.asarray(yzp).item())),
                        0, 255).astype(np.uint8)
        elif op == 'QuantizeLinear':
            y = np.clip(np.round(x[0] / np.asarray(x[1]).item()
                                 + int(np.asarray(x[2]).item())),
                        0, 255).astype(np.uint8)
        elif op == 'DequantizeLinear':
            y = ((x[0].astype(np.float32) - int(np.asarray(x[2]).item()))
                 * np.asarray(x[1]).item())
        elif op == 'Relu':
            y = np.maximum(x[0], 0)
        elif op == 'LeakyRelu':
            y = np.where(x[0] > 0, x[0], a.get('alpha', 0.01) * x[0])
        elif op == 'Clip':
            y = np.clip(x[0], np.asarray(x[1]).item(), np.asarray(x[2]).item())
        elif op == 'Sigmoid':
            y = 1.0 / (1.0 + np.exp(-x[0]))
        elif op == 'Tanh':
            y = np.tanh(x[0])
        elif op == 'Exp':
            y = np.exp(x[0])
        elif op == 'Add':
            y = x[0] + x[1]
        elif op == 'Sub':
            y = x[0] - x[1]
        elif op == 'Mul':
            y = x[0] * x[1]
        elif op == 'Concat':
            y = np.concatenate(x, axis=a['axis'])
        elif op == 'Reshape':
            y = x[0].reshape([int(d) for d in x[1]])
        elif op == 'Transpose':
            y = np.transpose(x[0], a['perm'])
        elif op == 'Split':
            sizes = [int(s) for s in x[1]]
            y = np.split(x[0], np.cumsum(sizes)[:-1], axis=a['axis'])
            for name, arr in zip(n['output'], y):
                env[name] = arr
            continue
        elif op == 'MaxPool':
            k = a['kernel_shape']
            s = a.get('strides', [1, 1])
            p = a.get('pads', [0] * 4)
            xp = np.pad(x[0], ((0, 0), (0, 0), (p[0], p[0]), (p[1], p[1])),
                        constant_values=-np.inf)
            nb, c, h, wd = xp.shape
            oh = (h - k[0]) // s[0] + 1
            ow = (wd - k[1]) // s[1] + 1
            y = np.full((nb, c, oh, ow), -np.inf, x[0].dtype)
            for i in range(k[0]):
                for j in range(k[1]):
                    y = np.maximum(
                        y, xp[:, :, i:i + s[0] * oh:s[0],
                              j:j + s[1] * ow:s[1]])
        elif op == 'GlobalAveragePool':
            y = x[0].mean(axis=(2, 3), keepdims=True)
        elif op == 'Resize':
            scales = x[2]
            fh, fw = int(scales[2]), int(scales[3])
            y = x[0].repeat(fh, axis=2).repeat(fw, axis=3)
        elif op == 'Flatten':
            y = x[0].reshape(x[0].shape[0], -1)
        elif op == 'Gemm':
            y = x[0] @ x[1] + x[2]
        else:
            raise NotImplementedError(op)
        env[n['output'][0]] = y

    return [env[vi['name']] for vi in g['output']]
