"""Functional JAX layers for the compiled graph.

Everything is NHWC (TPU-native layout; the reference is NCHW torch modules,
model/parser.py:389-461). Conv weights are HWIO. Parameters live in plain
pytrees (dicts); batch-norm running statistics live in a separate mutable
`state` pytree so the apply function stays pure.

Initialisation matches torch defaults (kaiming-uniform fan_in for conv/linear
weights, uniform bound 1/sqrt(fan_in) for biases) so that training dynamics
are comparable with the reference.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-5       # torch nn.BatchNorm2d default
BN_MOMENTUM = 0.1   # torch nn.BatchNorm2d default


# ----------------------------------------------------------------- activations

def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


ACTIVATION_FNS = {
    'logistic': jax.nn.sigmoid,
    'leaky': partial(jax.nn.leaky_relu, negative_slope=0.1),
    'relu': jax.nn.relu,
    'relu6': lambda x: jnp.clip(x, 0.0, 6.0),
    'tanh': jnp.tanh,
    'mish': mish,
    'linear': lambda x: x,
}


def apply_activation(name: str, x):
    return ACTIVATION_FNS[name](x)


# ------------------------------------------------------------- initialisation

def _kaiming_uniform(key, shape, fan_in, a=math.sqrt(5)):
    # torch kaiming_uniform_ with a=sqrt(5): gain = sqrt(2/(1+a^2)) = sqrt(1/3)
    gain = math.sqrt(2.0 / (1.0 + a * a))
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def init_conv(key, in_channels: int, out_channels: int, size: int,
              groups: int = 1, bias: bool = True) -> dict:
    """Conv kernel in HWIO layout: (size, size, in/groups, out)."""
    kw, kb = jax.random.split(key)
    fan_in = (in_channels // groups) * size * size
    params = {'w': _kaiming_uniform(kw, (size, size, in_channels // groups, out_channels), fan_in)}
    if bias:
        bound = 1.0 / math.sqrt(fan_in)
        params['b'] = jax.random.uniform(kb, (out_channels,), jnp.float32, -bound, bound)
    return params


def init_bn(num_features: int) -> Tuple[dict, dict]:
    params = {'gamma': jnp.ones((num_features,), jnp.float32),
              'beta': jnp.zeros((num_features,), jnp.float32)}
    state = {'mean': jnp.zeros((num_features,), jnp.float32),
             'var': jnp.ones((num_features,), jnp.float32)}
    return params, state


def init_linear(key, in_features: int, out_features: int) -> dict:
    kw, kb = jax.random.split(key)
    w = _kaiming_uniform(kw, (in_features, out_features), in_features)
    bound = 1.0 / math.sqrt(in_features)
    b = jax.random.uniform(kb, (out_features,), jnp.float32, -bound, bound)
    return {'w': w, 'b': b}


# ------------------------------------------------------------------ forwards

def densify_grouped_weight(w, groups: int):
    """Compact grouped HWIO weights (kh, kw, cin/g, cout) -> block-diagonal
    dense (kh, kw, cin, cout), as a differentiable trace-time op.

    The expansion is an eye-mask broadcast, so under autodiff the weight
    gradient contracts back onto the blocks exactly (off-block entries get
    zero gradient) — training on dense weights is function- and
    gradient-identical to the grouped conv while the MXU runs at full tile
    occupancy instead of ~0.7 TFLOP/s (measured, STATUS round 2).
    """
    kh, kw, cin_g, cout = w.shape
    cpg = cout // groups
    w6 = w.reshape(kh, kw, 1, cin_g, groups, cpg)
    eye = jnp.eye(groups, dtype=w.dtype).reshape(1, 1, groups, 1, groups, 1)
    return (w6 * eye).reshape(kh, kw, cin_g * groups, cout)


def conv2d(x, w, b=None, stride: int = 1, padding: int = 0, groups: int = 1,
           compute_dtype=None, dense_groups: bool = True):
    """2-D convolution, NHWC x HWIO -> NHWC.

    Grouped/depthwise convs map to ``feature_group_count`` which XLA lowers
    onto the MXU directly (the reference leans on cuDNN for this,
    model/parser.py:393-401) — EXCEPT grouped convs with group width >= 2
    (RegNets), which are expanded to block-diagonal dense weights at trace
    time (``dense_groups``): group widths of 8-48 leave the systolic array
    mostly idle and the dense FLOPs are free by comparison. Depthwise convs
    (width 1) stay grouped — C x dense waste, and XLA's depthwise path is
    bandwidth-bound anyway.
    """
    if groups > 1 and w.shape[2] == x.shape[-1]:
        # already block-diagonal DENSE weights (network.densify_grouped_convs
        # at inference-param build): run as one dense MXU conv
        groups = 1
    elif dense_groups and groups > 1 and w.shape[2] >= 2:
        w = densify_grouped_weight(w, groups)
        groups = 1
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    # In reduced precision the output stays in the compute dtype (XLA's MXU
    # path still accumulates bf16 matmuls in f32 internally); requesting a
    # f32 preferred_element_type here would make the conv's transpose rule
    # mix dtypes and fail under autodiff.
    preferred = jnp.float32 if compute_dtype is None else None
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=groups,
        preferred_element_type=preferred,
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def _chan_sum(z):
    """(..., C) f32 -> (C,) sum over all leading axes.

    MEASURED NEGATIVE RESULT (round 5, /tmp/bnprof_*.log): a
    128-lane-folded reshape view (fold 128/C rows into the lane dim so
    narrow-C reduces stop paying the 4-8x tile padding the roofline
    blamed for the 4.68x multiply_reduce bucket) is NOT free on TPU —
    conv outputs carry tiled layouts ({3,0,2,1:T(8,128)}), so
    (32,256,256,16)->(262144,128) materialises a relayout copy (~1.7 ms
    per BN layer at bs=32): the folded build profiled 138.7 ms/step and
    even sharing the fold with the forward moments dragged the autodiff
    arm to 113.6 vs the r4 baseline 72.7. Plain reduces keep the stat
    sums fusable into conv epilogues; the bucket's padding waste is the
    lesser evil."""
    axes = tuple(range(z.ndim - 1))
    return jnp.sum(z, axis=axes)


def _bn_moments(x):
    """One-pass batch moments: E[x] and biased Var[x] from a single fused
    read of the activation (the naive mean-then-centered-var needs TWO
    sequential full-HBM passes because var depends on mean; at bs=32@512
    the BN stat reduces were 12.3 ms of a 73.5 ms train step). The
    E[d^2]-E[d]^2 form is cancellation-safe because d = x - s is centered
    by a per-channel shift s estimated from a strided subsample (~1/64 of
    the data, one cheap extra reduce): s tracks the batch mean within
    O(std), so the subtracted terms stay small relative to f32 precision.
    Exact in exact arithmetic for ANY s (mean and var are
    shift-invariant), which also makes stop_gradient(s) exact in the vjp.
    """
    n = x.size // x.shape[-1]
    s = jax.lax.stop_gradient(jnp.mean(
        x[:, ::8, ::8, :].astype(jnp.float32), axis=(0, 1, 2)))
    d = x.astype(jnp.float32) - s
    dm = _chan_sum(d) / n
    var = jnp.maximum(_chan_sum(jnp.square(d)) / n - jnp.square(dm), 0.0)
    return s + dm, var


def _bn_train_impl(x, gamma, beta):
    mean, var = _bn_moments(x)
    inv = jax.lax.rsqrt(var + BN_EPS) * gamma
    y = (x - mean.astype(x.dtype)) * inv.astype(x.dtype) \
        + beta.astype(x.dtype)
    return y, mean, var


@jax.custom_vjp
def _bn_train(x, gamma, beta):
    """Train-mode BN with a hand-written backward: the three BN-backward
    reduces (sum dy, sum dy*(x-mean)) run through _chan_sum's lane-folded
    view and share one elementwise pass with the dx computation — the
    autodiff backward's multiply_reduce fusions ran at 4.68x their bytes
    bound on narrow-channel layers. PQDET_BN_BWD=autodiff restores the
    autodiff path for A/B."""
    return _bn_train_impl(x, gamma, beta)


def _bn_train_fwd(x, gamma, beta):
    y, mean, var = _bn_train_impl(x, gamma, beta)
    return (y, mean, var), (x, gamma, mean, var)


def _bn_train_bwd(res, cots):
    x, gamma, mean, var = res
    dy, dmean_c, dvar_c = cots  # mean/var feed only the (non-diff'd)
    n = x.size // x.shape[-1]   # EMA state, so their cotangents are 0
    x32 = x.astype(jnp.float32)
    dy32 = dy.astype(jnp.float32)
    inv = jax.lax.rsqrt(var + BN_EPS)
    xc = x32 - mean
    sum_dy = _chan_sum(dy32)
    sum_dy_xc = _chan_sum(dy32 * xc)
    dgamma = sum_dy_xc * inv
    dbeta = sum_dy
    dx = (gamma * inv) * (dy32 - sum_dy / n
                          - xc * (inv * inv) * (sum_dy_xc / n))
    # exact cotangent terms for the mean/var outputs (zero in training)
    dx = dx + dmean_c / n + dvar_c * (2.0 / n) * xc
    return dx.astype(x.dtype), dgamma.astype(gamma.dtype), \
        dbeta.astype(gamma.dtype)


_bn_train.defvjp(_bn_train_fwd, _bn_train_bwd)


def batch_norm(x, params, state, train: bool):
    """BatchNorm over (N, H, W); returns (y, new_state).

    Normalisation uses biased batch variance; running stats store the
    unbiased variance, both matching torch.nn.BatchNorm2d.
    """
    gamma, beta = params['gamma'], params['beta']
    if train:
        import os
        # default: autodiff backward (fuses with conv epilogues). The
        # custom single-pass vjp stays available as PQDET_BN_BWD=fused —
        # its lane-folded variant measured SLOWER (see _chan_sum).
        if os.environ.get('PQDET_BN_BWD') == 'fused':
            y, mean, var = _bn_train(x, gamma, beta)
        else:
            mean, var = _bn_moments(x)
            inv = jax.lax.rsqrt(var + BN_EPS) * gamma
            y = (x - mean.astype(x.dtype)) * inv.astype(x.dtype) \
                + beta.astype(x.dtype)
        n = x.shape[0] * x.shape[1] * x.shape[2]
        unbiased = var * (n / max(n - 1, 1))
        mean = jax.lax.stop_gradient(mean)
        unbiased = jax.lax.stop_gradient(unbiased)
        new_state = {
            'mean': (1 - BN_MOMENTUM) * state['mean'] + BN_MOMENTUM * mean,
            'var': (1 - BN_MOMENTUM) * state['var'] + BN_MOMENTUM * unbiased,
        }
        return y, new_state
    mean, var = state['mean'], state['var']
    inv = jax.lax.rsqrt(var + BN_EPS) * gamma
    y = (x - mean.astype(x.dtype)) * inv.astype(x.dtype) + beta.astype(x.dtype)
    return y, state


def fold_bn_into_conv(conv_params: dict, bn_params: dict, bn_state: dict) -> dict:
    """Fold inference-mode BN into the conv weights/bias (the TPU analogue of
    torch.quantization.fuse_modules, reference tools.py:256-274)."""
    w = conv_params['w']
    scale = bn_params['gamma'] / jnp.sqrt(bn_state['var'] + BN_EPS)
    new_w = w * scale[None, None, None, :]
    b = conv_params.get('b', jnp.zeros((w.shape[-1],), w.dtype))
    new_b = (b - bn_state['mean']) * scale + bn_params['beta']
    return {'w': new_w, 'b': new_b}


def max_pool(x, size: int, stride: int, padding: int):
    """NHWC max pool. Padding uses -inf so padded cells never win, matching
    torch semantics of nn.MaxPool2d."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, size, size, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )


def adaptive_avg_pool(x, out_h: int, out_w: int):
    """AdaptiveAvgPool2d equivalent. For the common (1,1) case this is a
    plain spatial mean; general case uses torch's bucket boundaries."""
    n, h, w, c = x.shape
    if (out_h, out_w) == (1, 1):
        return jnp.mean(x, axis=(1, 2), keepdims=True)
    if h % out_h == 0 and w % out_w == 0:
        kh, kw = h // out_h, w // out_w
        s = jax.lax.reduce_window(
            x, 0.0, jax.lax.add,
            window_dimensions=(1, kh, kw, 1),
            window_strides=(1, kh, kw, 1),
            padding='VALID')
        return s / (kh * kw)
    # general adaptive pooling: precomputed static bucket edges
    ys = [(int(np.floor(i * h / out_h)), int(np.ceil((i + 1) * h / out_h))) for i in range(out_h)]
    xs = [(int(np.floor(j * w / out_w)), int(np.ceil((j + 1) * w / out_w))) for j in range(out_w)]
    rows = []
    for y0, y1 in ys:
        cols = [jnp.mean(x[:, y0:y1, x0:x1, :], axis=(1, 2)) for x0, x1 in xs]
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)


def upsample_nearest(x, factor: int):
    """Nearest-neighbour upsample via reshape-broadcast (layout friendly;
    avoids gather)."""
    n, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (n, h, factor, w, factor, c))
    return x.reshape(n, h * factor, w * factor, c)


def linear(x, params):
    return x @ params['w'] + params['b']


def dropout(x, rate: float, rng, train: bool):
    if not train or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)
