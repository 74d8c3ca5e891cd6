"""Space-to-depth stem ingest (round-5 layout project, VERDICT r4 #2).

The roofline (tools/roofline.py, STATUS r4 #1) pins the forward's
remaining HBM headroom on the narrow-channel stem: C=3/16/32 maps at
512^2/256^2 run ~7x their logical bytes bound because the conv operands
relayout into 128-lane tiles (4-8x physical traffic inflation). The fix
is layout, not scheduling: reshape the (H, W, 3) input to
(H/r, W/r, 3 r^2) BEFORE the stem conv and fold the stem's weights
accordingly — function-preserving, like network.densify_grouped_convs.

With the reference stem (3x3 stride-2 conv, pad 1 — model/parser.py:
393-410, all four zoo backbones) and r == stride == 2, each output pixel
y[p, q] reads input rows {2p-1, 2p, 2p+1}, which live in s2d rows
{p-1, p}: the folded kernel is 2x2 stride-1 over 12 channels with
asymmetric (1, 0) padding, and tap (di=0, a=0) is identically zero.
The conv then reads a 12-channel tensor (10.7x lane pad) instead of a
3-channel one (42.7x) at a quarter the positions.

The s2d transpose itself reads/writes COMPACT arrays (XLA stores plain
HBM arrays unpadded; the lane padding is the conv's internal operand
form), so doing it on device right before the stem is cheap and keeps
every caller (bench, predict, trainer) unchanged behind the knob.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def space_to_depth(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/r, W/r, C*r*r); channel index = (a, b, c)
    with a/b the intra-block row/col offsets (c minor)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // r, w // r,
                                                 r * r * c)


def fold_stem_weight(w: np.ndarray, r: int, stride: int, padding: int):
    """Fold an HWIO conv kernel to run on space-to-depth(r) input.

    Requires r == stride (output spatial grid == s2d grid). Returns
    (w_folded HWIO over C*r*r inputs, pad_lo, pad_hi) for a stride-1 conv
    on the s2d tensor. Exact: y_folded(s2d(x)) == conv(x) tap for tap.
    """
    if r != stride:
        raise ValueError(f's2d fold needs r == stride, got {r} vs {stride}')
    kh, kw, cin, cout = w.shape
    # tap u reads input row stride*p + u - padding = r*(p + di) + a
    # with (u - padding) = r*di + a, di = floor((u - pad)/r), a = mod
    def span(k):
        lo = (0 - padding) // r
        hi = (k - 1 - padding) // r
        return lo, hi
    dlo, dhi = span(kh)
    elo, ehi = span(kw)
    nkh, nkw = dhi - dlo + 1, ehi - elo + 1
    wf = np.zeros((nkh, nkw, r * r * cin, cout), np.float64)
    for u in range(kh):
        di, a = divmod(u - padding, r)
        for v in range(kw):
            dj, bb = divmod(v - padding, r)
            # s2d channel block (a, bb): channels [(a*r + bb)*cin : +cin]
            blk = (a * r + bb) * cin
            wf[di - dlo, dj - elo, blk:blk + cin, :] = w[u, v]
    # stride-1 conv over s2d grid: position p needs s2d rows p+dlo..p+dhi
    pad_lo, pad_hi = -dlo, dhi
    return wf.astype(w.dtype), (pad_lo, pad_hi), (-elo, ehi)


def fold_stem_weight_j(w: jnp.ndarray, r: int, stride: int, padding: int):
    """fold_stem_weight in jnp for trace-time folding of LIVE weights
    (training: the scatter is linear, so gradients flow back to the
    original kernel and the step is function-preserving — the same
    contract as train-time grouped-conv densification)."""
    if r != stride:
        raise ValueError(f's2d fold needs r == stride, got {r} vs {stride}')
    kh, kw, cin, cout = w.shape
    dlo = (0 - padding) // r
    dhi = (kh - 1 - padding) // r
    elo = (0 - padding) // r
    ehi = (kw - 1 - padding) // r
    wf = jnp.zeros((dhi - dlo + 1, ehi - elo + 1, r * r * cin, cout),
                   w.dtype)
    for u in range(kh):
        di, a = divmod(u - padding, r)
        for v in range(kw):
            dj, bb = divmod(v - padding, r)
            blk = (a * r + bb) * cin
            wf = wf.at[di - dlo, dj - elo, blk:blk + cin, :].set(w[u, v])
    return wf, (-dlo, dhi), (-elo, ehi)


def stem_foldable(node) -> bool:
    """True when the graph's first conv matches the foldable stem shape
    (3-channel input, stride == 2, no groups)."""
    a = node.attrs
    return (node.kind == 'convolutional' and a['stride'] == 2
            and a['groups'] == 1 and node.in_channels == 3)
