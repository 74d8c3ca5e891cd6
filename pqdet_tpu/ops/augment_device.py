"""On-device training augmentation (opt-in: ``augment.device: on``).

The reference augments per sample on the host with cv2/numpy
(dataset/augment.py, dataset/voc_sample.py:64-74). That chain is the
measured bottleneck of loader-bound hosts: mosaic quadruples and mixup
doubles the per-sample decode+transform work, so a 1-core host feeds only
~222 imgs/s against a >395 imgs/s device step (STATUS host-pipeline
section). TPU-natively the host does exactly ONE cached-decode + letterbox
per sample and ships raw uint8; every stochastic transform runs batched
inside the jitted train step where its cost is a few fused elementwise /
gather passes:

  hflip/vflip -> zoom-crop (SafeCrop+letterbox as one bilinear warp) ->
  color jitter -> mosaic -> mixup -> (round to uint8 domain)

Semantics per stage mirror the host chain (data/augment.py) on
already-letterboxed sources:

- flips: exact (lax.rev + the same box reflection).
- mosaic: with input-size sources the host formula is pure placement on a
  virtual 2S canvas + center crop — no resampling — so the device version
  (4 disjoint dynamic_update_slice pastes onto a 3S canvas + a STATIC
  center crop) is EXACTLY the host arithmetic given the same (xc, yc);
  proven by tests/test_augment_device.py against data/augment.py Mosaic.
  (The round-4 original — one stacked per-pixel gather — lowered to an
  81 ms/step f32 gather at bs=16@512 and was the entire device-augment
  step regression; pastes are pure DMA.)
- mixup: same Beta(1.5, 1.5) blend and weight-column semantics.
- color jitter: the host's uint8 brightness/contrast/saturation formulas
  (incl. cv2's fixed-point RGB2GRAY rounding) in shuffled order.
- zoom-crop: the one DOCUMENTED divergence. The host applies RandomSafeCrop
  to the original image and letterboxes once; here sources are already
  letterboxed, so the crop resamples a second time and the letterbox pad
  may enter/leave the frame. Distributionally it is the same
  "random zoom that never cuts a GT box"; bit parity is not claimed.

Partner selection for mosaic/mixup draws random in-batch permutations
(the host samples the whole dataset with replacement; within a batch of
shuffled-with-replacement samples a random permutation is the same
distribution). Under a sharded batch these gathers become XLA collectives
over ICI.

Boxes are (B, G, 6) [x1, y1, x2, y2, class, mixup_w] zero-padded rows;
mosaic grows G 4x and mixup appends the partner rows — downstream
ops/labels.py assign_labels_device handles any G. Images stay in the
uint8 value domain (rounded at the value-changing stages like the host's
uint8 chain) and return as uint8 for ops/preprocess.device_normalize.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def _valid(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., G) mask of non-degenerate rows."""
    return (boxes[..., 2] > boxes[..., 0]) & (boxes[..., 3] > boxes[..., 1])


def _where_boxes(mask_b, a, b):
    return jnp.where(mask_b[:, None, None], a, b)


# --------------------------------------------------------------- flips

def hflip(images, boxes, apply_b):
    """Horizontal flip (host RandomHFlip, data/augment.py:110-121)."""
    S = images.shape[2]
    flipped = images[:, :, ::-1, :]
    fb = boxes.at[..., 0].set(S - boxes[..., 2]).at[..., 2].set(S - boxes[..., 0])
    fb = jnp.where(_valid(boxes)[..., None], fb, boxes)
    return (jnp.where(apply_b[:, None, None, None], flipped, images),
            _where_boxes(apply_b, fb, boxes))


def vflip(images, boxes, apply_b):
    S = images.shape[1]
    flipped = images[:, ::-1, :, :]
    fb = boxes.at[..., 1].set(S - boxes[..., 3]).at[..., 3].set(S - boxes[..., 1])
    fb = jnp.where(_valid(boxes)[..., None], fb, boxes)
    return (jnp.where(apply_b[:, None, None, None], flipped, images),
            _where_boxes(apply_b, fb, boxes))


# ----------------------------------------------------------- zoom crop

def _letterbox_warp(img, x0i, y0i, cwi, chi, rwi, rhi, dli, dui,
                    pad_val=128.0):
    """Crop rect [x0, x0+cw) x [y0, y0+ch) of one (H, W, 3) image,
    bilinear-resized to (rh, rw) and center-placed at (du, dl) on a
    pad_val canvas — the host's SafeCrop slice + Resize letterbox
    (cv2.INTER_LINEAR pixel-center convention) as one fixed-shape warp."""
    H, W = img.shape[:2]
    cols = jnp.arange(W, dtype=jnp.float32)
    rows = jnp.arange(H, dtype=jnp.float32)
    # dst pixel center -> src coords (cv2 resize convention)
    sx = (cols - dli + 0.5) * (cwi / rwi) - 0.5 + x0i      # (W,)
    sy = (rows - dui + 0.5) * (chi / rhi) - 0.5 + y0i      # (H,)
    in_x = (cols >= dli) & (cols < dli + rwi)
    in_y = (rows >= dui) & (rows < dui + rhi)
    sx = jnp.clip(sx, x0i, x0i + cwi - 1)
    sy = jnp.clip(sy, y0i, y0i + chi - 1)
    fx = jnp.floor(sx)
    fy = jnp.floor(sy)
    wx = (sx - fx)[None, :, None]
    wy = (sy - fy)[:, None, None]
    xi0 = jnp.clip(fx.astype(jnp.int32), 0, W - 1)
    yi0 = jnp.clip(fy.astype(jnp.int32), 0, H - 1)
    xi1 = jnp.clip(xi0 + 1, 0, W - 1)
    yi1 = jnp.clip(yi0 + 1, 0, H - 1)
    g = lambda yi, xi: img[yi[:, None], xi[None, :], :]
    out = (g(yi0, xi0) * (1 - wy) * (1 - wx) + g(yi0, xi1) * (1 - wy) * wx
           + g(yi1, xi0) * wy * (1 - wx) + g(yi1, xi1) * wy * wx)
    inside = (in_y[:, None] & in_x[None, :])[..., None]
    return jnp.where(inside, out, pad_val)


def _axis_weights(n, lo, extent, r_ext, d0):
    """(n_out, n_in) bilinear interpolation matrix for one axis of the
    letterbox warp: output pixel centers map to src = (i - d0 + 0.5) *
    (extent / r_ext) - 0.5 + lo (cv2 resize convention), edge-clamped to
    the crop; rows outside the resized content are all-zero (the caller
    adds pad_val there via the row-weight complement). Every entry has at
    most two non-zeros — the matrix IS the bilinear gather, expressed so
    the warp runs as matmuls on the MXU instead of per-pixel gathers on
    the VPU."""
    idx = jnp.arange(n, dtype=jnp.float32)
    src = (idx - d0 + 0.5) * (extent / r_ext) - 0.5 + lo
    src = jnp.clip(src, lo, lo + extent - 1)
    inside = (idx >= d0) & (idx < d0 + r_ext)
    f = jnp.floor(src)
    frac = src - f
    cells = jnp.arange(n, dtype=jnp.float32)
    w = (jnp.where(cells[None, :] == f[:, None], 1 - frac[:, None], 0.)
         + jnp.where(cells[None, :] == f[:, None] + 1, frac[:, None], 0.))
    return jnp.where(inside[:, None], w, 0.)


def _letterbox_warp_mm(img, x0i, y0i, cwi, chi, rwi, rhi, dli, dui,
                       pad_val=128.0):
    """_letterbox_warp as two interpolation matmuls (see _axis_weights).
    Identical bilinear math; runs on the MXU. Precision pinned HIGHEST:
    at default one-pass bf16 the 0..255 blend would quantise to ~1 part
    in 256 and break the +-2-level parity with the host warp."""
    H, W = img.shape[:2]
    wy = _axis_weights(H, y0i, chi, rhi, dui)          # (H, H_in)
    wx = _axis_weights(W, x0i, cwi, rwi, dli)          # (W, W_in)
    out = jnp.einsum('Yh,hwc->Ywc', wy, img, precision='highest')
    out = jnp.einsum('Xw,Ywc->YXc', wx, out, precision='highest')
    # pad where either axis contributed nothing (outside the content box)
    coverage = wy.sum(1)[:, None] * wx.sum(1)[None, :]
    return out + (1. - coverage)[..., None] * pad_val


def zoom_crop(images, boxes, rng, apply_b, pad_val=128.0):
    """RandomSafeCrop + letterbox as ONE bilinear warp per sample.

    Crop bounds never cut a valid GT box (host RandomSafeCrop,
    data/augment.py:83-107); the crop is then aspect-preserving resized +
    center-padded back to the source size (host Resize semantics,
    data/augment.py:231-260, cv2.INTER_LINEAR pixel-center convention).
    """
    B, H, W = images.shape[:3]
    kx0, ky0, kx1, ky1 = jax.random.split(rng, 4)
    val = _valid(boxes)
    any_box = val.any(axis=1)
    big = jnp.float32(1e9)
    hx0 = jnp.min(jnp.where(val, boxes[..., 0], big), axis=1)
    hy0 = jnp.min(jnp.where(val, boxes[..., 1], big), axis=1)
    hx1 = jnp.max(jnp.where(val, boxes[..., 2], -big), axis=1)
    hy1 = jnp.max(jnp.where(val, boxes[..., 3], -big), axis=1)
    # box-free samples crop around the center point (host hull fallback)
    hx0 = jnp.where(any_box, jnp.floor(hx0), W // 2)
    hy0 = jnp.where(any_box, jnp.floor(hy0), H // 2)
    hx1 = jnp.where(any_box, jnp.ceil(hx1), W // 2 + 1)
    hy1 = jnp.where(any_box, jnp.ceil(hy1), H // 2 + 1)

    def ri(key, lo, hi):  # randint [lo, hi] inclusive, per sample
        u = jax.random.uniform(key, (B,))
        return jnp.floor(lo + u * (hi - lo + 1 - 1e-6))

    x0 = ri(kx0, jnp.zeros((B,)), jnp.clip(hx0, 0, W))
    y0 = ri(ky0, jnp.zeros((B,)), jnp.clip(hy0, 0, H))
    x1 = ri(kx1, jnp.clip(hx1, 0, W), jnp.full((B,), W, jnp.float32))
    y1 = ri(ky1, jnp.clip(hy1, 0, H), jnp.full((B,), H, jnp.float32))
    cw, ch = x1 - x0, y1 - y0
    ratio = jnp.minimum(W / cw, H / ch)
    rw = jnp.round(ratio * cw)
    rh = jnp.round(ratio * ch)
    dl = jnp.floor((W - rw) / 2)
    du = jnp.floor((H - rh) / 2)

    # PQDET_AUG_WARP: 'mm' (default) = interpolation-matrix matmuls on the
    # MXU; 'gather' = per-pixel bilinear gathers (same math; A/B on chip)
    import os
    warp = _letterbox_warp if os.environ.get('PQDET_AUG_WARP') == 'gather' \
        else _letterbox_warp_mm
    warped = jax.vmap(
        lambda img, *a: warp(img, *a, pad_val=pad_val)
    )(images, x0, y0, cw, ch, rw, rh, dl, du)
    nb = boxes
    nb = nb.at[..., 0].set((boxes[..., 0] - x0[:, None]) * ratio[:, None] + dl[:, None])
    nb = nb.at[..., 2].set((boxes[..., 2] - x0[:, None]) * ratio[:, None] + dl[:, None])
    nb = nb.at[..., 1].set((boxes[..., 1] - y0[:, None]) * ratio[:, None] + du[:, None])
    nb = nb.at[..., 3].set((boxes[..., 3] - y0[:, None]) * ratio[:, None] + du[:, None])
    nb = jnp.where(val[..., None], nb, boxes)
    return (jnp.where(apply_b[:, None, None, None], warped, images),
            _where_boxes(apply_b, nb, boxes))


# -------------------------------------------------------- color jitter

def _cv2_gray(img):
    """cv2(IPP) RGB2GRAY fixed point: (R*9798+G*19235+B*3735+16384)>>15 —
    verified bit-exact against cv2.cvtColor over 100k random pixels (the
    generic OpenCV shift-14 constants differ by 1 on ~0.3% of pixels).
    All intermediates are integers < 2^24, exact in f32."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    return jnp.floor((r * 9798. + g * 19235. + b * 3735. + 16384.) / 32768.)


def color_jitter(images, rng, apply_b, brightness=(-0.1, 0.1),
                 contrast=(0.8, 1.2), saturation=(0.1, 2.0)):
    """Brightness/contrast/saturation in random order — the host's uint8
    integer formulas (data/augment.py:138-169) in float: brightness adds a
    rounded offset then clips; contrast scales, clips, truncates;
    saturation blends with the cv2-rounded gray then clips+truncates."""
    B = images.shape[0]
    kb, kc, ks, ko = jax.random.split(rng, 4)
    bf = jnp.round(jax.random.uniform(kb, (B,), minval=brightness[0],
                                      maxval=brightness[1]) * 255.)
    cf = jax.random.uniform(kc, (B,), minval=contrast[0], maxval=contrast[1])
    sf = jax.random.uniform(ks, (B,), minval=saturation[0],
                            maxval=saturation[1])
    order = jax.random.randint(ko, (B,), 0, 6)

    def _b(img, i):
        return jnp.clip(img + bf[i], 0., 255.)

    def _c(img, i):
        return jnp.floor(jnp.clip(img * cf[i], 0., 255.))

    def _s(img, i):
        gray = _cv2_gray(img)
        return jnp.floor(jnp.clip(sf[i] * img + (1. - sf[i]) * gray[..., None],
                                  0., 255.))

    # 3 slots, each selecting one of the 3 ops per the sample's drawn
    # permutation (a vmapped lax.switch would evaluate all 6 branch
    # compositions = 18 image passes; this evaluates 3 ops x 3 slots = 9)
    perm_table = jnp.asarray(np.array(
        [[0, 1, 2], [0, 2, 1], [1, 0, 2], [1, 2, 0], [2, 0, 1], [2, 1, 0]],
        np.int32))

    def one(img, o, i):
        slots = perm_table[o]                       # (3,) op index per slot
        x = img
        for slot in range(3):
            j = slots[slot]
            x = jnp.where(j == 0, _b(x, i),
                          jnp.where(j == 1, _c(x, i), _s(x, i)))
        return x

    out = jax.vmap(one)(images, order, jnp.arange(B))
    return jnp.where(apply_b[:, None, None, None], out, images)


# -------------------------------------------------------------- mosaic

def mosaic_place(images4, boxes4, xc, yc):
    """The pure mosaic placement: 4 input-size sources onto the virtual
    (2S, 2S) canvas, center-cropped to (S, S) — exactly the host formula
    (data/augment.py:341-405) which, with full-size sources, never
    resamples and never exposes the canvas pad.

    images4: (B, 4, S, S, 3); boxes4: (B, 4, G, 6); xc/yc: (B,) int in
    [S/2, 3S/2). Returns (B, S, S, 3) images and (B, 4G, 6) boxes.
    """
    B, _, S = images4.shape[:3]
    G = boxes4.shape[2]
    half = S // 2

    # Image path: paste the 4 sources onto a (3S, 3S) canvas with
    # dynamic_update_slice and take the STATIC center crop. The canvas
    # covers virtual coords [-S/2, 2.5S) (offset +S), sources land at
    # disjoint rects fully covering the crop window [S, 2S), and no
    # source pixel the crop reads is ever out of range — algebraically
    # identical to the old per-pixel quadrant gather, which XLA lowered
    # to an 81 ms/step (bs=16@512) f32 gather with a 3-wide lane dim
    # (the entire device-augment regression of round 4's first ladder).
    canvas = jnp.zeros((B, 3 * S, 3 * S, images4.shape[-1]),
                       images4.dtype)
    for i in range(B):
        for k in range(4):
            oy = yc[i] + (0 if k >= 2 else -S) + half
            ox = xc[i] + (0 if k % 2 == 1 else -S) + half
            canvas = jax.lax.dynamic_update_slice(
                canvas, images4[i, k][None], (i, oy, ox, 0))
    out_images = canvas[:, S:2 * S, S:2 * S, :]

    def one(bx4, xci, yci):
        # boxes: per-source clip to the pasted rect, then the source->
        # virtual offset, then the center-crop shift (host lines 392-404)
        xcf = xci.astype(jnp.float32)
        ycf = yci.astype(jnp.float32)
        Sf = jnp.float32(S)
        obs = []
        for kk in range(4):
            right = kk % 2 == 1
            bottom = kk >= 2
            # x-extent of the pasted source rect, source frame
            xb0 = jnp.where(right, 0., jnp.maximum(Sf - xcf, 0.))
            xb2 = jnp.where(right, jnp.minimum(Sf, 2 * Sf - xcf), Sf)
            yb0 = jnp.where(bottom, 0., jnp.maximum(Sf - ycf, 0.))
            yb2 = jnp.where(bottom, jnp.minimum(Sf, 2 * Sf - ycf), Sf)
            offx = jnp.where(right, xcf, xcf - Sf)
            offy = jnp.where(bottom, ycf, ycf - Sf)
            b = bx4[kk]
            nb = b.at[:, 0].set(jnp.clip(b[:, 0], xb0, xb2) + offx)
            nb = nb.at[:, 2].set(jnp.clip(b[:, 2], xb0, xb2) + offx)
            nb = nb.at[:, 1].set(jnp.clip(b[:, 1], yb0, yb2) + offy)
            nb = nb.at[:, 3].set(jnp.clip(b[:, 3], yb0, yb2) + offy)
            obs.append(nb)
        nb = jnp.concatenate(obs, axis=0)          # (4G, 6) virtual frame
        merged = nb
        merged = merged.at[:, 0].set(jnp.clip(nb[:, 0] - Sf / 2, 0, Sf))
        merged = merged.at[:, 2].set(jnp.clip(nb[:, 2] - Sf / 2, 0, Sf))
        merged = merged.at[:, 1].set(jnp.clip(nb[:, 1] - Sf / 2, 0, Sf))
        merged = merged.at[:, 3].set(jnp.clip(nb[:, 3] - Sf / 2, 0, Sf))

        # degenerate-box filter (host filter_degenerate_boxes with mosaic
        # thresholds iou 0.2 / area 25 / aspect 10, augment.py:27-40)
        orig = bx4.reshape(4 * G, 6)
        w = merged[:, 2] - merged[:, 0]
        h = merged[:, 3] - merged[:, 1]
        area = w * h
        area0 = (orig[:, 2] - orig[:, 0]) * (orig[:, 3] - orig[:, 1])
        aspect = jnp.maximum(w / (h + 1e-16), h / (w + 1e-16))
        keep = (area > 25.) & (area / (area0 + 1e-16) > 0.2) & (aspect < 10.)
        keep &= _valid(orig)
        return jnp.where(keep[:, None], merged, 0.)

    return out_images, jax.vmap(one)(boxes4, xc, yc)


def mosaic(images, boxes, rng, apply_b):
    """Batched mosaic: 3 partner sets drawn as random in-batch
    permutations, per-sample center (xc, yc) ~ U[S/2, 3S/2) like the host
    (data/augment.py:355-356). Non-applied samples pass through with
    their boxes zero-padded to 4G."""
    B, S = images.shape[0], images.shape[1]
    G = boxes.shape[1]
    kp, kx, ky = jax.random.split(rng, 3)
    perms = [jax.random.permutation(k, B) for k in jax.random.split(kp, 3)]
    images4 = jnp.stack([images] + [images[p] for p in perms], axis=1)
    boxes4 = jnp.stack([boxes] + [boxes[p] for p in perms], axis=1)
    xc = jax.random.randint(kx, (B,), S // 2, S + S // 2)
    yc = jax.random.randint(ky, (B,), S // 2, S + S // 2)
    out, ob = mosaic_place(images4, boxes4, xc, yc)
    passthrough = jnp.pad(boxes, ((0, 0), (0, 3 * G), (0, 0)))
    return (jnp.where(apply_b[:, None, None, None], out, images),
            _where_boxes(apply_b, ob, passthrough))


# --------------------------------------------------------------- mixup

def mixup(images, boxes, partner_images, partner_boxes, lam, apply_b):
    """Beta-blend with a partner sample (host Mixup,
    data/augment.py:296-338): own boxes get weight lam, partner boxes
    1 - lam; non-applied samples keep weight 1 and zeroed partner rows."""
    lam_i = jnp.where(apply_b, lam, 1.0)
    out = (images * lam_i[:, None, None, None]
           + partner_images * (1. - lam_i)[:, None, None, None])
    out = jnp.round(out)  # cv2.addWeighted rounds to uint8
    own = boxes.at[..., 5].set(jnp.where(_valid(boxes),
                                         lam_i[:, None], 0.))
    own = jnp.where(_valid(boxes)[..., None], own, boxes)
    pb = partner_boxes.at[..., 5].set(jnp.where(_valid(partner_boxes),
                                                (1. - lam_i)[:, None], 0.))
    pb = jnp.where(_valid(partner_boxes)[..., None], pb, partner_boxes)
    pb = jnp.where(apply_b[:, None, None], pb, jnp.zeros_like(pb))
    return (jnp.where(apply_b[:, None, None, None], out, images),
            jnp.concatenate([own, pb], axis=1))


# ---------------------------------------------------------- the chain

class AugmentParams(NamedTuple):
    hflip_p: float = 0.5
    vflip_p: float = 0.0
    crop_p: float = 0.75
    color_p: float = 0.0
    mosaic_p: float = 0.0
    mixup_p: float = 0.5
    mixup_beta: float = 1.5


def _base_chain(img, boxes, keys, params: AugmentParams):
    """flips -> zoom-crop -> jitter (the host _standard_train_chain) on a
    batch of any size — used for the main batch AND, in fresh-partner
    mode, the partner batch (host partners run the same base chain with
    independent randomness, samples.py sampler -> base_train)."""
    B = img.shape[0]

    def bern(key, p):
        return jax.random.uniform(key, (B,)) < p

    if params.hflip_p > 0:
        img, boxes = hflip(img, boxes, bern(keys[0], params.hflip_p))
    if params.vflip_p > 0:
        img, boxes = vflip(img, boxes, bern(keys[1], params.vflip_p))
    if params.crop_p > 0:
        img, boxes = zoom_crop(img, boxes, keys[2],
                               bern(keys[3], params.crop_p))
        img = jnp.round(img)  # back to the uint8 value domain
    if params.color_p > 0:
        img = color_jitter(img, keys[4], bern(keys[5], params.color_p))
    return img, boxes


def device_augment(images: jnp.ndarray, gt: jnp.ndarray, rng,
                   params: AugmentParams,
                   partner_images: jnp.ndarray = None,
                   partner_gt: jnp.ndarray = None):
    """uint8 letterboxed batch + padded GT -> augmented uint8 batch +
    grown padded GT (see module docstring for the stage semantics).

    Stage order matches the host chain (samples.py _standard_train_chain +
    _compose_chain): flips -> crop -> jitter -> mosaic -> mixup. Zero
    probabilities skip their stage at trace time, so the default config
    pays only for what it uses.

    ``partner_images``/``partner_gt`` (4B leading dim; from the trainer's
    HBM-cache gather of FRESH random corpus rows): host-parity partner
    semantics. The host chain's mosaic/mixup partners are independent
    dataset draws each running the base chain with its own randomness
    (samples.py _compose_chain); the in-batch permutation fallback reuses
    the SAME augmented instances that train in the step, concentrating
    each image's gradient contribution and measurably depressing
    early-regime AP (reports/augab5_epoch5.json: the round-5 A/B matrix).
    Rows [0:3B] feed mosaic, rows [3B:4B] feed mixup.
    """
    B = images.shape[0]
    G = gt.shape[1]
    keys = jax.random.split(rng, 12)
    img = images.astype(jnp.float32)
    boxes = gt.astype(jnp.float32)

    def bern(key, p):
        return jax.random.uniform(key, (B,)) < p

    fresh = partner_images is not None
    if fresh:
        # one fused base-chain pass over main + partners (5B) with
        # per-sample randomness — partner draws are independent of the
        # main batch's, like the host sampler's
        allimg = jnp.concatenate([img, partner_images.astype(jnp.float32)])
        allbox = jnp.concatenate([boxes, partner_gt.astype(jnp.float32)])
        allimg, allbox = _base_chain(allimg, allbox,
                                     jax.random.split(keys[11], 6), params)
        img, pimg = allimg[:B], allimg[B:]
        boxes, pbox = allbox[:B], allbox[B:]
    else:
        img, boxes = _base_chain(img, boxes, keys, params)
    if params.mixup_p > 0:
        # the host mixup partner is a BASE sample (standard chain only,
        # samples.py _compose_chain) — snapshot before mosaic
        if fresh:
            # partner layout: [3B mosaic rows (when mosaic on)] + [B mixup]
            off = 3 * B if params.mosaic_p > 0 else 0
            pre_img, pre_boxes = pimg[off:], pbox[off:]
        else:
            pre_img, pre_boxes = img, boxes
    if params.mosaic_p > 0:
        if fresh:
            images4 = jnp.stack([img, pimg[:B], pimg[B:2 * B],
                                 pimg[2 * B:3 * B]], axis=1)
            boxes4 = jnp.stack([boxes, pbox[:B], pbox[B:2 * B],
                                pbox[2 * B:3 * B]], axis=1)
            kx, ky = jax.random.split(keys[6])
            S = img.shape[1]
            xc = jax.random.randint(kx, (B,), S // 2, S + S // 2)
            yc = jax.random.randint(ky, (B,), S // 2, S + S // 2)
            out, ob = mosaic_place(images4, boxes4, xc, yc)
            passthrough = jnp.pad(boxes, ((0, 0), (0, 3 * G), (0, 0)))
            apply_b = bern(keys[7], params.mosaic_p)
            img = jnp.where(apply_b[:, None, None, None], out, img)
            boxes = _where_boxes(apply_b, ob, passthrough)
        else:
            img, boxes = mosaic(img, boxes, keys[6],
                                bern(keys[7], params.mosaic_p))
    if params.mixup_p > 0:
        lam = jax.random.beta(keys[9], params.mixup_beta, params.mixup_beta,
                              (B,))
        if fresh:
            pmix_img, pmix_boxes = pre_img, pre_boxes
        else:
            perm = jax.random.permutation(keys[8], B)
            pmix_img, pmix_boxes = pre_img[perm], pre_boxes[perm]
        img, boxes = mixup(img, boxes, pmix_img, pmix_boxes,
                           lam, bern(keys[10], params.mixup_p))
    else:
        # weight column defaults to 1 for valid rows (host Mixup applies
        # the weight even when it passes through)
        boxes = boxes.at[..., 5].set(jnp.where(_valid(boxes), 1., 0.))
    img = jnp.clip(jnp.round(img), 0., 255.).astype(jnp.uint8)
    return img, boxes


def fresh_partners_enabled(config) -> bool:
    """augment.fresh_partners resolution: 'auto' (default) enables fresh
    partners exactly when the HBM corpus cache can supply them."""
    mode = getattr(config.augment, 'fresh_partners', 'auto')
    if isinstance(mode, bool):
        return mode
    mode = str(mode).lower()
    if mode in ('auto',):
        return bool(getattr(config.dataset, 'device_cache', False))
    return mode in ('on', 'true', '1', 'yes')


def partner_rows_per_sample(config) -> int:
    """How many fresh partner rows per batch row the augment chain wants
    (augment.fresh_partners): 3 for mosaic + 1 for mixup."""
    a = config.augment
    if not fresh_partners_enabled(config):
        return 0
    n = 0
    if float(getattr(a, 'mosaic_p', 0.0)) > 0:
        n += 3
    if float(a.mixup_p) > 0:
        n += 1
    return n


def augmenter_from_config(config):
    """(images_u8, gt, rng[, partner_images, partner_gt]) -> (images_u8,
    gt') closure bound to the augment config group, for use inside the
    jitted train step."""
    a = config.augment
    params = AugmentParams(
        hflip_p=float(a.hflip_p), vflip_p=float(a.vflip_p),
        crop_p=float(a.crop_p), color_p=float(a.color_p),
        mosaic_p=float(getattr(a, 'mosaic_p', 0.0)),
        mixup_p=float(a.mixup_p))

    def fn(images, gt, rng, partner_images=None, partner_gt=None):
        return device_augment(images, gt, rng, params,
                              partner_images=partner_images,
                              partner_gt=partner_gt)
    return fn
