"""On-device input preprocessing.

The TPU-native training pipeline ships raw uint8 RGB batches over the
host->device link (4x fewer bytes than the f32 batches the reference's
DataLoader moves, 2x fewer than a host-side bf16 cast) and performs
ImageNet normalization on device, where XLA fuses the convert+affine into
the stem convolution's input fusion (~one HBM pass, no host cost on
loader-bound hosts).

Dispatch is by dtype: a float input means the host already normalized
(the reference chain semantics, dataset/augment.py Normalize) and is
passed through untouched, so hand-built float batches in tests and the
reference-parity harness behave exactly as before.

Numerics: identical to the host path — uint8 -> f32, then the same folded
affine (x/255 - mean)/std == x*scale + bias in f32 (data/augment.py
Normalize), before the network's own compute-dtype cast.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pqdet_tpu.data.augment import IMAGENET_MEAN, IMAGENET_STD

_SCALE = (1.0 / (255.0 * np.asarray(IMAGENET_STD, np.float32))).astype(np.float32)
_BIAS = (-np.asarray(IMAGENET_MEAN, np.float32)
         / np.asarray(IMAGENET_STD, np.float32)).astype(np.float32)


def device_normalize(images: jnp.ndarray) -> jnp.ndarray:
    """uint8 (..., 3) images -> ImageNet-normalized float32; float inputs
    pass through (already normalized on host)."""
    if images.dtype != jnp.uint8:
        return images
    return images.astype(jnp.float32) * jnp.asarray(_SCALE) + jnp.asarray(_BIAS)
