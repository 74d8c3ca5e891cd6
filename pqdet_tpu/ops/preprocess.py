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

# the ONE folded-affine definition, shared with the host-side
# augment.Normalize so the two paths stay bit-identical by construction
from pqdet_tpu.data.augment import NORM_BIAS as _BIAS
from pqdet_tpu.data.augment import NORM_SCALE as _SCALE


def device_normalize(images: jnp.ndarray) -> jnp.ndarray:
    """uint8 (..., 3) images -> ImageNet-normalized float32; float inputs
    pass through (already normalized on host)."""
    if images.dtype != jnp.uint8:
        return images
    return images.astype(jnp.float32) * jnp.asarray(_SCALE) + jnp.asarray(_BIAS)
