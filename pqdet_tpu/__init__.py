"""pqdet_tpu — a TPU-native object-detection framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of eleflea/PQDet:
darknet-style ``.cfg`` model definitions compiled to pure jitted functions,
anchor-based YOLO heads, VOC/COCO/VisDrone data pipelines, a cocoeval-style
AP evaluator, channel pruning, fake-quant int8 QAT, and NAS/hyper-evolution
drivers — all designed for TPU hardware (NHWC layouts, static shapes,
`jax.sharding` data parallelism, Pallas kernels on the hot paths).
"""

__version__ = "0.1.0"

import os as _os

# PQDET_PLATFORM=cpu|tpu forces the JAX platform for every CLI in this
# package. The env var JAX_PLATFORMS alone does NOT work in this image
# (a site hook overrides it after interpreter start); only a
# jax.config.update before first backend use does. Used by CPU rehearsals
# of multi-hour TPU drivers (tools/run_ladder.py) and mirrors what
# tests/conftest.py does for the test suite.
_platform = _os.environ.get('PQDET_PLATFORM')
if _platform:
    import jax as _jax

    _jax.config.update('jax_platforms', _platform)
del _os, _platform
