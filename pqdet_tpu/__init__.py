"""pqdet_tpu — a TPU-native object-detection framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of eleflea/PQDet:
darknet-style ``.cfg`` model definitions compiled to pure jitted functions,
anchor-based YOLO heads, VOC/COCO/VisDrone data pipelines, a cocoeval-style
AP evaluator, channel pruning, fake-quant int8 QAT, and NAS/hyper-evolution
drivers — all designed for TPU hardware (NHWC layouts, static shapes,
`jax.sharding` data parallelism, Pallas kernels on the hot paths).
"""

__version__ = "0.1.0"
