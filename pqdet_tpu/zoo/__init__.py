"""Model zoo: programmatic generators that emit darknet-style cfg text for
the architectures the reference ships as hand-written cfg files
(model/cfg/*.cfg). Generating them from the published architecture specs
keeps a single source of truth and lets NAS/pruning reuse the same builder.
"""

from pqdet_tpu.zoo.builder import CfgBuilder
from pqdet_tpu.zoo.mobilenetv2 import mobilenetv2_fpn
from pqdet_tpu.zoo.regnet import (regnetx_600m_fpn, regnetx_600m_pan,
                                  regnetx_600m_rpan, regnetx_600m_yolo,
                                  regnety_400m_fpn)

MODEL_ZOO = {
    'mobilenetv2-fpn': mobilenetv2_fpn,
    'regnetx-600m-fpn': regnetx_600m_fpn,
    'regnetx-600m-pan': regnetx_600m_pan,
    'regnety-400m-fpn': regnety_400m_fpn,
    # experimental neck variants the reference ships as cfg files only
    # (model/cfg/regnetx-600m-rpan.cfg, regnetx-600m-yolo.cfg; not in the
    # README zoo table)
    'regnetx-600m-rpan': regnetx_600m_rpan,
    'regnetx-600m-yolo': regnetx_600m_yolo,
}


# backbone-pretraining classifiers (reference model/cfg/classifier/*.cfg;
# resnet50-1g is a pruner artifact — produced by compress/prune.py, not
# a zoo entry). Build these with ClassifierNetwork, not DetectionNetwork.
from pqdet_tpu.zoo import classifier as _classifier  # noqa: E402

CLASSIFIER_ZOO = {
    'resnet50': _classifier.resnet50,
    'regnetx-600m': _classifier.regnetx_600m,
    'regnety-400m': _classifier.regnety_400m,
}


def get_cfg(name: str, num_classes: int = 20) -> str:
    """Return cfg text for a zoo model."""
    return MODEL_ZOO[name](num_classes=num_classes)


def get_classifier_cfg(name: str, num_classes: int = 1000) -> str:
    """Return cfg text for a classifier zoo model."""
    return CLASSIFIER_ZOO[name](num_classes=num_classes)
