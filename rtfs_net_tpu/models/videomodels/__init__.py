"""Video model registry (reference:
``src/models/videomodels/__init__.py:35-50`` — case-insensitive get)."""
from __future__ import annotations

from .frcnn_videomodel import FRCNNVideoModel, AEVideoModel
from .resnet import ResNet, BasicBlock
from .shufflenetv2 import ShuffleNetV2Trunk
from .autoencoder import AE, EncoderAE, DecoderAE

_REGISTRY = {
    "frcnnvideomodel": FRCNNVideoModel,
    "aevideomodel": AEVideoModel,
}


def get(identifier):
    if identifier is None:
        return None
    if callable(identifier):
        return identifier
    if isinstance(identifier, str):
        cls = _REGISTRY.get(identifier.lower())
        if cls is None:
            raise ValueError(f"Could not interpret videomodel identifier: {identifier}")
        return cls
    raise ValueError(f"Could not interpret videomodel identifier: {identifier}")
