"""Separator registry (reference: ``src/models/separators/__init__.py``)."""
from __future__ import annotations

from .tdanet import TDANet, TDANetBlock
from .frcnn import FRCNN, FRCNNBlock
from .dpt import DPTNet, DPTNetBlock


class _IdentitySeparator:
    """Stand-in for ``separators.get(None)`` — used when a branch (e.g. the
    video net in audio-only configs) is disabled."""

    def __init__(self, *args, **kwargs):
        pass

    def get_block(self, i: int):
        return lambda x, train=False: x

    def __call__(self, x, train: bool = False):
        return x


_REGISTRY = {"TDANet": TDANet, "FRCNN": FRCNN, "DPTNet": DPTNet}


def get(identifier):
    if identifier is None:
        return _IdentitySeparator
    if callable(identifier):
        return identifier
    if isinstance(identifier, str):
        cls = _REGISTRY.get(identifier)
        if cls is None:
            raise ValueError(f"Could not interpret separator identifier: {identifier}")
        return cls
    raise ValueError(f"Could not interpret separator identifier: {identifier}")
