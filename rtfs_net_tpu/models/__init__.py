"""Model registry (reference: ``src/models/__init__.py:15-42`` —
case-insensitive ``get()`` / ``register_model`` over known models)."""
from __future__ import annotations

from .avnet import AVNet

_REGISTRY = {"avnet": AVNet}


def register_model(custom_model):
    name = getattr(custom_model, "__name__", None) or type(custom_model).__name__
    if name.lower() in _REGISTRY:
        raise ValueError(f"Model {name} already registered")
    _REGISTRY[name.lower()] = custom_model
    return custom_model


def get(identifier):
    if callable(identifier):
        return identifier
    if isinstance(identifier, str):
        cls = _REGISTRY.get(identifier.lower())
        if cls is None:
            raise ValueError(f"Could not interpret model identifier: {identifier}")
        return cls
    raise ValueError(f"Could not interpret model identifier: {identifier}")
