"""Layer registry (reference: ``src/models/layers/__init__.py``).

``get(name)`` resolves a layer_type string from a YAML config;
``build(cls_or_name, **kwargs)`` constructs it, silently dropping config
keys the module doesn't declare (the reference's modules take ``**kwargs``
for the same reason).
"""
from __future__ import annotations

import dataclasses

from .conv_blocks import (
    ConvNormAct,
    ConvActNorm,
    DepthwiseSeparableConvolution,
    FeedForwardNetwork,
    ConvolutionalRNN,
    make_norm,
    apply_norm,
)
from .rnn_blocks import (
    RNNProjection,
    DualPathRNN,
    ConvLSTMCell,
    BiLSTM2D,
    GlobalAttentionRNN,
    GlobalGALR,
)
from .mixer_blocks import MLP, Permutator
from .attention_blocks import (
    MultiHeadSelfAttention,
    MultiHeadSelfAttention2D,
    GlobalAttention,
    GlobalAttention2D,
    CBAMBlock,
    ShuffleAttention,
    CoTAttention,
    TorchMultiheadAttention,
    positional_encoding,
)
from .fusion_cells import (
    InjectionMultiSum,
    ConvLSTMFusionCell,
    ConvGRUFusionCell,
    ATTNFusionCell,
)

_REGISTRY = {
    cls.__name__: cls
    for cls in (
        ConvNormAct,
        ConvActNorm,
        DepthwiseSeparableConvolution,
        FeedForwardNetwork,
        ConvolutionalRNN,
        RNNProjection,
        DualPathRNN,
        BiLSTM2D,
        MLP,
        Permutator,
        GlobalAttentionRNN,
        GlobalGALR,
        MultiHeadSelfAttention,
        MultiHeadSelfAttention2D,
        GlobalAttention,
        GlobalAttention2D,
        CBAMBlock,
        ShuffleAttention,
        CoTAttention,
        InjectionMultiSum,
        ConvLSTMFusionCell,
        ConvGRUFusionCell,
        ATTNFusionCell,
    )
}


def get(identifier):
    if identifier is None:
        from ...ops.activations import Identity

        return Identity
    if callable(identifier):
        return identifier
    if isinstance(identifier, str):
        cls = _REGISTRY.get(identifier)
        if cls is None:
            raise ValueError(f"Could not interpret layer identifier: {identifier}")
        return cls
    raise ValueError(f"Could not interpret layer identifier: {identifier}")


def build(cls_or_name, **kwargs):
    """Instantiate a layer, keeping only kwargs that are fields of the
    module dataclass (mirrors the reference's ``**kwargs`` tolerance)."""
    cls = get(cls_or_name) if isinstance(cls_or_name, str) else cls_or_name
    if dataclasses.is_dataclass(cls):
        fields = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in kwargs.items() if k in fields}
    return cls(**kwargs)


def get_ffn(name: str):
    """FFN lookup used inside attention blocks
    (reference ``conv_layers.get``)."""
    return {
        "FeedForwardNetwork": FeedForwardNetwork,
        "ConvolutionalRNN": ConvolutionalRNN,
    }[name]
