"""AOT serving export — the TPU-native deployment artifact.

The reference deploys by shipping ``best_model.pth`` plus the whole python
model zoo (``src/models/TDAVNet/base_av_model.py:24-51`` ``from_pretrain``
needs the class registry importable at load time). The TPU-native contract
is stronger: ``jax.export`` lowers the jitted serving function ONCE to
versioned StableHLO with the weights baked in as constants and the shapes,
dtypes and calling convention pinned. The resulting artifact

  * runs on any matching JAX/XLA runtime WITHOUT this package installed
    (``jax.export.deserialize(blob).call(mix, mouth)`` is the entire
    loader contract),
  * is immune to python-side model-zoo drift (no registry lookup, no
    config parsing at serve time),
  * carries the serving precision policy inside the graph (bf16 compute,
    f32 I/O — the measured serving configuration).

File format: ``RTFSXPT1`` magic, little-endian u64 JSON-header length, a
JSON header describing the calling convention, then the raw
``Exported.serialize()`` bytes.
"""
from __future__ import annotations

import json
import os
import struct
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jexport

_MAGIC = b"RTFSXPT1"

_DTYPES = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}


def export_serving(
    model,
    variables,
    batch_size: int,
    segment_samples: int,
    mouth_shape: Optional[Sequence[int]] = None,
    compute_dtype: Any = jnp.bfloat16,
    platforms: Optional[Sequence[str]] = None,
):
    """Lower ``model.apply`` at fixed serving shapes to an Exported.

    ``mouth_shape`` is the per-utterance mouth-embedding shape (e.g.
    ``(512, 50)``); None exports the audio-only calling convention.
    I/O stays f32; compute runs in ``compute_dtype`` (bf16 = the measured
    serving precision, 43 dB agreement with f32 — DESIGN.md).
    """
    dt = _DTYPES[compute_dtype] if isinstance(compute_dtype, str) else compute_dtype
    from .models import for_inference

    model = for_inference(model)  # unrolled repeats; identical variables

    if mouth_shape is None:
        def fn(mix):
            return model.apply(variables, mix.astype(dt)).astype(jnp.float32)

        args = (jax.ShapeDtypeStruct((batch_size, segment_samples), jnp.float32),)
    else:
        def fn(mix, mouth):
            return model.apply(
                variables, mix.astype(dt), mouth.astype(dt)
            ).astype(jnp.float32)

        args = (
            jax.ShapeDtypeStruct((batch_size, segment_samples), jnp.float32),
            jax.ShapeDtypeStruct((batch_size, *mouth_shape), jnp.float32),
        )

    kw = {}
    if platforms is not None:
        kw["platforms"] = tuple(platforms)
    return jexport.export(jax.jit(fn), **kw)(*args)


def save_serving(
    path: str,
    exported,
    batch_size: int,
    segment_samples: int,
    mouth_shape: Optional[Sequence[int]] = None,
    compute_dtype: str = "bfloat16",
    extra: Optional[Dict[str, Any]] = None,
) -> None:
    header = {
        "calling_convention": (
            "separated = f(mix_f32[B, L])" if mouth_shape is None
            else "separated = f(mix_f32[B, L], mouth_f32[B, *mouth])"
        ),
        "batch_size": int(batch_size),
        "segment_samples": int(segment_samples),
        "mouth_shape": list(mouth_shape) if mouth_shape is not None else None,
        "compute_dtype": compute_dtype,
        "platforms": list(exported.platforms),
        "stablehlo_version": getattr(exported, "calling_convention_version", None),
    }
    header.update(extra or {})
    hdr = json.dumps(header).encode()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(_MAGIC + struct.pack("<Q", len(hdr)) + hdr + bytes(exported.serialize()))


def load_serving(path: str) -> Tuple[Any, Dict[str, Any]]:
    """-> (exported, header); run with ``exported.call(mix[, mouth])``.

    Only needs jax — no rtfs_net_tpu model code, no config, no registry.
    """
    with open(path, "rb") as f:
        blob = f.read()
    assert blob[:8] == _MAGIC, f"{path}: not an rtfs_net_tpu export"
    (hlen,) = struct.unpack("<Q", blob[8:16])
    header = json.loads(blob[16:16 + hlen].decode())
    exported = jexport.deserialize(bytearray(blob[16 + hlen:]))
    return exported, header
