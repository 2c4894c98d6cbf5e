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

``RTFSXPT2`` generalizes to a **bucketed multi-batch artifact**: the same
header plus a ``buckets`` list of ``{batch_size, length}`` entries followed
by one serialized Exported per bucket. A fleet loads it once and serves ANY
request batch — the loader picks the smallest bucket ≥ the request (zero-pads
the tail, slices it back off) and chunks over the largest bucket for bigger
requests. Padding dispatch is *exact*: nothing in the model mixes the batch
axis (gLN/LN4D are per-sample, attention is within-sample, the video trunk's
BatchNorm runs frozen in eval mode), so padded rows can't contaminate real
ones. Pinned shapes per bucket keep the Pallas SRU lanes backend eligible —
the reason we bucket instead of exporting a symbolic batch dimension.
"""
from __future__ import annotations

import json
import os
import struct
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jexport

_MAGIC = b"RTFSXPT1"
_MAGIC2 = b"RTFSXPT2"

_DTYPES = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}


def export_serving(
    model,
    variables,
    batch_size: int,
    segment_samples: int,
    mouth_shape: Optional[Sequence[int]] = None,
    compute_dtype: Any = jnp.bfloat16,
    platforms: Optional[Sequence[str]] = None,
    mesh_devices: int = 1,
):
    """Lower ``model.apply`` at fixed serving shapes to an Exported.

    ``mouth_shape`` is the per-utterance mouth-embedding shape (e.g.
    ``(512, 50)``); None exports the audio-only calling convention.
    I/O stays f32; compute runs in ``compute_dtype`` (bf16 = the measured
    serving precision, 43 dB agreement with f32 — DESIGN.md).

    ``mesh_devices > 1`` exports a MULTI-CHIP artifact: the serving fn is
    ``shard_map``-ped over a 1-D ``data`` mesh (batch sharded, weights
    replicated as per-shard constants). Every device runs the exact
    single-device program — nothing in the model mixes the batch axis
    (eval-mode BN uses running stats), so per-shard execution is
    numerically identical to single-device, and the Pallas SRU backend
    stays eligible (no SPMD partitioner around the mosaic custom call).
    The Exported records ``nr_devices``; loading requires that many
    devices visible.
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

    if mesh_devices > 1:
        mesh, sh = _serving_mesh(mesh_devices)
        assert batch_size % mesh_devices == 0, (
            f"batch_size {batch_size} must shard evenly over "
            f"{mesh_devices} devices")
        from jax.sharding import PartitionSpec as P

        fn = jax.shard_map(fn, mesh=mesh, in_specs=P("data"),
                           out_specs=P("data"), check_vma=False)
        jitted = jax.jit(fn, in_shardings=(sh,) * len(args), out_shardings=sh)
    else:
        jitted = jax.jit(fn)

    kw = {}
    if platforms is not None:
        kw["platforms"] = tuple(platforms)
    return jexport.export(jitted, **kw)(*args)


def _serving_mesh(n: int):
    """1-D ``data`` mesh over the first n local devices + batch sharding."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    assert len(devs) >= n, f"need {n} devices for this artifact, have {len(devs)}"
    mesh = Mesh(np.array(devs[:n]), ("data",))
    return mesh, NamedSharding(mesh, P("data"))


def _base_header(exported, segment_samples, mouth_shape, compute_dtype,
                 extra) -> Dict[str, Any]:
    header = {
        "calling_convention": (
            "separated = f(mix_f32[B, L])" if mouth_shape is None
            else "separated = f(mix_f32[B, L], mouth_f32[B, *mouth])"
        ),
        "segment_samples": int(segment_samples),
        "mouth_shape": list(mouth_shape) if mouth_shape is not None else None,
        "compute_dtype": compute_dtype,
        "platforms": list(exported.platforms),
        "nr_devices": int(getattr(exported, "nr_devices", 1)),
        "stablehlo_version": getattr(exported, "calling_convention_version", None),
    }
    header.update(extra or {})
    return header


def _write_frame(path: str, magic: bytes, header: Dict[str, Any],
                 blobs: Sequence[bytes]) -> None:
    hdr = json.dumps(header).encode()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(magic + struct.pack("<Q", len(hdr)) + hdr)
        for blob in blobs:
            f.write(blob)


def save_serving(
    path: str,
    exported,
    batch_size: int,
    segment_samples: int,
    mouth_shape: Optional[Sequence[int]] = None,
    compute_dtype: str = "bfloat16",
    extra: Optional[Dict[str, Any]] = None,
) -> None:
    header = {"batch_size": int(batch_size),
              **_base_header(exported, segment_samples, mouth_shape,
                             compute_dtype, extra)}
    _write_frame(path, _MAGIC, header, [bytes(exported.serialize())])


def save_serving_multi(
    path: str,
    exports_by_batch: Dict[int, Any],
    segment_samples: int,
    mouth_shape: Optional[Sequence[int]] = None,
    compute_dtype: str = "bfloat16",
    extra: Optional[Dict[str, Any]] = None,
) -> None:
    """Write a bucketed ``RTFSXPT2`` artifact (one Exported per batch size)."""
    sizes = sorted(exports_by_batch)
    blobs = [bytes(exports_by_batch[b].serialize()) for b in sizes]
    header = {"buckets": [{"batch_size": int(b), "length": len(blob)}
                          for b, blob in zip(sizes, blobs)],
              **_base_header(exports_by_batch[sizes[0]], segment_samples,
                             mouth_shape, compute_dtype, extra)}
    _write_frame(path, _MAGIC2, header, blobs)


def _read_frame(path: str) -> Tuple[bytes, Dict[str, Any], bytes]:
    """Parse the shared RTFSXPT framing: (magic, header, body bytes)."""
    with open(path, "rb") as f:
        blob = f.read()
    magic = blob[:8]
    assert magic in (_MAGIC, _MAGIC2), f"{path}: not an rtfs_net_tpu export"
    (hlen,) = struct.unpack("<Q", blob[8:16])
    header = json.loads(blob[16:16 + hlen].decode())
    return magic, header, blob[16 + hlen:]


def load_serving(path: str) -> Tuple[Any, Dict[str, Any]]:
    """-> (exported, header); run with ``exported.call(mix[, mouth])``.

    Only needs jax — no rtfs_net_tpu model code, no config, no registry.
    Single-bucket ``RTFSXPT1`` files only; use :func:`load_artifact` for
    the general (either-format) loader.
    """
    magic, header, body = _read_frame(path)
    assert magic == _MAGIC, f"{path}: bucketed artifact — use load_artifact"
    return jexport.deserialize(bytearray(body)), header


class ServingArtifact:
    """A loaded ``.rtfsx`` artifact that serves any request batch.

    ``artifact(mix[, mouth])`` dispatches to the smallest exported bucket
    that fits (zero-padding the tail and slicing it back off — exact, see
    module docstring) and chunks requests larger than the biggest bucket.
    Works on both formats: PT1 files behave as a single-bucket artifact.
    """

    def __init__(self, exports_by_batch: Dict[int, Any], header: Dict[str, Any]):
        assert exports_by_batch, "artifact has no buckets"
        self.exports = dict(sorted(exports_by_batch.items()))
        self.header = header
        self.batch_sizes = list(self.exports)
        self._fns: Dict[int, Any] = {}

    def _bucket_fn(self, b: int):
        """The callable for one bucket; multi-device artifacts get their
        call wrapped in a jit over the artifact's 1-D data mesh (batch
        sharded in/out), built lazily on first dispatch."""
        fn = self._fns.get(b)
        if fn is None:
            exp = self.exports[b]
            n = int(getattr(exp, "nr_devices", 1))
            if n > 1:
                _, sh = _serving_mesh(n)
                nargs = 1 if self.header.get("mouth_shape") is None else 2
                fn = jax.jit(exp.call, in_shardings=(sh,) * nargs,
                             out_shardings=sh)
            else:
                fn = exp.call
            self._fns[b] = fn
        return fn

    def __call__(self, mix, mouth=None):
        mix = np.asarray(mix)
        if mouth is not None:
            mouth = np.asarray(mouth)
            assert mouth.shape[0] == mix.shape[0], "mix/mouth batch mismatch"
        total = mix.shape[0]
        if total == 0:
            raise ValueError("empty request batch (mix.shape[0] == 0)")
        sizes = self.batch_sizes
        outs = []
        i = 0
        while i < total:
            rem = total - i
            b = next((s for s in sizes if s >= rem), sizes[-1])
            take = min(rem, b)
            pad = b - take

            def prep(a):
                chunk = a[i:i + take]
                if pad:
                    chunk = np.concatenate(
                        [chunk, np.zeros((pad,) + a.shape[1:], a.dtype)])
                return chunk

            args = (prep(mix),) if mouth is None else (prep(mix), prep(mouth))
            y = self._bucket_fn(b)(*args)
            outs.append(np.asarray(y)[:take])
            i += take
        return np.concatenate(outs) if len(outs) > 1 else outs[0]


def load_artifact(path: str) -> ServingArtifact:
    """Load either artifact format into a batch-flexible server handle.

    Only needs jax + numpy — no rtfs_net_tpu model code at serve time.
    """
    magic, header, body = _read_frame(path)
    if magic == _MAGIC:
        exports = {int(header["batch_size"]): jexport.deserialize(bytearray(body))}
    else:
        exports, off = {}, 0
        for bucket in header["buckets"]:
            n = int(bucket["length"])
            exports[int(bucket["batch_size"])] = jexport.deserialize(
                bytearray(body[off:off + n]))
            off += n
        assert off == len(body), f"{path}: trailing bytes in artifact body"
    return ServingArtifact(exports, header)
