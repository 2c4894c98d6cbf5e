"""Model export/import (reference: ``src/models/TDAVNet/base_av_model.py``:
``serialize()`` packs {model_name, state_dict, model_args,
infos.software_versions}; ``from_pretrain`` rebuilds by registry name;
``load_state_dict_in`` strips the ``audio_model.`` prefix).

The flax equivalent packs the variables pytree with
``flax.serialization.msgpack_serialize`` into a single ``best_model.ckpt``
file plus a JSON header — portable, no pickle."""
from __future__ import annotations

import json
import os
import struct
from typing import Any, Dict, Tuple

import jax
from flax import serialization


_MAGIC = b"RTFSTPU1"


def _versions() -> Dict[str, str]:
    import flax
    import optax

    return {
        "jax_version": jax.__version__,
        "flax_version": flax.__version__,
        "optax_version": optax.__version__,
    }


def serialize(model_name: str, model_args: Dict[str, Any], variables) -> bytes:
    header = json.dumps({
        "model_name": model_name,
        "model_args": model_args,
        "infos": {"software_versions": _versions()},
    }).encode()
    payload = serialization.msgpack_serialize(
        jax.tree.map(lambda x: jax.device_get(x), dict(variables))
    )
    return _MAGIC + struct.pack("<Q", len(header)) + header + payload


def save_model(path: str, model_name: str, model_args: Dict[str, Any], variables):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialize(model_name, model_args, variables))


def load_model(path: str) -> Tuple[Any, Dict[str, Any], Dict[str, Any]]:
    """-> (model, variables, header). Model rebuilt via the registry from
    the embedded model_args (reference ``from_pretrain``,
    base_av_model.py:24-34)."""
    from . import build_model

    with open(path, "rb") as f:
        blob = f.read()
    assert blob[:8] == _MAGIC, f"{path}: not an rtfs_net_tpu model file"
    (hlen,) = struct.unpack("<Q", blob[8:16])
    header = json.loads(blob[16:16 + hlen].decode())
    variables = serialization.msgpack_restore(blob[16 + hlen:])
    model = build_model(header["model_name"], **header["model_args"])
    return model, variables, header


def from_pretrain(path: str):
    model, variables, _ = load_model(path)
    return model, variables
