"""Import the ACTUAL reference source (/root/reference/src/models) for
ground-truth parity tests.

The reference model code is pure torch except for four import-time
dependencies that aren't installed here; each is shimmed with a minimal
stand-in BEFORE the import:

  * ``timm.models.layers.DropPath`` (conv_layers.py:5, attention.py:6) —
    stochastic depth; identity in eval mode, which is all the parity
    tests use. A faithful train-mode version is provided anyway.
  * ``sru.SRU`` (rnn_layers.py:6) — CUDA-only package; a raising stub.
    rnn_type=SRU variants are covered by replica tests elsewhere
    (tests/test_layers.py); LSTM/GRU/Attn run the real reference code.
  * ``thop.profile`` (models/utils/utils.py:5) — MACs profiler, only
    feeds the printed table; returns zeros.
  * ``pytorch_lightning`` (base_av_model.py:4) — only ``__version__``
    is touched by the model code.

The package is loaded under the name ``refmodels`` via importlib with
submodule search locations so its relative imports resolve without
polluting ``models``/``src`` namespaces.
"""
from __future__ import annotations

import importlib.util
import os
import sys
import types

REF_ROOT = "/root/reference"
REF_MODELS = os.path.join(REF_ROOT, "src", "models")

_cache = {}


def _install_shims():
    import torch
    import torch.nn as nn

    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        tmod = types.ModuleType("timm.models")
        tlay = types.ModuleType("timm.models.layers")

        class DropPath(nn.Module):
            def __init__(self, drop_prob=0.0):
                super().__init__()
                self.drop_prob = float(drop_prob or 0.0)

            def forward(self, x):
                if self.drop_prob == 0.0 or not self.training:
                    return x
                keep = 1.0 - self.drop_prob
                shape = (x.shape[0],) + (1,) * (x.ndim - 1)
                mask = torch.empty(shape, device=x.device).bernoulli_(keep)
                return x * mask / keep

        tlay.DropPath = DropPath
        tmod.layers = tlay
        timm.models = tmod
        sys.modules.update({"timm": timm, "timm.models": tmod,
                            "timm.models.layers": tlay})

    if "sru" not in sys.modules:
        srum = types.ModuleType("sru")

        class SRU(nn.Module):
            def __init__(self, *a, **k):
                raise RuntimeError(
                    "sru is CUDA-only and not installed; use rnn_type "
                    "LSTM/GRU/Attn for reference-parity runs")

        srum.SRU = SRU
        sys.modules["sru"] = srum

    if "thop" not in sys.modules:
        thopm = types.ModuleType("thop")
        thopm.profile = lambda *a, **k: (0.0, 0.0)
        sys.modules["thop"] = thopm

    if "pytorch_lightning" not in sys.modules:
        ptl = types.ModuleType("pytorch_lightning")
        ptl.__version__ = "shim"
        ptl.LightningModule = nn.Module
        sys.modules["pytorch_lightning"] = ptl


def load_reference_models():
    """Import and return the reference ``src/models`` package (cached).
    Raises FileNotFoundError when /root/reference isn't mounted."""
    if "mod" in _cache:
        return _cache["mod"]
    init = os.path.join(REF_MODELS, "__init__.py")
    if not os.path.exists(init):
        raise FileNotFoundError(init)
    _install_shims()
    spec = importlib.util.spec_from_file_location(
        "refmodels", init, submodule_search_locations=[REF_MODELS])
    mod = importlib.util.module_from_spec(spec)
    sys.modules["refmodels"] = mod
    spec.loader.exec_module(mod)
    # the reference only re-exports AVNet; pull in the subpackages the
    # parity tests touch directly
    mod.videomodels = importlib.import_module("refmodels.videomodels")
    mod.layers = importlib.import_module("refmodels.layers")
    _cache["mod"] = mod
    return mod


def reference_config(name: str) -> dict:
    """Load one of the reference repo's own YAML configs."""
    import yaml

    with open(os.path.join(REF_ROOT, "config", name)) as f:
        return yaml.safe_load(f)
