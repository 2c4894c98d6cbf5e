"""PyTorch checkpoint -> flax pytree converters.

Imports the reference ecosystem's published weights:

  * ``load_video_backbone``: the CTCNet lip-reading backbone
    (``frcnn_128_512.backbone.pth.tar`` with ``model_state_dict`` holding
    ``frontend3D.*`` / ``trunk.*`` keys; ``tcn.*`` keys skipped — reference
    ``frcnn_videomodel.py:104-115``).

Weight layouts match by construction (this repo keeps torch conv layouts:
O,I/g,*k), so conversion is pure renaming plus BN stat splitting into the
``batch_stats`` collection.
"""
from __future__ import annotations

import re
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np


def _load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "model_state_dict" in blob:
        blob = blob["model_state_dict"]
    elif isinstance(blob, dict) and "state_dict" in blob:
        blob = blob["state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in blob.items()
            if hasattr(v, "detach")}


def _set(tree: Dict, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = jnp.asarray(value)


def load_video_backbone(path: str, variables) -> Dict[str, Any]:
    """Map the CTCNet backbone .pth.tar onto FRCNNVideoModel variables
    (resnet backbone). Returns new variables; raises if a mapped key's
    shape mismatches."""
    return convert_video_backbone(_load_torch_state_dict(path), variables)


def convert_video_backbone(sd: Dict[str, np.ndarray], variables,
                           backbone_type: str = "resnet") -> Dict[str, Any]:
    """Map a reference FRCNNVideoModel state dict (in memory) onto our
    FRCNNVideoModel variables. Handles the resnet and shufflenet trunks
    (reference ``frcnn_videomodel.py:28-39``)."""
    params = {k: v for k, v in _tree_copy(variables["params"]).items()}
    stats = _tree_copy(variables.get("batch_stats", {}))

    key_map = (_video_key_map if backbone_type == "resnet"
               else _shufflenet_key_map)
    for key, val in sd.items():
        if key.startswith("tcn") or key.endswith("num_batches_tracked"):
            continue
        path_map = key_map(key)
        if path_map is None:
            continue
        collection, fpath = path_map
        tree = params if collection == "params" else stats
        _check_and_set(tree, fpath, val, key)

    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


def _check_and_set(tree, fpath, val, torch_key):
    node = tree
    for p in fpath[:-1]:
        if p not in node:
            raise KeyError(f"{torch_key}: no flax node {'/'.join(fpath)}")
        node = node[p]
    leaf = fpath[-1]
    if leaf not in node:
        raise KeyError(f"{torch_key}: no flax leaf {'/'.join(fpath)}")
    cur = node[leaf]
    val = np.asarray(val)
    if tuple(cur.shape) != tuple(val.shape):
        raise ValueError(
            f"{torch_key}: shape {val.shape} != flax {'/'.join(fpath)} {cur.shape}"
        )
    node[leaf] = jnp.asarray(val)


def _video_key_map(key: str):
    """torch key -> ('params'|'batch_stats', path tuple) or None."""
    m = re.match(r"frontend3D\.(\d+)\.(.+)", key)
    if m:
        idx, leaf = int(m.group(1)), m.group(2)
        if idx == 0 and leaf == "weight":
            return "params", ("frontend_conv", "weight")
        if idx == 1:
            return {
                "weight": ("params", ("frontend_bn", "scale")),
                "bias": ("params", ("frontend_bn", "bias")),
                "running_mean": ("batch_stats", ("frontend_bn", "mean")),
                "running_var": ("batch_stats", ("frontend_bn", "var")),
            }.get(leaf)
        if idx == 2 and leaf == "weight":
            return "params", ("frontend_prelu", "alpha")
        return None
    m = re.match(r"trunk\.layer(\d)\.(\d)\.(.+)", key)
    if m:
        layer, block, rest = m.group(1), m.group(2), m.group(3)
        base = (f"layer{layer}_{block}",)
        table = {
            "conv1.weight": ("params", base + ("cbn1", "conv", "weight")),
            "bn1.weight": ("params", base + ("cbn1", "bn", "scale")),
            "bn1.bias": ("params", base + ("cbn1", "bn", "bias")),
            "bn1.running_mean": ("batch_stats", base + ("cbn1", "bn", "mean")),
            "bn1.running_var": ("batch_stats", base + ("cbn1", "bn", "var")),
            "conv2.weight": ("params", base + ("cbn2", "conv", "weight")),
            "bn2.weight": ("params", base + ("cbn2", "bn", "scale")),
            "bn2.bias": ("params", base + ("cbn2", "bn", "bias")),
            "bn2.running_mean": ("batch_stats", base + ("cbn2", "bn", "mean")),
            "bn2.running_var": ("batch_stats", base + ("cbn2", "bn", "var")),
            "relu1.weight": ("params", base + ("relu1", "alpha")),
            "relu2.weight": ("params", base + ("relu2", "alpha")),
            "downsample.0.weight": ("params", base + ("downsample", "conv", "weight")),
            "downsample.1.weight": ("params", base + ("downsample", "bn", "scale")),
            "downsample.1.bias": ("params", base + ("downsample", "bn", "bias")),
            "downsample.1.running_mean": ("batch_stats", base + ("downsample", "bn", "mean")),
            "downsample.1.running_var": ("batch_stats", base + ("downsample", "bn", "var")),
        }
        hit = table.get(rest)
        if hit is None:
            return None
        coll, p = hit
        return coll, ("trunk",) + p
    return None


def _bn_leaf(base, leaf):
    return {
        "weight": ("params", base + ("bn", "scale")),
        "bias": ("params", base + ("bn", "bias")),
        "running_mean": ("batch_stats", base + ("bn", "mean")),
        "running_var": ("batch_stats", base + ("bn", "var")),
    }.get(leaf)


def _shufflenet_key_map(key: str):
    """Reference shufflenet trunk = Sequential(features, conv_last,
    globalpool) (``frcnn_videomodel.py:35-37``); torch keys
    ``trunk.0.{idx}.banch{1,2}.{i}.*`` / ``trunk.1.{0,1}.*`` map onto our
    ``trunk/features{idx}/b*`` / ``trunk/conv_last`` modules.

    Sequential index -> sub-block (shufflenetv2.py:46-84):
      banch1: 0 dw-conv, 1 bn, 2 pw-linear conv, 3 bn
      banch2: 0 pw conv, 1 bn, 3 dw conv, 4 bn, 5 pw-linear conv, 6 bn
    """
    if key.startswith("frontend3D"):
        return _video_key_map(key)
    m = re.match(r"trunk\.0\.(\d+)\.banch(\d)\.(\d+)\.(.+)", key)
    if m:
        idx, branch, i, leaf = (int(m.group(1)), int(m.group(2)),
                                int(m.group(3)), m.group(4))
        if branch == 1:
            sub = {0: "b1_dw", 1: "b1_dw", 2: "b1_pwl", 3: "b1_pwl"}.get(i)
            conv_indices = (0, 2)
        else:
            sub = {0: "b2_pw", 1: "b2_pw", 3: "b2_dw", 4: "b2_dw",
                   5: "b2_pwl", 6: "b2_pwl"}.get(i)
            conv_indices = (0, 3, 5)
        if sub is None:
            return None
        base = ("trunk", f"features{idx}", sub)
        if leaf == "weight" and i in conv_indices:
            return "params", base + ("conv", "weight")
        hit = _bn_leaf((), leaf)
        if hit is None:
            return None
        coll, p = hit
        return coll, base + p[-2:]
    m = re.match(r"trunk\.1\.(\d+)\.(.+)", key)
    if m:
        i, leaf = int(m.group(1)), m.group(2)
        base = ("trunk", "conv_last")
        if i == 0 and leaf == "weight":
            return "params", base + ("conv", "weight")
        if i == 1:
            hit = _bn_leaf((), leaf)
            if hit is None:
                return None
            coll, p = hit
            return coll, base + p[-2:]
    return None


def _tree_copy(tree):
    if isinstance(tree, dict) or hasattr(tree, "items"):
        return {k: _tree_copy(v) for k, v in tree.items()}
    return tree
