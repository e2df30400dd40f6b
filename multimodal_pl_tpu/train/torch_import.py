"""Torch <-> flax weight conversion for the reference model family.

Lets users of the reference bring their trained ``.pth`` checkpoints
(state_dict layout of unet3D_with_feam3/feam2, unet3D_g and the style
discriminators — train_amos_atlas_final.py:442-473) into this framework and
export back. Conventions:

- conv weights: torch (out, in, kd, kh, kw) <-> ours (kd, kh, kw, in, out)
- linear weights: torch (out, in) <-> ours (in, out)
- GroupNorm/LayerNorm: weight/bias <-> scale/bias
- nn.Sequential heads (GN, ReLU, Conv): index .0 -> gn, .2 -> conv
- feam2 class tokens are parameters in the state_dict; feam3's were plain
  tensors the reference never saved (SURVEY.md §5) — on import they fall back
  to the provided defaults.

Input is "anything torch.load would give you": a dict of arrays/tensors keyed
by state_dict names (no torch required — tensors are converted via numpy).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _conv_w(x) -> np.ndarray:
    return _np(x).transpose(2, 3, 4, 1, 0)


def _lin_w(x) -> np.ndarray:
    return _np(x).T


def _strip_module(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Drop DataParallel's 'module.' prefix (evaluate_amos.py:580 wraps)."""
    return {re.sub(r"^module\.", "", k): v for k, v in sd.items()}


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def feam_state_dict_to_params(sd: Mapping[str, Any], num_eams: int = 3):
    """unet3D_with_feam3/feam2 state_dict -> (flax params dict, tokens or None)."""
    sd = _strip_module(sd)
    p: Dict = {}
    tokens = {}

    def seq_head(torch_prefix, flax_path):
        _set(p, (*flax_path, "gn", "scale"), _np(sd[f"{torch_prefix}.0.weight"]))
        _set(p, (*flax_path, "gn", "bias"), _np(sd[f"{torch_prefix}.0.bias"]))
        _set(p, (*flax_path, "conv", "kernel"), _conv_w(sd[f"{torch_prefix}.2.weight"]))
        if f"{torch_prefix}.2.bias" in sd:
            _set(p, (*flax_path, "conv", "bias"), _np(sd[f"{torch_prefix}.2.bias"]))

    def block(torch_prefix, flax_path):
        _set(p, (*flax_path, "gn1", "scale"), _np(sd[f"{torch_prefix}.gn1.weight"]))
        _set(p, (*flax_path, "gn1", "bias"), _np(sd[f"{torch_prefix}.gn1.bias"]))
        _set(p, (*flax_path, "conv1", "kernel"), _conv_w(sd[f"{torch_prefix}.conv1.weight"]))
        _set(p, (*flax_path, "gn2", "scale"), _np(sd[f"{torch_prefix}.gn2.weight"]))
        _set(p, (*flax_path, "gn2", "bias"), _np(sd[f"{torch_prefix}.gn2.bias"]))
        _set(p, (*flax_path, "conv2", "kernel"), _conv_w(sd[f"{torch_prefix}.conv2.weight"]))
        if f"{torch_prefix}.downsample.0.weight" in sd:
            seqp = f"{torch_prefix}.downsample"
            _set(p, (*flax_path, "downsample", "gn", "scale"), _np(sd[f"{seqp}.0.weight"]))
            _set(p, (*flax_path, "downsample", "gn", "bias"), _np(sd[f"{seqp}.0.bias"]))
            _set(p, (*flax_path, "downsample", "conv", "kernel"), _conv_w(sd[f"{seqp}.2.weight"]))

    def stage(torch_prefix, flax_path):
        i = 0
        while f"{torch_prefix}.{i}.gn1.weight" in sd:
            block(f"{torch_prefix}.{i}", (*flax_path, f"block{i}"))
            i += 1

    def eam(torch_prefix, flax_path):
        _set(p, (*flax_path, "kv", "kernel"), _lin_w(sd[f"{torch_prefix}.kv.weight"]))
        _set(p, (*flax_path, "q", "kernel"), _lin_w(sd[f"{torch_prefix}.q.weight"]))
        _set(p, (*flax_path, "proj", "kernel"), _lin_w(sd[f"{torch_prefix}.proj.weight"]))
        _set(p, (*flax_path, "proj", "bias"), _np(sd[f"{torch_prefix}.proj.bias"]))
        _set(p, (*flax_path, "norm2", "scale"), _np(sd[f"{torch_prefix}.norm2.weight"]))
        _set(p, (*flax_path, "norm2", "bias"), _np(sd[f"{torch_prefix}.norm2.bias"]))
        if f"{torch_prefix}.norm3.weight" in sd:
            _set(p, (*flax_path, "norm3", "scale"), _np(sd[f"{torch_prefix}.norm3.weight"]))
            _set(p, (*flax_path, "norm3", "bias"), _np(sd[f"{torch_prefix}.norm3.bias"]))

    _set(p, ("encoder", "conv1", "kernel"), _conv_w(sd["conv1.weight"]))
    for i in range(5):
        stage(f"layer{i}", ("encoder", f"layer{i}"))
    seq_head("fusionConv", ("encoder", "fusion"))
    for name in ("x8_resb", "x4_resb", "x2_resb", "x1_resb"):
        stage(name, (name,))
    for i, name in enumerate(("deepout1", "deepout2", "deepout3")):
        seq_head(name, (name,))
    seq_head("precls_conv", ("precls",))
    for name in ("eam84", "eam42", "eam21")[:num_eams]:
        eam(name, (name,))
    for i, key in enumerate(("t1", "t2", "t3")):
        if f"class_token{i+1}" in sd:
            tokens[key] = _np(sd[f"class_token{i+1}"])
    return {"params": p}, (tokens or None)


def refiner_state_dict_to_params(sd: Mapping[str, Any]):
    """unet3D_g state_dict -> flax params (models/refiner.py). The refiner has
    no EAMs/deep heads and a flat layout: conv0/conv1 stems, layer0-4,
    fusionConv, x*_resb, precls_conv."""
    sd = _strip_module(sd)
    p: Dict = {}

    def seq_head(torch_prefix, flax_path):
        _set(p, (*flax_path, "gn", "scale"), _np(sd[f"{torch_prefix}.0.weight"]))
        _set(p, (*flax_path, "gn", "bias"), _np(sd[f"{torch_prefix}.0.bias"]))
        _set(p, (*flax_path, "conv", "kernel"), _conv_w(sd[f"{torch_prefix}.2.weight"]))
        if f"{torch_prefix}.2.bias" in sd:
            _set(p, (*flax_path, "conv", "bias"), _np(sd[f"{torch_prefix}.2.bias"]))

    def block(torch_prefix, flax_path):
        for g in ("gn1", "gn2"):
            _set(p, (*flax_path, g, "scale"), _np(sd[f"{torch_prefix}.{g}.weight"]))
            _set(p, (*flax_path, g, "bias"), _np(sd[f"{torch_prefix}.{g}.bias"]))
        for c in ("conv1", "conv2"):
            _set(p, (*flax_path, c, "kernel"), _conv_w(sd[f"{torch_prefix}.{c}.weight"]))
        if f"{torch_prefix}.downsample.0.weight" in sd:
            seq_head(f"{torch_prefix}.downsample", (*flax_path, "downsample"))

    def stage(torch_prefix, flax_path):
        i = 0
        while f"{torch_prefix}.{i}.gn1.weight" in sd:
            block(f"{torch_prefix}.{i}", (*flax_path, f"block{i}"))
            i += 1

    _set(p, ("conv0", "kernel"), _conv_w(sd["conv0.weight"]))
    _set(p, ("conv1", "kernel"), _conv_w(sd["conv1.weight"]))
    for i in range(5):
        stage(f"layer{i}", (f"layer{i}",))
    seq_head("fusionConv", ("fusion",))
    for name in ("x8_resb", "x4_resb", "x2_resb", "x1_resb"):
        stage(name, (name,))
    seq_head("precls_conv", ("precls",))
    return {"params": p}


def params_to_feam_state_dict(params: Mapping, tokens: Optional[Mapping] = None,
                              num_eams: int = 3) -> Dict[str, np.ndarray]:
    """Export flax FEAM params (+tokens) to a reference-style state_dict."""
    p = params["params"] if "params" in params else params
    sd: Dict[str, np.ndarray] = {}

    def conv_w(x):
        return np.asarray(x).transpose(4, 3, 0, 1, 2)

    def seq_head(flax_node, torch_prefix):
        sd[f"{torch_prefix}.0.weight"] = np.asarray(flax_node["gn"]["scale"])
        sd[f"{torch_prefix}.0.bias"] = np.asarray(flax_node["gn"]["bias"])
        sd[f"{torch_prefix}.2.weight"] = conv_w(flax_node["conv"]["kernel"])
        if "bias" in flax_node["conv"]:
            sd[f"{torch_prefix}.2.bias"] = np.asarray(flax_node["conv"]["bias"])

    def block(node, torch_prefix):
        sd[f"{torch_prefix}.gn1.weight"] = np.asarray(node["gn1"]["scale"])
        sd[f"{torch_prefix}.gn1.bias"] = np.asarray(node["gn1"]["bias"])
        sd[f"{torch_prefix}.conv1.weight"] = conv_w(node["conv1"]["kernel"])
        sd[f"{torch_prefix}.gn2.weight"] = np.asarray(node["gn2"]["scale"])
        sd[f"{torch_prefix}.gn2.bias"] = np.asarray(node["gn2"]["bias"])
        sd[f"{torch_prefix}.conv2.weight"] = conv_w(node["conv2"]["kernel"])
        if "downsample" in node:
            sd[f"{torch_prefix}.downsample.0.weight"] = np.asarray(node["downsample"]["gn"]["scale"])
            sd[f"{torch_prefix}.downsample.0.bias"] = np.asarray(node["downsample"]["gn"]["bias"])
            sd[f"{torch_prefix}.downsample.2.weight"] = conv_w(node["downsample"]["conv"]["kernel"])

    def stage(node, torch_prefix):
        for name, sub in sorted(node.items()):
            block(sub, f"{torch_prefix}.{name.removeprefix('block')}")

    def eam(node, torch_prefix):
        sd[f"{torch_prefix}.kv.weight"] = np.asarray(node["kv"]["kernel"]).T
        sd[f"{torch_prefix}.q.weight"] = np.asarray(node["q"]["kernel"]).T
        sd[f"{torch_prefix}.proj.weight"] = np.asarray(node["proj"]["kernel"]).T
        sd[f"{torch_prefix}.proj.bias"] = np.asarray(node["proj"]["bias"])
        sd[f"{torch_prefix}.norm2.weight"] = np.asarray(node["norm2"]["scale"])
        sd[f"{torch_prefix}.norm2.bias"] = np.asarray(node["norm2"]["bias"])
        sd[f"{torch_prefix}.norm3.weight"] = np.asarray(node["norm3"]["scale"])
        sd[f"{torch_prefix}.norm3.bias"] = np.asarray(node["norm3"]["bias"])

    sd["conv1.weight"] = conv_w(p["encoder"]["conv1"]["kernel"])
    for i in range(5):
        stage(p["encoder"][f"layer{i}"], f"layer{i}")
    seq_head(p["encoder"]["fusion"], "fusionConv")
    for name in ("x8_resb", "x4_resb", "x2_resb", "x1_resb"):
        stage(p[name], name)
    for name in ("deepout1", "deepout2", "deepout3"):
        seq_head(p[name], name)
    seq_head(p["precls"], "precls_conv")
    for name in ("eam84", "eam42", "eam21")[:num_eams]:
        eam(p[name], name)
    if tokens:
        for i, key in enumerate(("t1", "t2", "t3")):
            if key in tokens:
                sd[f"class_token{i+1}"] = np.asarray(tokens[key])
    return sd
