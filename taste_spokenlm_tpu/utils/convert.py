"""PyTorch/HF checkpoint -> JAX parameter-tree conversion.

One-time weight importers for the external pretrained assets the framework
consumes (whisper-large-v3 / distil-large-v3, Llama-3.2-1B, CosyVoice
flow/hift — SURVEY.md L0).  The flax modules in models/ intentionally mirror
HF parameter names, so conversion is a mechanical rename + transpose.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().float().numpy()
    return np.asarray(x)


def _set(tree: Dict, path: list, value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def whisper_encoder_params(state_dict: Mapping[str, "np.ndarray"],
                           prefix: str = "") -> Dict:
    """HF WhisperEncoder state dict -> flax param tree for models.whisper.WhisperEncoder."""
    tree: Dict = {}
    for name, w in state_dict.items():
        if prefix and not name.startswith(prefix):
            continue
        name = name[len(prefix):]
        w = _np(w)
        parts = name.split(".")
        if parts[0] in ("conv1", "conv2"):
            if parts[1] == "weight":  # [out, in, k] -> [k, in, out]
                _set(tree, [parts[0], "kernel"], w.transpose(2, 1, 0))
            else:
                _set(tree, [parts[0], "bias"], w)
        elif parts[0] == "embed_positions":
            tree["embed_positions"] = w
        elif parts[0] == "layer_norm":
            _set(tree, ["layer_norm", {"weight": "scale", "bias": "bias"}[parts[1]]], w)
        elif parts[0] == "layers":
            i, sub = parts[1], parts[2:]
            _set_layer(tree, f"layers_{i}", sub, w)
    return tree


def whisper_decoder_params(state_dict: Mapping[str, "np.ndarray"],
                           prefix: str = "") -> Dict:
    tree: Dict = {}
    for name, w in state_dict.items():
        if prefix and not name.startswith(prefix):
            continue
        name = name[len(prefix):]
        w = _np(w)
        parts = name.split(".")
        if parts[0] == "embed_tokens":
            _set(tree, ["embed_tokens", "embedding"], w)
        elif parts[0] == "embed_positions":
            _set(tree, ["embed_positions", "embedding"], w)
        elif parts[0] == "layer_norm":
            _set(tree, ["layer_norm", {"weight": "scale", "bias": "bias"}[parts[1]]], w)
        elif parts[0] == "layers":
            i, sub = parts[1], parts[2:]
            _set_layer(tree, f"layers_{i}", sub, w)
    return tree


def llama_params(state_dict: Mapping[str, "np.ndarray"],
                 prefix: str = "model.") -> Dict:
    """HF LlamaModel state dict -> flax param tree for models.llama.LlamaModel.

    Base projections land under `<proj>.base.kernel` (the LoRA wrapper's base
    path); LoRA adapters, if any, are freshly initialized by the model.
    """
    tree: Dict = {}
    for name, w in state_dict.items():
        if prefix and not name.startswith(prefix):
            continue
        name = name[len(prefix):]
        w = _np(w)
        parts = name.split(".")
        if parts[0] == "embed_tokens":
            _set(tree, ["embed_tokens", "embedding"], w)
        elif parts[0] == "norm":
            _set(tree, ["norm", "weight"], w)
        elif parts[0] == "layers":
            i = parts[1]
            lk = f"layers_{i}"
            if parts[2] in ("input_layernorm", "post_attention_layernorm"):
                _set(tree, [lk, parts[2], "weight"], w)
            elif parts[2] in ("self_attn", "mlp"):
                proj = parts[3]
                _set(tree, [lk, parts[2], proj, "base", "kernel"], w.T)
            else:
                raise KeyError(name)
        elif parts[0] == "rotary_emb":
            continue
    return tree


def _set_layer(tree: Dict, layer_key: str, sub: list, w: np.ndarray):
    """Handle one encoder/decoder transformer-layer parameter."""
    if sub[0] in ("self_attn", "encoder_attn"):
        proj, kind = sub[1], sub[2]
        if kind == "weight":
            _set(tree, [layer_key, sub[0], proj, "kernel"], w.T)
        else:
            _set(tree, [layer_key, sub[0], proj, "bias"], w)
    elif sub[0] in ("fc1", "fc2"):
        if sub[1] == "weight":
            _set(tree, [layer_key, sub[0], "kernel"], w.T)
        else:
            _set(tree, [layer_key, sub[0], "bias"], w)
    elif sub[0].endswith("layer_norm"):
        _set(tree, [layer_key, sub[0], {"weight": "scale", "bias": "bias"}[sub[1]]], w)
    else:
        raise KeyError(f"unhandled whisper layer param: {layer_key}.{'.'.join(sub)}")
