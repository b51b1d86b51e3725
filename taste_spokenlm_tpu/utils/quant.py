"""Weight-only int8 quantization for the serving decode path.

The AR joint decode is HBM-bandwidth-bound: every generated token re-reads
every backbone weight.  Storing the base Dense kernels as int8 with a
per-output-channel f32 scale halves that traffic; the dequant
(convert + scale) lives inside the matmul consumer (models/llama.LoraDense
quantized=True) so XLA fuses it into the dot's operand load — measured
1.66x decode tokens/sec on TPU v5e at Llama-1B shapes vs bf16 weights.

This replaces what the reference gets from fused CUDA kernels (liger /
flash-attn int8 paths); here it is a pure param-tree transformation plus a
module flag — no custom kernels.

Usage:
    cfg = cfg.replace(spoken_lm=cfg.spoken_lm.replace(
        llama=cfg.spoken_lm.llama.replace(quantized_serving=True)))
    params["spoken_lm"]["language_model"] = quantize_llama_params(
        params["spoken_lm"]["language_model"])
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

# the seven per-layer projections carrying ~80% of decode HBM traffic
_PROJ_NAMES = ("q_proj", "k_proj", "v_proj", "o_proj",
               "gate_proj", "up_proj", "down_proj")


def quantize_kernel(w, mode: str = "int8") -> Dict:
    """[in, out] float kernel -> the weight-only serving layout:
    int8: {"base_q" int8 [in, out], "base_scale" f32 [out]};
    int4: {"base_q4" uint8 [in//2, out] (nibble-packed, see
    ops/pallas/int4_matmul), "base_scale" f32 [out]}.  Symmetric
    per-output-channel scales."""
    w = jnp.asarray(w, jnp.float32)
    if mode == "int4":
        from taste_spokenlm_tpu.ops.pallas.int4_matmul import quantize_int4
        packed, scale = quantize_int4(w)   # group-wise scales [D/g, out]
        return {"base_q4": packed, "base_scale": scale}
    if mode == "int4_tiled":
        # fused-MLP second projection: packed PER-TILE along the
        # contraction dim so the fused kernel's grid streams contiguous
        # lo/hi nibble blocks (ops/pallas/fused_mlp).  Same param SHAPES
        # as the standard int4 layout — only the packing order differs.
        from taste_spokenlm_tpu.ops.pallas.fused_mlp import (
            mlp_tile, quantize_int4_tiled)
        packed, scale = quantize_int4_tiled(w, mlp_tile(w.shape[0]))
        from taste_spokenlm_tpu.ops.quantized import int4_param_shapes
        assert (packed.shape, scale.shape) == \
            int4_param_shapes(w.shape[0], w.shape[1]), \
            (packed.shape, scale.shape)
        return {"base_q4": packed, "base_scale": scale}
    amax = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / scale[None, :]), -127, 127).astype(jnp.int8)
    return {"base_q": q, "base_scale": scale}


def dequantize_kernel(qdict) -> jnp.ndarray:
    if "base_q4" in qdict:
        from taste_spokenlm_tpu.ops.pallas.int4_matmul import dequantize_int4
        return dequantize_int4(jnp.asarray(qdict["base_q4"]),
                               jnp.asarray(qdict["base_scale"]))
    return (jnp.asarray(qdict["base_q"], jnp.float32)
            * jnp.asarray(qdict["base_scale"], jnp.float32)[None, :])


def quantize_embed(table, head_mode: str = "int8") -> Dict:
    """[V, H] embedding table -> {"embedding_q" int8, "embedding_scale"
    f32 [V]} with symmetric per-row scales (ops/quantized.QEmbed layout).

    head_mode="int4" additionally emits the transposed nibble-packed head
    copy {"head_q4" uint8 [H//2, V], "head_scale4" f32} used by
    QEmbed(head_mode="int4").logits."""
    w = jnp.asarray(table, jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=1)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / scale[:, None]), -127, 127).astype(jnp.int8)
    out = {"embedding_q": q, "embedding_scale": scale}
    if head_mode == "int4":
        from taste_spokenlm_tpu.ops.pallas.int4_matmul import quantize_int4
        q4, s4 = quantize_int4(w.T)
        out["head_q4"] = q4
        out["head_scale4"] = s4
    return out


def quantize_llama_params(tree: Dict, include_embed: bool = False,
                          mode: str = "int8",
                          embed_head_mode: str = "int8",
                          fuse_qkv: bool = False,
                          fused_mlp: bool = False) -> Dict:
    """LlamaModel param tree (bf16/f32 "base" kernels) -> the
    quantized_serving layout ("base_q"/"base_scale" per projection).
    LoRA adapters, norms, and the untied lm_head stay untouched;
    `include_embed` also converts embed_tokens (and thus the tied head)
    to the QEmbed int8 layout (pair with quantized_embed_serving).

    `fuse_qkv` emits the `fused_qkv_serving` layout: q/k/v concatenated
    into one "qkv_proj" kernel and gate/up into one "gateup_proj" (pair
    with LlamaConfig.fused_qkv_serving; per-output-channel scales make the
    concat exactly equal to quantizing each projection separately).
    Requires merged adapters (merge_lora_params first).

    `fused_mlp` emits the `fused_mlp_serving` layout: gate/up/down stay
    SEPARATE (overrides the gateup half of fuse_qkv) and, in int4 mode,
    down_proj is packed per-tile for the fused kernel's grid."""
    out: Dict = {}
    for key, val in tree.items():
        if key == "embed_tokens" and include_embed:
            out[key] = quantize_embed(val["embedding"], embed_head_mode)
            continue
        if key.startswith("layers_"):
            layer_out: Dict = {}
            for sub, subtree in val.items():
                if sub in ("self_attn", "mlp"):
                    mod_out: Dict = {}
                    fuse_names = (("q_proj", "k_proj", "v_proj")
                                  if sub == "self_attn"
                                  else ("gate_proj", "up_proj"))
                    fused_name = ("qkv_proj" if sub == "self_attn"
                                  else "gateup_proj")
                    do_fuse = fuse_qkv and not (fused_mlp and sub == "mlp")
                    if do_fuse:
                        assert not any("lora_a" in subtree.get(n, {})
                                       for n in fuse_names), \
                            "fuse_qkv needs merged LoRA (merge_lora_params)"
                        kern = jnp.concatenate(
                            [jnp.asarray(subtree[n]["base"]["kernel"],
                                         jnp.float32)
                             for n in fuse_names], axis=1)
                        mod_out[fused_name] = quantize_kernel(kern, mode)
                    for proj, pt in subtree.items():
                        if do_fuse and proj in fuse_names:
                            continue
                        if proj in _PROJ_NAMES and "base" in pt:
                            pmode = mode
                            if (fused_mlp and mode == "int4"
                                    and proj == "down_proj"):
                                pmode = "int4_tiled"
                            newp = {k: v for k, v in pt.items()
                                    if k != "base"}
                            newp.update(quantize_kernel(
                                pt["base"]["kernel"], pmode))
                            mod_out[proj] = newp
                        else:
                            mod_out[proj] = pt
                    layer_out[sub] = mod_out
                else:
                    layer_out[sub] = subtree
            out[key] = layer_out
        else:
            out[key] = val
    return out


def merge_lora_params(tree: Dict, alpha: int, r: int) -> Dict:
    """LlamaModel float tree WITH LoRA adapters -> plain tree with the
    adapters merged into each base kernel (W' = W + (alpha/r) A @ B) and
    the lora_a/lora_b leaves dropped — peft `merge_and_unload` for serving
    (the reference deploys its stage-2 model with unmerged peft adapters,
    /root/reference/SpokenLM/taslm/modeling_taslm.py; merged serving skips
    the ~2 x r-rank matmuls per projection per decode step).

    Exact in float arithmetic; pair with `use_lora=False` (and quantize the
    MERGED tree).  The stage-2 in-graph frozen-base KL needs the UNMERGED
    adapters (`disable_lora=True` recovers the base model), so this is a
    serving-only transform."""
    scale = alpha / r
    out: Dict = {}
    for key, val in tree.items():
        if not key.startswith("layers_"):
            out[key] = val
            continue
        layer_out: Dict = {}
        for sub, subtree in val.items():
            if sub not in ("self_attn", "mlp"):
                layer_out[sub] = subtree
                continue
            mod_out: Dict = {}
            for proj, pt in subtree.items():
                if proj in _PROJ_NAMES and "lora_a" in pt:
                    assert "base" in pt, (
                        f"{key}/{sub}/{proj}: merge_lora_params runs on the "
                        "FLOAT tree (before quantize_llama_params)")
                    a = jnp.asarray(pt["lora_a"], jnp.float32)
                    b = jnp.asarray(pt["lora_b"], jnp.float32)
                    assert a.shape[1] == r, (a.shape, r)
                    k = jnp.asarray(pt["base"]["kernel"], jnp.float32)
                    base = dict(pt["base"], kernel=k + scale * (a @ b))
                    mod_out[proj] = {kk: vv for kk, vv in pt.items()
                                     if kk not in ("lora_a", "lora_b",
                                                   "base")}
                    mod_out[proj]["base"] = base
                else:
                    mod_out[proj] = pt
            layer_out[sub] = mod_out
        out[key] = layer_out
    return out


def _quantize_dense_leaf(pt: Dict, mode: str = "int8") -> Dict:
    """{"kernel", "bias"?} Dense params -> the QDense/QDense4 layout."""
    out = {k: v for k, v in pt.items() if k != "kernel"}
    qd = quantize_kernel(pt["kernel"], mode)
    if mode.startswith("int4"):
        out["kernel_q4"] = qd["base_q4"]
    else:
        out["kernel_q"] = qd["base_q"]
    out["scale"] = qd["base_scale"]
    return out


_ENCODER_DENSE = ("linear_q", "linear_k", "linear_v", "linear_out",
                  "linear_pos", "w_1", "w_2")


def quantize_encoder_params(tree: Dict, mode: str = "int8",
                            fuse_qkv: bool = False,
                            fused_mlp: bool = False) -> Dict:
    """ConformerEncoder param tree -> the quantized_serving layout: the
    per-layer attention/ffn Dense kernels become int8 + scale (input layers,
    norms, pos biases, conv modules untouched).

    `fuse_qkv` emits the `fused_qkv_serving` layout: linear_q/k/v
    concatenated into one "linear_qkv" (kernel, bias, and per-output-channel
    scale concat losslessly — identical math to the separate GEMVs)."""
    out: Dict = {}
    for key, val in tree.items():
        if not key.startswith("encoders_"):
            out[key] = val
            continue
        layer_out: Dict = {}
        for sub, subtree in val.items():
            if sub == "self_attn":
                att: Dict = {}
                if fuse_qkv:
                    names = ("linear_q", "linear_k", "linear_v")
                    fused = {"kernel": jnp.concatenate(
                        [jnp.asarray(subtree[n]["kernel"], jnp.float32)
                         for n in names], axis=1)}
                    if "bias" in subtree[names[0]]:
                        fused["bias"] = jnp.concatenate(
                            [jnp.asarray(subtree[n]["bias"], jnp.float32)
                             for n in names], axis=0)
                    att["linear_qkv"] = _quantize_dense_leaf(fused, mode)
                    subtree = {n: pt for n, pt in subtree.items()
                               if n not in names}
                att.update({
                    name: (_quantize_dense_leaf(pt, mode)
                           if name in _ENCODER_DENSE else pt)
                    for name, pt in subtree.items()})
                layer_out[sub] = att
            elif sub.startswith("feed_forward"):
                # fused-MLP int4 packs the second projection per-tile
                # (pair with EncoderStackConfig.fused_mlp_serving)
                def _ffn_mode(name):
                    if fused_mlp and mode == "int4" and name == "w_2":
                        return "int4_tiled"
                    return mode
                layer_out[sub] = {
                    name: (_quantize_dense_leaf(pt, _ffn_mode(name))
                           if name in _ENCODER_DENSE else pt)
                    for name, pt in subtree.items()}
            else:
                layer_out[sub] = subtree
        out[key] = layer_out
    return out


def quantization_error(tree_fp: Dict, tree_q: Dict) -> float:
    """Max relative kernel reconstruction error across quantized kernels
    (sanity metric; ~0.4% for gaussian weights)."""
    worst = 0.0
    for key, val in tree_fp.items():
        if not key.startswith("layers_"):
            continue
        for sub in ("self_attn", "mlp"):
            for proj, pt in val[sub].items():
                if proj not in _PROJ_NAMES or "base" not in pt:
                    continue
                w = np.asarray(pt["base"]["kernel"], np.float32)
                wq = np.asarray(dequantize_kernel(tree_q[key][sub][proj]))
                rel = np.abs(wq - w).max() / max(np.abs(w).max(), 1e-8)
                worst = max(worst, float(rel))
    return worst
