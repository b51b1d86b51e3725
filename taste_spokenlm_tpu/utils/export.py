"""JAX parameter-tree -> reference-named torch-layout state dicts.

The EXPORT direction of checkpoint conversion — the exact inverse of
utils/convert.py — so anything trained in this framework can be loaded by
the reference taste_speech stack (or cross-checked in torch).  Counterpart
of the reference's own export path
(/root/reference/STAGE1_TRAIN/CosyVoice/examples/emilia/taste/convert_to_hf_compatible.py,
referenced from STAGE1_TRAIN/README.md:101), generalized to the full
composite: whisper tower, RVQ (incl. codebook EMA buffers), speech decoder,
llama (+LoRA in peft naming), bridges, flow, HiFT, and Taslm.

All functions return plain ``{torch_name: np.ndarray}`` dicts in torch
layouts (Linear weights transposed back to [out, in], convs back to
channels-first); wrap values in ``torch.from_numpy`` to ``load_state_dict``
them.  int8 serving layouts (utils/quant) are dequantized back to float on
export.  HiFT's weight-norm convs are emitted as ``(weight_g, weight_v)``
pairs with ``v = w`` and ``g = ||w||`` — the torch weight-norm forward then
reproduces the collapsed weight exactly.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import numpy as np


def _np(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32) if np.issubdtype(
        np.asarray(x).dtype, np.floating) else np.asarray(x)


def _dequant_int4(packed: np.ndarray, scale: np.ndarray) -> np.ndarray:
    """Pure-numpy inverse of ops/pallas/int4_matmul.quantize_int4
    (export must not initialize the JAX backend): packed [D//2, N] uint8
    (lo nibble = row d, hi nibble = row d + D//2, two's complement) +
    group-wise scales [D/g, N] -> [D, N] f32."""
    b = packed.astype(np.int16)
    lo = (b & 15).astype(np.int8)
    hi = ((b >> 4) & 15).astype(np.int8)
    lo = np.where(lo >= 8, lo - 16, lo)
    hi = np.where(hi >= 8, hi - 16, hi)
    q = np.concatenate([lo, hi], axis=0).astype(np.float32)
    D, N = q.shape
    n_g = scale.shape[0]
    g = D // n_g
    return (q.reshape(n_g, g, N) * scale[:, None, :]).reshape(D, N)


def _dense_weight(p: Mapping) -> np.ndarray:
    """flax Dense params -> torch Linear weight [out, in]; dequantizes the
    quantized serving layouts (LoraDense base_q/base_q4 + base_scale,
    QDense kernel_q/scale, QDense4 kernel_q4/scale)."""
    if "base_q4" in p:
        return _dequant_int4(_np(p["base_q4"]), _np(p["base_scale"])).T
    if "kernel_q4" in p:
        return _dequant_int4(_np(p["kernel_q4"]), _np(p["scale"])).T
    if "base_q" in p:
        return (_np(p["base_q"]).astype(np.float32)
                * _np(p["base_scale"])[None, :]).T
    if "kernel_q" in p:
        return (_np(p["kernel_q"]).astype(np.float32)
                * _np(p["scale"])[None, :]).T
    if "base" in p:       # LoraDense float base
        return _np(p["base"]["kernel"]).T
    return _np(p["kernel"]).T


def _embed_table(p: Mapping) -> np.ndarray:
    """flax Embed / QEmbed params -> torch embedding weight [V, H]."""
    if "embedding_q" in p:
        return (_np(p["embedding_q"]).astype(np.float32)
                * _np(p["embedding_scale"])[:, None])
    return _np(p["embedding"])


def _conv1d(p: Mapping) -> np.ndarray:
    """flax Conv kernel [k, in, out] -> torch Conv1d weight [out, in, k]."""
    return _np(p["kernel"]).transpose(2, 1, 0)


def _put_dense(out: Dict, base: str, p: Mapping):
    out[f"{base}.weight"] = _dense_weight(p)
    if "bias" in p:
        out[f"{base}.bias"] = _np(p["bias"])


def _put_norm(out: Dict, base: str, p: Mapping):
    """flax LayerNorm {scale, bias} -> torch {weight, bias}."""
    out[f"{base}.weight"] = _np(p["scale"])
    if "bias" in p:
        out[f"{base}.bias"] = _np(p["bias"])


def _put_conv(out: Dict, base: str, p: Mapping):
    out[f"{base}.weight"] = _conv1d(p)
    if "bias" in p:
        out[f"{base}.bias"] = _np(p["bias"])


# ---------------------------------------------------------------------------
# whisper (inverse of convert.whisper_{encoder,decoder}_params)
# ---------------------------------------------------------------------------


def whisper_encoder_state(tree: Mapping, prefix: str = "") -> Dict:
    """flax WhisperEncoder tree -> HF WhisperEncoder state dict."""
    out: Dict = {}
    for name, sub in tree.items():
        if name in ("conv1", "conv2"):
            out[f"{prefix}{name}.weight"] = _conv1d(sub)
            if "bias" in sub:
                out[f"{prefix}{name}.bias"] = _np(sub["bias"])
        elif name == "embed_positions":
            out[f"{prefix}embed_positions.weight"] = _np(sub)
        elif name == "layer_norm":
            _put_norm(out, f"{prefix}layer_norm", sub)
        elif name.startswith("layers_"):
            i = name.split("_")[-1]
            _export_whisper_layer(out, f"{prefix}layers.{i}", sub)
        else:
            raise KeyError(f"unhandled whisper encoder param: {name}")
    return out


def whisper_decoder_state(tree: Mapping, prefix: str = "") -> Dict:
    out: Dict = {}
    for name, sub in tree.items():
        if name in ("embed_tokens", "embed_positions"):
            out[f"{prefix}{name}.weight"] = _embed_table(sub)
        elif name == "layer_norm":
            _put_norm(out, f"{prefix}layer_norm", sub)
        elif name.startswith("layers_"):
            i = name.split("_")[-1]
            _export_whisper_layer(out, f"{prefix}layers.{i}", sub)
        else:
            raise KeyError(f"unhandled whisper decoder param: {name}")
    return out


def _export_whisper_layer(out: Dict, base: str, layer: Mapping):
    for mod, sub in layer.items():
        if mod in ("self_attn", "encoder_attn"):
            for proj, p in sub.items():
                _put_dense(out, f"{base}.{mod}.{proj}", p)
        elif mod in ("fc1", "fc2"):
            _put_dense(out, f"{base}.{mod}", sub)
        elif mod.endswith("layer_norm"):
            _put_norm(out, f"{base}.{mod}", sub)
        else:
            raise KeyError(f"unhandled whisper layer param: {base}.{mod}")


# ---------------------------------------------------------------------------
# llama (inverse of convert.llama_params / convert.peft_llama_params)
# ---------------------------------------------------------------------------


def llama_state(tree: Mapping, prefix: str = "model.",
                peft: Optional[bool] = None) -> Dict:
    """flax LlamaModel tree -> HF Llama state dict.

    ``peft=None`` auto-detects: when any LoRA adapter is present the peft
    key scheme is emitted (``base_layer.weight`` / ``lora_A.default.weight``
    — loadable by get_peft_model-wrapped references, with prefix e.g.
    ``base_model.model.model.``); otherwise plain HF names.  int8
    serving kernels/embeddings dequantize back to float.
    """
    if peft is None:
        peft = any(
            "lora_a" in proj
            for name, layer in tree.items() if name.startswith("layers_")
            for mod in ("self_attn", "mlp") if mod in layer
            for proj in layer[mod].values())
    out: Dict = {}
    for name, sub in tree.items():
        if name == "embed_tokens":
            out[f"{prefix}embed_tokens.weight"] = _embed_table(sub)
        elif name == "norm":
            out[f"{prefix}norm.weight"] = _np(sub["weight"])
        elif name == "lm_head_kernel":
            head_key = prefix[: -len("model.")] + "lm_head.weight"
            out[head_key] = _np(sub).T
        elif name.startswith("layers_"):
            i = name.split("_")[-1]
            base = f"{prefix}layers.{i}"
            for mod, msub in sub.items():
                if mod in ("input_layernorm", "post_attention_layernorm"):
                    out[f"{base}.{mod}.weight"] = _np(msub["weight"])
                elif mod in ("self_attn", "mlp"):
                    for proj, p in msub.items():
                        pb = f"{base}.{mod}.{proj}"
                        w = _dense_weight(p)
                        if peft:
                            out[f"{pb}.base_layer.weight"] = w
                            if "lora_a" in p:
                                out[f"{pb}.lora_A.default.weight"] = \
                                    _np(p["lora_a"]).T
                                out[f"{pb}.lora_B.default.weight"] = \
                                    _np(p["lora_b"]).T
                        else:
                            out[f"{pb}.weight"] = w
                else:
                    raise KeyError(f"unhandled llama param: {base}.{mod}")
        else:
            raise KeyError(f"unhandled llama param: {name}")
    return out


# ---------------------------------------------------------------------------
# RVQ (inverse of convert.rvq_state)
# ---------------------------------------------------------------------------


def rvq_state_dict(params: Mapping, quantizer: Mapping, prefix: str) -> Dict:
    """(flax RVQ params, "quantizer" collection) -> vendored
    vector-quantize-pytorch ResidualVQ state dict: project_in/out Linears +
    layers.{i}._codebook.{embed, embed_avg, cluster_size, initted} with the
    leading [1, ...] codebook-head dim restored."""
    out: Dict = {}
    for name in ("project_in", "project_out"):
        if name in params:
            _put_dense(out, f"{prefix}{name}", params[name])
    embed = _np(quantizer["embed"])                 # [L, K, D]
    avg = _np(quantizer.get("embed_avg", embed))
    cs = _np(quantizer.get(
        "cluster_size", np.ones(embed.shape[:2], np.float32)))  # [L, K]
    initted = bool(np.asarray(quantizer.get("initted", True)))
    for i in range(embed.shape[0]):
        base = f"{prefix}layers.{i}._codebook"
        out[f"{base}.embed"] = embed[i][None]
        out[f"{base}.embed_avg"] = avg[i][None]
        out[f"{base}.cluster_size"] = cs[i][None]
        out[f"{base}.initted"] = np.asarray([initted], np.float32)
    return out


# ---------------------------------------------------------------------------
# conformer (inverse of convert.conformer_params)
# ---------------------------------------------------------------------------


def conformer_state(tree: Mapping, prefix: str,
                    batch_stats: Optional[Mapping] = None) -> Dict:
    """flax ConformerEncoder tree -> CosyVoice encoder state dict.  BatchNorm
    running stats come from the flax 'batch_stats' collection subtree when
    supplied (cnn_module_norm='batch_norm')."""
    out: Dict = {}
    for name, sub in tree.items():
        if name == "embed_linear":
            _put_dense(out, f"{prefix}embed.out.0", sub)
        elif name == "embed_norm":
            _put_norm(out, f"{prefix}embed.out.1", sub)
        elif name in ("conv_0", "conv_2", "conv_4"):
            # conv stems: Conv1dSubsampling2 / Conv2dSubsampling* layouts
            # (subsampling.py:116-337)
            k = _np(sub["kernel"])
            w = (k.transpose(3, 2, 0, 1) if k.ndim == 4     # [kh,kw,in,out]
                 else k.transpose(2, 1, 0))                 # [k,in,out]
            i = name.split("_")[-1]
            out[f"{prefix}embed.conv.{i}.weight"] = w
            if "bias" in sub:
                out[f"{prefix}embed.conv.{i}.bias"] = _np(sub["bias"])
        elif name in ("out_0", "linear"):
            _put_dense(
                out,
                f"{prefix}embed.out.0" if name == "out_0"
                else f"{prefix}embed.linear", sub)
        elif name == "after_norm":
            _put_norm(out, f"{prefix}after_norm", sub)
        elif name.startswith("encoders_"):
            i = name.split("_")[-1]
            bs = None
            if batch_stats is not None and name in batch_stats:
                bs = batch_stats[name]
            _export_conformer_layer(out, f"{prefix}encoders.{i}", sub, bs)
        else:
            raise KeyError(f"unhandled conformer param: {name}")
    return out


def _export_conformer_layer(out: Dict, base: str, layer: Mapping,
                            batch_stats: Optional[Mapping]):
    for mod, sub in layer.items():
        if mod == "self_attn":
            for p_name, p in sub.items():
                if p_name in ("pos_bias_u", "pos_bias_v"):
                    out[f"{base}.self_attn.{p_name}"] = _np(p)
                else:
                    _put_dense(out, f"{base}.self_attn.{p_name}", p)
        elif mod in ("feed_forward", "feed_forward_macaron"):
            for p_name, p in sub.items():
                _put_dense(out, f"{base}.{mod}.{p_name}", p)
        elif mod in ("norm1", "norm2", "norm_mha", "norm_ff",
                     "norm_ff_macaron", "norm_conv", "norm_final"):
            _put_norm(out, f"{base}.{mod}", sub)
        elif mod == "conv_module":
            for p_name, p in sub.items():
                if p_name == "norm":
                    _put_norm(out, f"{base}.conv_module.norm", p)
                else:
                    _put_conv(out, f"{base}.conv_module.{p_name}", p)
            if batch_stats is not None and "conv_module" in batch_stats:
                bn = batch_stats["conv_module"]["norm"]
                out[f"{base}.conv_module.norm.running_mean"] = _np(bn["mean"])
                out[f"{base}.conv_module.norm.running_var"] = _np(bn["var"])
                out[f"{base}.conv_module.norm.num_batches_tracked"] = \
                    np.asarray(0, np.int64)
        else:
            raise KeyError(f"unhandled conformer layer param: {base}.{mod}")


# ---------------------------------------------------------------------------
# speech decoder (inverse of convert.speech_decoder_params)
# ---------------------------------------------------------------------------


def speech_decoder_state(tree: Mapping,
                         prefix: str = "speech_decoder.") -> Dict:
    """flax TasteSpeechDecoder tree -> reference TasteSpeechDecoder state
    dict (modeling_taste.py:214-340 module names)."""
    out: Dict = {}
    for name, sub in tree.items():
        if name in ("text_embedding", "llm_embedding", "speech_embedding"):
            out[f"{prefix}{name}.weight"] = _embed_table(sub)
        elif name in ("text_encoder_affine_layer",
                      "audio_token_encoder_affine_layer",
                      "audio_embed_affine_layer",
                      "spk_embed_affine_layer", "llm_decoder"):
            _put_dense(out, f"{prefix}{name}", sub)
        elif name == "fuse_weights":
            out[f"{prefix}fuse_encoded_audio_text_module.weights"] = _np(sub)
        elif name in ("text_encoder", "audio_token_encoder", "llm"):
            out.update(conformer_state(sub, f"{prefix}{name}."))
        else:
            raise KeyError(f"unhandled speech decoder param: {name}")
    return out


# ---------------------------------------------------------------------------
# HiFT (inverse of convert.hift_params)
# ---------------------------------------------------------------------------


def _put_weight_norm_conv(out: Dict, base: str, p: Mapping,
                          transpose: bool = False):
    """Emit a torch weight-norm (weight_g, weight_v) pair whose collapsed
    weight equals ours exactly: v = w, g = ||w|| over all dims but 0."""
    k = _np(p["kernel"])
    w = k.transpose(2, 1, 0)       # ConvT: [k,out,in]->[in,out,k]; Conv: same
    axes = tuple(range(1, w.ndim))
    out[f"{base}.weight_g"] = np.sqrt(
        np.sum(w * w, axis=axes, keepdims=True)).astype(np.float32)
    out[f"{base}.weight_v"] = w
    if "bias" in p:
        out[f"{base}.bias"] = _np(p["bias"])
    del transpose  # both conv kinds invert with the same transpose(2,1,0)


def hift_state(tree: Mapping, prefix: str = "hift.") -> Dict:
    """flax HiFTGenerator tree -> HiFTNet torch state dict (weight-norm
    pairs synthesized so the collapsed weights round-trip exactly)."""
    out: Dict = {}
    for name, sub in tree.items():
        if name in ("conv_pre", "conv_post"):
            _put_weight_norm_conv(out, f"{prefix}{name}", sub)
        elif name.startswith("ups_"):
            i = name.split("_")[-1]
            _put_weight_norm_conv(out, f"{prefix}ups.{i}", sub,
                                  transpose=True)
        elif name.startswith("source_downs_"):
            i = name.split("_")[-1]
            _put_weight_norm_conv(out, f"{prefix}source_downs.{i}", sub)
        elif name.startswith("source_resblocks_"):
            i = name.split("_")[-1]
            _export_resblock(out, f"{prefix}source_resblocks.{i}", sub)
        elif name.startswith("resblocks_"):
            up_idx, k_idx = name.split("_")[1:]
            # flat torch index: j = up_idx * num_kernels + k_idx; the caller
            # keys resblocks_{u}_{k}, num_kernels is recovered on assembly
            out.setdefault("__resblocks__", {})[(int(up_idx), int(k_idx))] = sub
        elif name == "source_linear":
            out[f"{prefix}m_source.l_linear.weight"] = _dense_weight(sub)
            if "bias" in sub:
                out[f"{prefix}m_source.l_linear.bias"] = _np(sub["bias"])
        elif name == "f0_predictor":
            for p_name, p in sub.items():
                if p_name.startswith("cond_"):
                    k = int(p_name.split("_")[-1])
                    _put_weight_norm_conv(
                        out, f"{prefix}f0_predictor.condnet.{k * 2}", p)
                elif p_name == "classifier":
                    _put_dense(out, f"{prefix}f0_predictor.classifier", p)
                else:
                    raise KeyError(f"unhandled f0_predictor param: {p_name}")
        else:
            raise KeyError(f"unhandled hift param: {name}")
    rb = out.pop("__resblocks__", {})
    if rb:
        num_kernels = max(k for _, k in rb) + 1
        for (u, k), sub in rb.items():
            _export_resblock(out, f"{prefix}resblocks.{u * num_kernels + k}",
                             sub)
    return out


def _export_resblock(out: Dict, base: str, block: Mapping):
    for name, p in block.items():
        if name.startswith("conv1_") or name.startswith("conv2_"):
            which, i = name.split("_")
            _put_weight_norm_conv(out, f"{base}.convs{which[-1]}.{i}", p)
        elif name.startswith("alpha1_") or name.startswith("alpha2_"):
            which, i = name.split("_")
            out[f"{base}.activations{which[-1]}.{i}.alpha"] = \
                _np(p).reshape(1, -1, 1)
        else:
            raise KeyError(f"unhandled resblock param: {base}.{name}")


# ---------------------------------------------------------------------------
# flow / CFM estimator (inverse of convert.flow_params / estimator_params)
# ---------------------------------------------------------------------------


def _put_groupnorm(out: Dict, base: str, p: Mapping):
    out[f"{base}.weight"] = _np(p["scale"])
    out[f"{base}.bias"] = _np(p["bias"])


def _export_estimator_resnet(out: Dict, base: str, block: Mapping):
    _put_dense(out, f"{base}.mlp.1", block["mlp"])
    for blk in ("block1", "block2"):
        _put_conv(out, f"{base}.{blk}.block.0", block[blk]["conv"])
        _put_groupnorm(out, f"{base}.{blk}.block.1", block[blk]["norm"])
    _put_conv(out, f"{base}.res_conv", block["res_conv"])


def _export_estimator_tf(out: Dict, base: str, block: Mapping):
    attn = block["attn1"]
    for p in ("to_q", "to_k", "to_v"):
        out[f"{base}.attn1.{p}.weight"] = _dense_weight(attn[p])
    _put_dense(out, f"{base}.attn1.to_out.0", attn["to_out"])
    for norm in ("norm1", "norm3"):
        _put_norm(out, f"{base}.{norm}", block[norm])
    _put_dense(out, f"{base}.ff.net.0.proj", block["ff_in"])
    _put_dense(out, f"{base}.ff.net.2", block["ff_out"])


def estimator_state(tree: Mapping,
                    prefix: str = "decoder.estimator.") -> Dict:
    """flax ConditionalDecoder tree -> matcha/cosyvoice estimator state
    dict."""
    out: Dict = {}
    for name, sub in tree.items():
        if name == "time_mlp_1":
            _put_dense(out, f"{prefix}time_mlp.linear_1", sub)
        elif name == "time_mlp_2":
            _put_dense(out, f"{prefix}time_mlp.linear_2", sub)
        elif name.endswith("_resnet"):
            kind, i, _ = name.split("_")
            _export_estimator_resnet(
                out, f"{prefix}{kind}_blocks.{i}.0", sub)
        elif "_tf_" in name:
            kind, i, _, j = name.split("_")
            _export_estimator_tf(out, f"{prefix}{kind}_blocks.{i}.1.{j}", sub)
        elif name.endswith("_downsample"):
            kind, i, _ = name.split("_")
            # matcha Downsample1D keeps weights under `.conv`; the last
            # (plain Conv1d) block has no `.conv` — emit the Downsample1D
            # form for non-final blocks to mirror the import side
            _put_conv(out, f"{prefix}down_blocks.{i}.2.conv"
                      if _has_peer_block(tree, "down", int(i) + 1)
                      else f"{prefix}down_blocks.{i}.2", sub)
        elif name.endswith("_upsample"):
            kind, i, _ = name.split("_")
            k = _np(sub["kernel"])
            if _has_peer_block(tree, "up", int(i) + 1):
                # Upsample1D ConvTranspose under `.conv`: ours [k,out,in]
                out[f"{prefix}up_blocks.{i}.2.conv.weight"] = \
                    k.transpose(2, 1, 0)
                if "bias" in sub:
                    out[f"{prefix}up_blocks.{i}.2.conv.bias"] = \
                        _np(sub["bias"])
            else:
                _put_conv(out, f"{prefix}up_blocks.{i}.2", sub)
        elif name == "final_block":
            _put_conv(out, f"{prefix}final_block.block.0", sub["conv"])
            _put_groupnorm(out, f"{prefix}final_block.block.1", sub["norm"])
        elif name == "final_proj":
            _put_conv(out, f"{prefix}final_proj", sub)
        else:
            raise KeyError(f"unhandled estimator param: {name}")
    return out


def _has_peer_block(tree: Mapping, kind: str, i: int) -> bool:
    return f"{kind}_{i}_resnet" in tree


def flow_state(tree: Mapping, prefix: str = "flow.") -> Dict:
    """flax MaskedDiffWithXvec tree -> CosyVoice flow state dict."""
    out: Dict = {}
    for name, sub in tree.items():
        if name == "input_embedding":
            out[f"{prefix}input_embedding.weight"] = _embed_table(sub)
        elif name in ("spk_embed_affine_layer", "encoder_proj"):
            _put_dense(out, f"{prefix}{name}", sub)
        elif name == "encoder":
            out.update(conformer_state(sub, f"{prefix}encoder."))
        elif name == "length_regulator":
            for p_name, p in sub.items():
                if p_name.startswith("conv_"):
                    i = int(p_name.split("_")[-1])
                    _put_conv(out, f"{prefix}length_regulator.model.{i * 3}",
                              p)
                elif p_name.startswith("norm_"):
                    i = int(p_name.split("_")[-1])
                    _put_groupnorm(
                        out, f"{prefix}length_regulator.model.{i * 3 + 1}", p)
                elif p_name == "proj":
                    n_convs = sum(1 for k in sub if k.startswith("conv_"))
                    _put_conv(
                        out,
                        f"{prefix}length_regulator.model.{n_convs * 3}", p)
                else:
                    raise KeyError(
                        f"unhandled length_regulator param: {p_name}")
        elif name == "decoder":
            out.update(estimator_state(sub["estimator"],
                                       f"{prefix}decoder.estimator."))
        else:
            raise KeyError(f"unhandled flow param: {name}")
    return out


# ---------------------------------------------------------------------------
# bridges (inverse of convert.bridge_params)
# ---------------------------------------------------------------------------


def bridge_state(tree: Mapping, prefix: str) -> Dict:
    """Name-driven inverse: flax `{name}_{i}` -> torch ModuleList
    `{name}.{i}`, kernel -> transposed weight, embedding -> weight, bare
    arrays pass through."""
    import re
    out: Dict = {}

    def walk(node, path):
        if not isinstance(node, Mapping):
            leaf = path[-1]
            parts, w = path[:-1], _np(node)
            if leaf == "kernel":
                parts, w = parts + ["weight"], w.T
            elif leaf == "embedding":
                parts = parts + ["weight"]
            else:
                parts = parts + [leaf]
            out[prefix + ".".join(parts)] = w
            return
        for k, v in node.items():
            m = re.fullmatch(r"(.+)_(\d+)", k)
            segs = [m.group(1), m.group(2)] if m else [k]
            walk(v, path + segs)

    walk(tree, [])
    return out


# ---------------------------------------------------------------------------
# spoken LM / taslm / audio tower / composite
# ---------------------------------------------------------------------------


def spoken_lm_state(tree: Mapping, prefix: str = "spoken_lm.") -> Dict:
    """flax TasteSpokenLM tree -> reference TasteSpokenLM state dict
    (modeling_taste.py:546-713 attribute layout; the llama backbone is
    emitted in peft naming when LoRA adapters are present)."""
    out: Dict = {}
    for name, sub in tree.items():
        if name == "language_model":
            has_lora = any(
                "lora_a" in proj
                for ln, layer in sub.items() if ln.startswith("layers_")
                for mod in ("self_attn", "mlp") if mod in layer
                for proj in layer[mod].values())
            lm_prefix = (f"{prefix}language_model.base_model.model.model."
                         if has_lora else f"{prefix}language_model.model.")
            out.update(llama_state(sub, lm_prefix, peft=has_lora))
        elif name in ("fuse_for_bridge_in_llm", "extract_for_bridge_out_llm",
                      "code_linear"):
            out.update(bridge_state(sub, f"{prefix}{name}."))
        elif name == "a0_embedding":
            out[f"{prefix}a0_embedding.weight"] = _embed_table(sub)
        elif name in ("pad_text_unit_embed", "pad_audio_unit_embed",
                      "empty_audio_unit_embed"):
            out[f"{prefix}{name}"] = _np(sub)
        else:
            raise KeyError(f"unhandled spoken_lm param: {name}")
    return out


def taslm_state(tree: Mapping, quantizer: Optional[Mapping] = None,
                prefix: str = "") -> Dict:
    """flax TaslmForCausalLM tree (+ optional RVQ quantizer collection) ->
    reference Taslm state dict (STAGE1_TRAIN/SpokenLM/taslm/
    modeling_taslm.py:35-130 attribute layout).  Our learned
    speech_special_embed rows have no reference counterpart and are
    dropped (they are zeros on import)."""
    out: Dict = {}
    for name, sub in tree.items():
        if name == "language_model":
            has_lora = any(
                "lora_a" in proj
                for ln, layer in sub.items() if ln.startswith("layers_")
                for mod in ("self_attn", "mlp") if mod in layer
                for proj in layer[mod].values())
            lm_prefix = (f"{prefix}language_model.base_model.model.model."
                         if has_lora else f"{prefix}language_model.model.")
            out.update(llama_state(sub, lm_prefix, peft=has_lora))
        elif name == "fusion_layer":
            if "layer_norm_speech" in sub:
                _put_norm(out, f"{prefix}fusion_layer.layer_norm_speech",
                          sub["layer_norm_speech"])
            if "gate" in sub:
                out[f"{prefix}fusion_layer.gate.weight"] = \
                    _dense_weight(sub["gate"])
            if "weights" in sub:
                out[f"{prefix}fusion_layer.weights"] = _np(sub["weights"])
        elif name == "speech_embed_tokens":
            out[f"{prefix}speech_embed_tokens.weight"] = _embed_table(sub)
        elif name in ("speech_token_embed_proj_layer",
                      "speech_rvq_hidden_proj_layer", "speech_head"):
            _put_dense(out, f"{prefix}{name}", sub)
        elif name == "speech_latent_sampler":
            _put_dense(out, f"{prefix}speech_latent_sampler.fc_mu",
                       sub["fc_mu"])
            if "b_logvar" in sub:
                out[f"{prefix}speech_latent_sampler.b_logvar"] = \
                    _np(sub["b_logvar"])
        elif name == "speech_special_embed":
            continue
        elif name == "rvq":
            pass  # handled below with the quantizer collection
        else:
            raise KeyError(f"unhandled taslm param: {name}")
    if quantizer is not None:
        out.update(rvq_state_dict(tree.get("rvq", {}), quantizer,
                                  f"{prefix}speech_embed_tokens.rvq."))
    return out


def audio_tower_state(tree: Mapping, quantizer: Optional[Mapping] = None,
                      prefix: str = "audio_tower.") -> Dict:
    """flax audio-tower tree -> reference TasteAudioTower state dict
    (joint encoder-segmenter whisper names + `vq.rvq.` quantizer)."""
    out: Dict = {}
    if "encoder" in tree:
        out.update(whisper_encoder_state(
            tree["encoder"],
            f"{prefix}audio_joint_encoder_segmenter.audio_encoder.encoder."))
    if "decoder" in tree:
        out.update(whisper_decoder_state(
            tree["decoder"],
            f"{prefix}audio_joint_encoder_segmenter.audio_segmenter.decoder."))
    if "vq" in tree and quantizer is not None:
        out.update(rvq_state_dict(tree["vq"], quantizer, f"{prefix}vq.rvq."))
    return out


def composite_taste_state(variables: Mapping) -> Dict:
    """Full TasteForCausalLM variables ({"params", "quantizer"}) -> one
    reference-named taste_speech state dict (audio_tower.* +
    speech_decoder.* + spoken_lm.* [+ flow/hift under the voice
    generator's names])."""
    params = variables["params"]
    q = variables.get("quantizer", {})
    out: Dict = {}
    if "audio_tower" in params:
        vq_q = q.get("audio_tower", {}).get("vq")
        out.update(audio_tower_state(params["audio_tower"], vq_q))
    if "speech_decoder" in params:
        out.update(speech_decoder_state(params["speech_decoder"]))
    if "spoken_lm" in params:
        out.update(spoken_lm_state(params["spoken_lm"]))
    if "voice_generator" in params:
        vg = params["voice_generator"]
        if "flow" in vg:
            out.update(flow_state(vg["flow"], "flow."))
        if "hift" in vg:
            out.update(hift_state(vg["hift"], "hift."))
    return out


def to_torch(state: Dict):
    """numpy state dict -> torch tensors (for load_state_dict /
    torch.save)."""
    import torch
    return {k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in state.items()}
