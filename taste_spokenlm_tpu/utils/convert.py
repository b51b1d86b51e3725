"""PyTorch/HF checkpoint -> JAX parameter-tree conversion.

One-time weight importers for the external pretrained assets the framework
consumes (whisper-large-v3 / distil-large-v3, Llama-3.2-1B, CosyVoice
flow/hift — SURVEY.md L0).  The flax modules in models/ intentionally mirror
HF parameter names, so conversion is a mechanical rename + transpose.
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional

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
    _maybe_lm_head(tree, state_dict, prefix)
    return tree


def _maybe_lm_head(tree: Dict, state_dict, prefix: str) -> None:
    """Untied lm_head sits one level above the backbone prefix
    (language_model.lm_head / base_model.model.lm_head); tied checkpoints
    omit it and LlamaModel.logits() falls back to embed^T."""
    head_key = prefix[: -len("model.")] + "lm_head.weight"
    if head_key in state_dict:
        tree["lm_head_kernel"] = _np(state_dict[head_key]).T


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


# ---------------------------------------------------------------------------
# conformer / speech decoder / RVQ / flow / hift converters
# ---------------------------------------------------------------------------


def _collapse_weight_norm(state: Mapping[str, "np.ndarray"], base: str):
    """torch weight_norm stores weight_g [out,1,..] and weight_v; effective
    weight = g * v / ||v|| over all dims but 0."""
    g = _np(state[f"{base}.weight_g"])
    v = _np(state[f"{base}.weight_v"])
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt(np.sum(v * v, axis=axes, keepdims=True))
    return g * v / np.maximum(norm, 1e-12)


def _conv1d_to_flax(w: np.ndarray) -> np.ndarray:
    """torch Conv1d [out, in, k] -> flax [k, in, out]."""
    return w.transpose(2, 1, 0)


def conformer_params(state_dict: Mapping[str, "np.ndarray"], prefix: str,
                     batch_stats: Optional[Dict] = None) -> Dict:
    """CosyVoice Transformer/Conformer encoder state dict -> flax tree for
    models.conformer.ConformerEncoder.

    Reference names: embed.out.0 (linear), embed.out.1 (LN),
    encoders.{i}.self_attn.linear_{q,k,v,out,pos}, pos_bias_u/v,
    feed_forward[_macaron].w_1/w_2, norm1/norm2 or
    norm_mha/norm_ff/norm_ff_macaron/norm_conv/norm_final,
    conv_module.{pointwise_conv1,depthwise_conv,norm,pointwise_conv2},
    after_norm (cosyvoice/encoder.py + encoder_layer.py + convolution.py).

    BatchNorm running stats (conv_module.norm.running_{mean,var} when
    cnn_module_norm='batch_norm') are written into `batch_stats` when a dict
    is supplied — pass it as the flax 'batch_stats' collection.
    """
    tree: Dict = {}
    for name, w in state_dict.items():
        if not name.startswith(prefix):
            continue
        name = name[len(prefix):]
        w = _np(w)
        parts = name.split(".")
        if parts[0] == "embed":
            # embed.out.0.{weight,bias}=linear, embed.out.1.{...}=layernorm
            idx, kind = parts[2], parts[3]
            if idx == "0":
                _set(tree, ["embed_linear",
                            {"weight": "kernel", "bias": "bias"}[kind]],
                     w.T if kind == "weight" else w)
            else:
                _set(tree, ["embed_norm",
                            {"weight": "scale", "bias": "bias"}[kind]], w)
        elif parts[0] == "after_norm":
            _set(tree, ["after_norm",
                        {"weight": "scale", "bias": "bias"}[parts[1]]], w)
        elif parts[0] == "encoders":
            i, sub = parts[1], parts[2:]
            lk = f"encoders_{i}"
            if sub[0] == "self_attn":
                if sub[1] in ("pos_bias_u", "pos_bias_v"):
                    _set(tree, [lk, "self_attn", sub[1]], w)
                else:
                    kind = {"weight": "kernel", "bias": "bias"}[sub[2]]
                    _set(tree, [lk, "self_attn", sub[1], kind],
                         w.T if kind == "kernel" else w)
            elif sub[0] in ("feed_forward", "feed_forward_macaron"):
                kind = {"weight": "kernel", "bias": "bias"}[sub[2]]
                _set(tree, [lk, sub[0], sub[1], kind],
                     w.T if kind == "kernel" else w)
            elif sub[0] in ("norm1", "norm2", "norm_mha", "norm_ff",
                            "norm_ff_macaron", "norm_conv", "norm_final"):
                _set(tree, [lk, sub[0],
                            {"weight": "scale", "bias": "bias"}[sub[1]]], w)
            elif sub[0] == "conv_module":
                if sub[1] == "norm":
                    if sub[2] in ("running_mean", "running_var"):
                        if batch_stats is not None:
                            _set(batch_stats,
                                 [lk, "conv_module", "norm",
                                  {"running_mean": "mean",
                                   "running_var": "var"}[sub[2]]], w)
                    elif sub[2] != "num_batches_tracked":
                        _set(tree, [lk, "conv_module", "norm",
                                    {"weight": "scale", "bias": "bias"}[sub[2]]],
                             w)
                else:  # pointwise_conv1 / depthwise_conv / pointwise_conv2
                    kind = {"weight": "kernel", "bias": "bias"}[sub[2]]
                    _set(tree, [lk, "conv_module", sub[1], kind],
                         _conv1d_to_flax(w) if kind == "kernel" else w)
    return tree


def rvq_state(state_dict: Mapping[str, "np.ndarray"], prefix: str
              ) -> Tuple[Dict, Dict]:
    """vendored ResidualVQ state dict -> (params tree, quantizer collection).

    Reference names: {prefix}project_in/out.{weight,bias},
    {prefix}layers.{i}._codebook.{embed,embed_avg,cluster_size} with leading
    [1, K, D] codebook shape (vector_quantize_pytorch EuclideanCodebook).
    """
    params: Dict = {}
    embeds, avgs, sizes = {}, {}, {}
    for name, w in state_dict.items():
        if not name.startswith(prefix):
            continue
        name = name[len(prefix):]
        w = _np(w)
        parts = name.split(".")
        if parts[0] in ("project_in", "project_out"):
            kind = {"weight": "kernel", "bias": "bias"}[parts[1]]
            _set(params, [parts[0], kind], w.T if kind == "kernel" else w)
        elif parts[0] == "layers" and parts[2] == "_codebook":
            i = int(parts[1])
            field = parts[3]
            arr = w[0] if w.ndim == 3 else w  # drop leading head dim
            if field == "embed":
                embeds[i] = arr
            elif field == "embed_avg":
                avgs[i] = arr
            elif field == "cluster_size":
                sizes[i] = arr[0] if arr.ndim == 2 else arr
    n = len(embeds)
    quantizer = {
        "embed": np.stack([embeds[i] for i in range(n)]),
        "embed_avg": np.stack([avgs.get(i, embeds[i]) for i in range(n)]),
        "cluster_size": np.stack([
            sizes.get(i, np.ones(embeds[i].shape[0], np.float32))
            for i in range(n)]),
        "initted": np.ones((), bool),
    }
    return params, quantizer


def speech_decoder_params(state_dict: Mapping[str, "np.ndarray"],
                          prefix: str = "speech_decoder.") -> Dict:
    """Reference TasteSpeechDecoder state dict -> flax tree
    (modeling_taste.py:214-340 module names)."""
    tree: Dict = {}
    sub = {k[len(prefix):]: v for k, v in state_dict.items()
           if k.startswith(prefix)}
    for name, w in sub.items():
        w = _np(w)
        parts = name.split(".")
        if parts[0] in ("text_embedding", "llm_embedding", "speech_embedding"):
            _set(tree, [parts[0], "embedding"], w)
        elif parts[0] in ("text_encoder_affine_layer",
                          "audio_token_encoder_affine_layer",
                          "audio_embed_affine_layer",
                          "spk_embed_affine_layer", "llm_decoder"):
            kind = {"weight": "kernel", "bias": "bias"}[parts[1]]
            _set(tree, [parts[0], kind], w.T if kind == "kernel" else w)
        elif parts[0] == "fuse_encoded_audio_text_module":
            if parts[1] == "weights":
                tree["fuse_weights"] = w
    for enc in ("text_encoder", "audio_token_encoder", "llm"):
        t = conformer_params(sub, f"{enc}.")
        if t:
            tree[enc if enc != "llm" else "llm"] = t
    return tree


def hift_params(state_dict: Mapping[str, "np.ndarray"],
                prefix: str = "hift.", num_kernels: int = 3) -> Dict:
    """HiFTGenerator torch state dict (weight-norm convs) -> flax tree for
    models.hift.HiFTGenerator (collapsed weights, channels-last kernels)."""
    sub = {k[len(prefix):]: v for k, v in state_dict.items()
           if k.startswith(prefix)}
    tree: Dict = {}

    def conv(dst, base, transpose=False):
        if f"{base}.weight_g" in sub:
            w = _collapse_weight_norm(sub, base)
        else:
            w = _np(sub[f"{base}.weight"])
        if transpose:  # ConvTranspose1d [in, out, k] -> ours [k, out, in]
            w = w.transpose(2, 1, 0)
        else:          # Conv1d [out, in, k] -> [k, in, out]
            w = _conv1d_to_flax(w)
        _set(tree, dst + ["kernel"], w)
        if f"{base}.bias" in sub:
            _set(tree, dst + ["bias"], _np(sub[f"{base}.bias"]))

    conv(["conv_pre"], "conv_pre")
    conv(["conv_post"], "conv_post")
    i = 0
    while f"ups.{i}.weight_v" in sub or f"ups.{i}.weight" in sub:
        conv([f"ups_{i}"], f"ups.{i}", transpose=True)
        conv([f"source_downs_{i}"], f"source_downs.{i}")
        _convert_resblock(tree, sub, f"source_resblocks.{i}",
                          f"source_resblocks_{i}")
        i += 1
    n_up = i
    j = 0
    while any(k.startswith(f"resblocks.{j}.") for k in sub):
        up_idx, k_idx = divmod(j, num_kernels)
        _convert_resblock(tree, sub, f"resblocks.{j}",
                          f"resblocks_{up_idx}_{k_idx}")
        j += 1
    # source module + f0 predictor
    if "m_source.l_linear.weight" in sub:
        _set(tree, ["source_linear", "kernel"], _np(sub["m_source.l_linear.weight"]).T)
        _set(tree, ["source_linear", "bias"], _np(sub["m_source.l_linear.bias"]))
    for k in range(5):
        base = f"f0_predictor.condnet.{k * 2}"
        if f"{base}.weight_v" in sub or f"{base}.weight" in sub:
            conv(["f0_predictor", f"cond_{k}"], base)
    if "f0_predictor.classifier.weight" in sub:
        _set(tree, ["f0_predictor", "classifier", "kernel"],
             _np(sub["f0_predictor.classifier.weight"]).T)
        _set(tree, ["f0_predictor", "classifier", "bias"],
             _np(sub["f0_predictor.classifier.bias"]))
    return tree


def _convert_resblock(tree: Dict, sub, base: str, dst: str):
    i = 0
    while f"{base}.convs1.{i}.weight_v" in sub or f"{base}.convs1.{i}.weight" in sub:
        for conv_name, dsti in ((f"convs1.{i}", f"conv1_{i}"),
                                (f"convs2.{i}", f"conv2_{i}")):
            b = f"{base}.{conv_name}"
            w = (_collapse_weight_norm(sub, b) if f"{b}.weight_g" in sub
                 else _np(sub[f"{b}.weight"]))
            _set(tree, [dst, dsti, "kernel"], _conv1d_to_flax(w))
            if f"{b}.bias" in sub:
                _set(tree, [dst, dsti, "bias"], _np(sub[f"{b}.bias"]))
        for act, dsta in ((f"activations1.{i}.alpha", f"alpha1_{i}"),
                          (f"activations2.{i}.alpha", f"alpha2_{i}")):
            if f"{base}.{act}" in sub:
                _set(tree, [dst, dsta], _np(sub[f"{base}.{act}"]).reshape(-1))
        i += 1


def _dense(tree, dst, sub, base):
    _set(tree, dst + ["kernel"], _np(sub[f"{base}.weight"]).T)
    if f"{base}.bias" in sub:
        _set(tree, dst + ["bias"], _np(sub[f"{base}.bias"]))


def _groupnorm(tree, dst, sub, base):
    _set(tree, dst + ["scale"], _np(sub[f"{base}.weight"]))
    _set(tree, dst + ["bias"], _np(sub[f"{base}.bias"]))


def _conv(tree, dst, sub, base):
    _set(tree, dst + ["kernel"], _conv1d_to_flax(_np(sub[f"{base}.weight"])))
    if f"{base}.bias" in sub:
        _set(tree, dst + ["bias"], _np(sub[f"{base}.bias"]))


def _estimator_resnet(tree, sub, base, dst):
    """matcha ResnetBlock1D: mlp.1 linear, block1/2 (block.0 conv, block.1
    groupnorm), res_conv."""
    _dense(tree, [dst, "mlp"], sub, f"{base}.mlp.1")
    for blk in ("block1", "block2"):
        _conv(tree, [dst, blk, "conv"], sub, f"{base}.{blk}.block.0")
        _groupnorm(tree, [dst, blk, "norm"], sub, f"{base}.{blk}.block.1")
    _conv(tree, [dst, "res_conv"], sub, f"{base}.res_conv")


def _estimator_tf(tree, sub, base, dst):
    """diffusers BasicTransformerBlock: attn1.to_{q,k,v}, attn1.to_out.0,
    norm1/norm3, ff.net.0.proj + ff.net.2."""
    for p in ("to_q", "to_k", "to_v"):
        _set(tree, [dst, "attn1", p, "kernel"],
             _np(sub[f"{base}.attn1.{p}.weight"]).T)
    _dense(tree, [dst, "attn1", "to_out"], sub, f"{base}.attn1.to_out.0")
    for norm in ("norm1", "norm3"):
        _set(tree, [dst, norm, "scale"], _np(sub[f"{base}.{norm}.weight"]))
        _set(tree, [dst, norm, "bias"], _np(sub[f"{base}.{norm}.bias"]))
    _dense(tree, [dst, "ff_in"], sub, f"{base}.ff.net.0.proj")
    _dense(tree, [dst, "ff_out"], sub, f"{base}.ff.net.2")


def flow_params(state_dict: Mapping[str, "np.ndarray"],
                prefix: str = "flow.", n_blocks: int = 4,
                num_mid_blocks: int = 12, n_channels: int = 2,
                lr_layers: int = 4) -> Dict:
    """MaskedDiffWithXvec state dict -> flax tree for models.flow
    (flow.py module names + matcha decoder names)."""
    sub = {k[len(prefix):]: v for k, v in state_dict.items()
           if k.startswith(prefix)}
    tree: Dict = {}
    _set(tree, ["input_embedding", "embedding"], _np(sub["input_embedding.weight"]))
    _dense(tree, ["spk_embed_affine_layer"], sub, "spk_embed_affine_layer")
    _dense(tree, ["encoder_proj"], sub, "encoder_proj")
    enc = conformer_params(sub, "encoder.")
    if enc:
        tree["encoder"] = enc
    # length regulator: model.0/3/6/9 convs + model.1/4/7/10 groupnorms + final 1x1
    lr: Dict = {}
    for i in range(lr_layers):
        _conv(lr, [f"conv_{i}"], sub, f"length_regulator.model.{i * 3}")
        _groupnorm(lr, [f"norm_{i}"], sub, f"length_regulator.model.{i * 3 + 1}")
    _conv(lr, ["proj"], sub, f"length_regulator.model.{lr_layers * 3}")
    tree["length_regulator"] = lr
    # CFM estimator
    est = estimator_params(sub, "decoder.estimator.", n_channels, n_blocks,
                           num_mid_blocks)
    tree["decoder"] = {"estimator": est}
    return tree


def estimator_params(state_dict: Mapping[str, "np.ndarray"],
                     prefix: str = "decoder.estimator.", n_channels: int = 2,
                     n_blocks: int = 4, num_mid_blocks: int = 12) -> Dict:
    """matcha/cosyvoice ConditionalDecoder state dict -> flax tree for
    models.flow.ConditionalDecoder (decoder.py:21-222)."""
    sub = {k[len(prefix):]: v for k, v in state_dict.items()
           if k.startswith(prefix)}
    est: Dict = {}
    _dense(est, ["time_mlp_1"], sub, "time_mlp.linear_1")
    _dense(est, ["time_mlp_2"], sub, "time_mlp.linear_2")
    for i in range(n_channels):
        base = f"down_blocks.{i}"
        _estimator_resnet(est, sub, f"{base}.0", f"down_{i}_resnet")
        for j in range(n_blocks):
            _estimator_tf(est, sub, f"{base}.1.{j}", f"down_{i}_tf_{j}")
        # non-last blocks use matcha Downsample1D (weights under `.conv`),
        # the last block a plain Conv1d (decoder.py:64-70 / flow decoder)
        ds = f"{base}.2.conv" if f"{base}.2.conv.weight" in sub else f"{base}.2"
        _conv(est, [f"down_{i}_downsample"], sub, ds)
    for i in range(num_mid_blocks):
        base = f"mid_blocks.{i}"
        _estimator_resnet(est, sub, f"{base}.0", f"mid_{i}_resnet")
        for j in range(n_blocks):
            _estimator_tf(est, sub, f"{base}.1.{j}", f"mid_{i}_tf_{j}")
    for i in range(n_channels):
        base = f"up_blocks.{i}"
        _estimator_resnet(est, sub, f"{base}.0", f"up_{i}_resnet")
        for j in range(n_blocks):
            _estimator_tf(est, sub, f"{base}.1.{j}", f"up_{i}_tf_{j}")
        if f"{base}.2.conv.weight" in sub:
            # ConvTranspose1d [in, out, k] -> ours [k, out, in]
            w = _np(sub[f"{base}.2.conv.weight"]).transpose(2, 1, 0)
            _set(est, [f"up_{i}_upsample", "kernel"], w)
            _set(est, [f"up_{i}_upsample", "bias"], _np(sub[f"{base}.2.conv.bias"]))
        else:
            _conv(est, [f"up_{i}_upsample"], sub, f"{base}.2")
    _conv(est, ["final_block", "conv"], sub, "final_block.block.0")
    _groupnorm(est, ["final_block", "norm"], sub, "final_block.block.1")
    _conv(est, ["final_proj"], sub, "final_proj")
    return est


# ---------------------------------------------------------------------------
# composite spoken-LM / tower converters
# ---------------------------------------------------------------------------


def peft_llama_params(state_dict: Mapping[str, "np.ndarray"],
                      prefix: str = "base_model.model.model.") -> Dict:
    """peft-wrapped HF llama state dict -> flax tree incl. LoRA adapters.

    Handles the `base_layer.weight` / `lora_A.default.weight` /
    `lora_B.default.weight` key scheme from get_peft_model
    (/root/reference/taste_speech/modeling_taste.py:577-599); the tied
    lm_head is skipped (excluded from LoRA targets by
    _find_all_linear_names, modules_taste/utils.py:18-33).
    """
    tree: Dict = {}
    for name, w in state_dict.items():
        if not name.startswith(prefix):
            continue
        name = name[len(prefix):]
        w = _np(w)
        parts = name.split(".")
        if parts[0] == "embed_tokens":
            _set(tree, ["embed_tokens", "embedding"], w)
        elif parts[0] == "norm":
            _set(tree, ["norm", "weight"], w)
        elif parts[0] == "layers":
            lk = f"layers_{parts[1]}"
            if parts[2] in ("input_layernorm", "post_attention_layernorm"):
                _set(tree, [lk, parts[2], "weight"], w)
            elif parts[2] in ("self_attn", "mlp"):
                proj, rest = parts[3], parts[4:]
                if rest[0] in ("base_layer", "weight"):
                    _set(tree, [lk, parts[2], proj, "base", "kernel"], w.T)
                elif rest[0] == "lora_A":
                    _set(tree, [lk, parts[2], proj, "lora_a"], w.T)
                elif rest[0] == "lora_B":
                    _set(tree, [lk, parts[2], proj, "lora_b"], w.T)
                else:
                    raise KeyError(name)
            else:
                raise KeyError(name)
        elif parts[0] == "rotary_emb":
            continue
    _maybe_lm_head(tree, state_dict, prefix)
    return tree


def bridge_params(state_dict: Mapping[str, "np.ndarray"], prefix: str) -> Dict:
    """Name-driven bridge converter (fuse_for_bridge_in_llm.* /
    extract_for_bridge_out_llm.*): Linear weight -> kernel^T, ModuleList
    index -> `{name}_{i}`, bare parameters pass through, embeddings keep
    torch layout."""
    tree: Dict = {}
    for name, w in state_dict.items():
        if not name.startswith(prefix):
            continue
        sub = name[len(prefix):].split(".")
        w = _np(w)
        path = []
        i = 0
        while i < len(sub):
            p = sub[i]
            if i + 1 < len(sub) and sub[i + 1].isdigit():
                path.append(f"{p}_{sub[i + 1]}")
                i += 2
            elif p == "weight" and i == len(sub) - 1:
                if path and "embedding" in path[-1]:
                    path.append("embedding")
                else:
                    path.append("kernel")
                    w = w.T
                i += 1
            else:
                path.append(p)
                i += 1
        _set(tree, path, w)
    return tree


def spoken_lm_params(state_dict: Mapping[str, "np.ndarray"],
                     prefix: str = "spoken_lm.") -> Dict:
    """TasteSpokenLM subtree of a composite taste_speech checkpoint ->
    flax tree (modeling_taste.py:546-713 attribute layout)."""
    sub = {k[len(prefix):]: v for k, v in state_dict.items()
           if k.startswith(prefix)}
    tree: Dict = {}
    lm = {k[len("language_model."):]: v for k, v in sub.items()
          if k.startswith("language_model.")}
    peft = any(k.startswith("base_model.") for k in lm)
    tree["language_model"] = peft_llama_params(
        lm, prefix="base_model.model.model." if peft else "model.")
    for mod in ("fuse_for_bridge_in_llm", "extract_for_bridge_out_llm",
                "code_linear"):
        conv = bridge_params(sub, f"{mod}.")
        if conv:
            tree[mod] = conv
    if "a0_embedding.weight" in sub:   # embedding keeps torch layout
        tree["a0_embedding"] = {"embedding": _np(sub["a0_embedding.weight"])}
    for p in ("pad_text_unit_embed", "pad_audio_unit_embed",
              "empty_audio_unit_embed"):
        if p in sub:
            tree[p] = _np(sub[p])
    return tree


def taslm_params(state_dict: Mapping[str, "np.ndarray"],
                 prefix: str = "") -> Dict:
    """Reference TaslmForCausalLM state dict -> flax tree
    (STAGE1_TRAIN/SpokenLM/taslm/modeling_taslm.py:35-130 attribute layout).
    The RVQ speech codebooks are converted separately via
    rvq_state(state, "speech_embed_tokens.rvq.") into a Codebook pytree."""
    sub = {k[len(prefix):]: v for k, v in state_dict.items()
           if k.startswith(prefix)}
    tree: Dict = {}
    lm = {k[len("language_model."):]: v for k, v in sub.items()
          if k.startswith("language_model.")}
    peft = any(k.startswith("base_model.") for k in lm)
    tree["language_model"] = peft_llama_params(
        lm, prefix="base_model.model.model." if peft else "model.")
    fl: Dict = {}
    if "fusion_layer.layer_norm_speech.weight" in sub:
        fl["layer_norm_speech"] = {
            "scale": _np(sub["fusion_layer.layer_norm_speech.weight"]),
            "bias": _np(sub["fusion_layer.layer_norm_speech.bias"])}
    if "fusion_layer.gate.weight" in sub:
        fl["gate"] = {"kernel": _np(sub["fusion_layer.gate.weight"]).T}
    if "fusion_layer.weights" in sub:
        fl["weights"] = _np(sub["fusion_layer.weights"])
    if fl:
        tree["fusion_layer"] = fl
    if "speech_embed_tokens.weight" in sub:   # single-channel Embedding
        tree["speech_embed_tokens"] = {
            "embedding": _np(sub["speech_embed_tokens.weight"])}
    for name in ("speech_token_embed_proj_layer",
                 "speech_rvq_hidden_proj_layer"):
        if f"{name}.weight" in sub:
            tree[name] = {"kernel": _np(sub[f"{name}.weight"]).T}
            if f"{name}.bias" in sub:
                tree[name]["bias"] = _np(sub[f"{name}.bias"])
    if "speech_head.weight" in sub:
        tree["speech_head"] = {"kernel": _np(sub["speech_head.weight"]).T}
    if "speech_latent_sampler.fc_mu.weight" in sub:
        ls: Dict = {"fc_mu": {
            "kernel": _np(sub["speech_latent_sampler.fc_mu.weight"]).T}}
        if "speech_latent_sampler.fc_mu.bias" in sub:
            ls["fc_mu"]["bias"] = _np(sub["speech_latent_sampler.fc_mu.bias"])
        if "speech_latent_sampler.b_logvar" in sub:
            ls["b_logvar"] = _np(sub["speech_latent_sampler.b_logvar"])
        tree["speech_latent_sampler"] = ls
    # the reference has no learned special (bos/eos) rows for the RVQ
    # channel (it routes raw ids through the codebooks); ours does — zeros
    # keep converted checkpoints loadable, training learns them
    rvq_embed_key = "speech_embed_tokens.rvq.layers.0._codebook.embed"
    if rvq_embed_key in sub:
        if "speech_embed_tokens.rvq.project_out.weight" in sub:
            dim = _np(sub["speech_embed_tokens.rvq.project_out.weight"]).shape[0]
        else:
            dim = _np(sub[rvq_embed_key]).shape[-1]
        tree["speech_special_embed"] = {
            "embedding": np.zeros((4, dim), np.float32)}
    return tree


def audio_tower_params(state_dict: Mapping[str, "np.ndarray"],
                       prefix: str = "audio_tower.") -> Dict:
    """Joint encoder-segmenter weights from a composite checkpoint -> our
    audio_tower {encoder, decoder} trees (the quantizer is converted
    separately via rvq_state)."""
    enc = whisper_encoder_params(
        state_dict,
        prefix=f"{prefix}audio_joint_encoder_segmenter.audio_encoder.encoder.")
    dec = whisper_decoder_params(
        state_dict,
        prefix=f"{prefix}audio_joint_encoder_segmenter.audio_segmenter.decoder.")
    tree: Dict = {}
    if enc:
        tree["encoder"] = enc
    if dec:
        tree["decoder"] = dec
    return tree
