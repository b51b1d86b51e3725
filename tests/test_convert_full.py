"""Checkpoint-converter coverage tests.

Builds reference-named synthetic state dicts (torch naming + torch weight
layouts) from our tiny modules' shapes, converts, and applies the modules
with the converted trees — catching any naming/transpose mismatch.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import flax

from taste_spokenlm_tpu.config import (HiFTConfig, QuantizerConfig,
                                       SpeechDecoderConfig)
from taste_spokenlm_tpu.models.hift import HiFTGenerator
from taste_spokenlm_tpu.models.quantizer import ResidualVQ
from taste_spokenlm_tpu.models.speech_decoder import TasteSpeechDecoder
from taste_spokenlm_tpu.utils import convert


def _flat(params):
    return flax.traverse_util.flatten_dict(params, sep="/")


def _reference_names_for_conformer(flat, enc_name):
    """our flax path -> reference torch name + torch-layout weight."""
    rng = np.random.RandomState(0)
    out = {}
    for path, leaf in flat.items():
        if not path.startswith(enc_name + "/"):
            continue
        rel = path[len(enc_name) + 1:]
        w = rng.randn(*leaf.shape).astype(np.float32)
        if rel.startswith("embed_linear/"):
            kind = "weight" if rel.endswith("kernel") else "bias"
            out[f"{enc_name}.embed.out.0.{kind}"] = w.T if kind == "weight" else w
        elif rel.startswith("embed_norm/"):
            kind = "weight" if rel.endswith("scale") else "bias"
            out[f"{enc_name}.embed.out.1.{kind}"] = w
        elif rel.startswith("after_norm/"):
            kind = "weight" if rel.endswith("scale") else "bias"
            out[f"{enc_name}.after_norm.{kind}"] = w
        elif "/self_attn/pos_bias" in rel:
            layer, _, name = rel.split("/")
            i = layer.split("_")[-1]
            out[f"{enc_name}.encoders.{i}.self_attn.{name}"] = w
        elif "/self_attn/" in rel:
            layer, _, proj, kind = rel.split("/")
            i = layer.split("_")[-1]
            kind_t = "weight" if kind == "kernel" else "bias"
            out[f"{enc_name}.encoders.{i}.self_attn.{proj}.{kind_t}"] = \
                w.T if kind == "kernel" else w
        elif "/feed_forward/" in rel:
            layer, _, proj, kind = rel.split("/")
            i = layer.split("_")[-1]
            kind_t = "weight" if kind == "kernel" else "bias"
            out[f"{enc_name}.encoders.{i}.feed_forward.{proj}.{kind_t}"] = \
                w.T if kind == "kernel" else w
        elif rel.split("/")[1].startswith("norm"):
            layer, norm, kind = rel.split("/")
            i = layer.split("_")[-1]
            kind_t = "weight" if kind == "scale" else "bias"
            out[f"{enc_name}.encoders.{i}.{norm}.{kind_t}"] = w
        else:
            raise KeyError(rel)
    return out


def test_speech_decoder_converter_roundtrip():
    cfg = SpeechDecoderConfig.tiny()
    model = TasteSpeechDecoder(cfg)
    rng = np.random.RandomState(0)
    args = (jnp.asarray(rng.randn(1, cfg.spk_embed_dim), jnp.float32),
            jnp.asarray(rng.randn(1, 4, cfg.audio_encoder_input_size), jnp.float32),
            jnp.asarray([4]),
            jnp.asarray(rng.randint(0, cfg.text_token_size, (1, 4))),
            jnp.asarray([4]),
            jnp.asarray(rng.randint(0, cfg.speech_token_size, (1, 6))),
            jnp.asarray([6]))
    variables = model.init(jax.random.PRNGKey(0), *args)
    flat = _flat(variables["params"])

    state = {}
    rngs = np.random.RandomState(1)
    for enc in ("text_encoder", "audio_token_encoder", "llm"):
        state.update({f"speech_decoder.{k}": v for k, v in
                      _reference_names_for_conformer(flat, enc).items()})
    for path, leaf in flat.items():
        head = path.split("/")[0]
        w = rngs.randn(*leaf.shape).astype(np.float32)
        if head in ("text_embedding", "llm_embedding", "speech_embedding"):
            state[f"speech_decoder.{head}.weight"] = w
        elif head in ("text_encoder_affine_layer",
                      "audio_token_encoder_affine_layer",
                      "audio_embed_affine_layer",
                      "spk_embed_affine_layer", "llm_decoder"):
            kind = "weight" if path.endswith("kernel") else "bias"
            state[f"speech_decoder.{head}.{kind}"] = \
                w.T if kind == "weight" else w
        elif head == "fuse_weights":
            state["speech_decoder.fuse_encoded_audio_text_module.weights"] = w

    tree = convert.speech_decoder_params(state)
    # converted tree must match the model's param structure exactly
    got = set(_flat(tree))
    want = set(flat)
    assert got == want, (want - got, got - want)
    out = model.apply({"params": tree}, *args)
    assert np.isfinite(float(out["loss"]))


def test_rvq_converter():
    cfg = QuantizerConfig.tiny()
    rng = np.random.RandomState(0)
    state = {
        "vq.rvq.project_in.weight": rng.randn(cfg.codebook_dim, cfg.dim).astype("f4"),
        "vq.rvq.project_in.bias": rng.randn(cfg.codebook_dim).astype("f4"),
        "vq.rvq.project_out.weight": rng.randn(cfg.dim, cfg.codebook_dim).astype("f4"),
        "vq.rvq.project_out.bias": rng.randn(cfg.dim).astype("f4"),
    }
    for i in range(cfg.num_quantizers):
        state[f"vq.rvq.layers.{i}._codebook.embed"] = \
            rng.randn(1, cfg.codebook_size, cfg.codebook_dim).astype("f4")
        state[f"vq.rvq.layers.{i}._codebook.embed_avg"] = \
            rng.randn(1, cfg.codebook_size, cfg.codebook_dim).astype("f4")
        state[f"vq.rvq.layers.{i}._codebook.cluster_size"] = \
            np.abs(rng.randn(1, cfg.codebook_size)).astype("f4")
    params, quantizer = convert.rvq_state(state, "vq.rvq.")
    rvq = ResidualVQ(cfg)
    x = jnp.asarray(rng.randn(2, 5, cfg.dim), jnp.float32)
    out = rvq.apply({"params": params, "quantizer": quantizer}, x)
    assert out["quantized_indices"].shape == (2, 5, cfg.num_quantizers)
    # codebooks came through with the head dim dropped
    np.testing.assert_allclose(
        np.asarray(quantizer["embed"][0]),
        state["vq.rvq.layers.0._codebook.embed"][0])


def test_hift_converter():
    cfg = HiFTConfig.tiny()
    model = HiFTGenerator(cfg)
    mel = jnp.asarray(np.random.RandomState(0).randn(1, 8, cfg.in_channels),
                      jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), mel, jax.random.PRNGKey(1))
    flat = _flat(variables["params"])

    rng = np.random.RandomState(1)
    state = {}

    def emit_conv(base, kernel_shape, transpose=False, weight_norm=True):
        k, a, b = kernel_shape
        if transpose:  # ours [k, out, in] -> torch convtranspose [in, out, k]
            wt = rng.randn(b, a, k).astype("f4")
        else:          # ours [k, in, out] -> torch conv [out, in, k]
            wt = rng.randn(b, a, k).astype("f4")
        if weight_norm:
            state[f"hift.{base}.weight_v"] = wt
            state[f"hift.{base}.weight_g"] = np.abs(
                rng.randn(wt.shape[0], 1, 1)).astype("f4")
        else:
            state[f"hift.{base}.weight"] = wt
        state[f"hift.{base}.bias"] = rng.randn(wt.shape[1] if transpose
                                               else wt.shape[0]).astype("f4")

    for path, leaf in flat.items():
        parts = path.split("/")
        if parts[-1] != "kernel":
            continue
        if parts[0].startswith("ups_"):
            i = parts[0].split("_")[-1]
            emit_conv(f"ups.{i}", leaf.shape, transpose=True)
        elif parts[0].startswith("source_downs_"):
            i = parts[0].split("_")[-1]
            emit_conv(f"source_downs.{i}", leaf.shape, weight_norm=False)
        elif parts[0] in ("conv_pre", "conv_post"):
            emit_conv(parts[0], leaf.shape)
        elif parts[0] == "source_linear":
            state["hift.m_source.l_linear.weight"] = \
                rng.randn(leaf.shape[1], leaf.shape[0]).astype("f4")
            state["hift.m_source.l_linear.bias"] = \
                rng.randn(leaf.shape[1]).astype("f4")
        elif parts[0] == "f0_predictor" and parts[1].startswith("cond_"):
            k = int(parts[1].split("_")[-1])
            emit_conv(f"f0_predictor.condnet.{k * 2}", leaf.shape)
        elif parts[0] == "f0_predictor" and parts[1] == "classifier":
            state["hift.f0_predictor.classifier.weight"] = \
                rng.randn(leaf.shape[1], leaf.shape[0]).astype("f4")
            state["hift.f0_predictor.classifier.bias"] = \
                rng.randn(leaf.shape[1]).astype("f4")
        elif "resblocks" in parts[0]:
            pass  # handled below via resblock emitter
    # resblocks: ours resblocks_{i}_{j} & source_resblocks_{i}
    done = set()
    for path, leaf in flat.items():
        parts = path.split("/")
        if not parts[0].startswith(("resblocks_", "source_resblocks_")):
            continue
        if parts[0] in done or parts[-1] == "bias":
            continue
        if parts[1].startswith("alpha"):
            kind, idx = parts[1].split("_")
            base = (f"source_resblocks.{parts[0].split('_')[-1]}"
                    if parts[0].startswith("source_") else None)
            continue
    # emit full resblock dicts from our shapes
    n_kernels = len(cfg.resblock_kernel_sizes)
    for i in range(len(cfg.upsample_rates)):
        sb = f"source_resblocks.{i}"
        ours = f"source_resblocks_{i}"
        _emit_resblock(state, flat, rng, sb, ours)
        for j in range(n_kernels):
            _emit_resblock(state, flat, rng, f"resblocks.{i * n_kernels + j}",
                           f"resblocks_{i}_{j}")

    tree = convert.hift_params(state, num_kernels=n_kernels)
    got, want = set(_flat(tree)), set(flat)
    assert got == want, (sorted(want - got)[:5], sorted(got - want)[:5])
    wav = model.apply({"params": tree}, mel, jax.random.PRNGKey(2))
    assert np.isfinite(np.asarray(wav)).all()


def _emit_resblock(state, flat, rng, torch_base, ours):
    i = 0
    while f"{ours}/conv1_{i}/kernel" in flat:
        for conv, name in ((f"convs1.{i}", f"conv1_{i}"),
                           (f"convs2.{i}", f"conv2_{i}")):
            k, a, b = flat[f"{ours}/{name}/kernel"].shape
            state[f"hift.{torch_base}.{conv}.weight_v"] = \
                rng.randn(b, a, k).astype("f4")
            state[f"hift.{torch_base}.{conv}.weight_g"] = np.abs(
                rng.randn(b, 1, 1)).astype("f4")
            state[f"hift.{torch_base}.{conv}.bias"] = rng.randn(b).astype("f4")
        ch = flat[f"{ours}/alpha1_{i}"].shape[0]
        state[f"hift.{torch_base}.activations1.{i}.alpha"] = \
            np.ones(ch, "f4")
        state[f"hift.{torch_base}.activations2.{i}.alpha"] = \
            np.ones(ch, "f4")
        i += 1


def test_flow_converter_roundtrip():
    from taste_spokenlm_tpu.config import FlowConfig
    from taste_spokenlm_tpu.models.flow import MaskedDiffWithXvec

    cfg = FlowConfig.tiny()
    model = MaskedDiffWithXvec(cfg)
    rng = np.random.RandomState(0)
    tokens = jnp.asarray(rng.randint(0, cfg.vocab_size, (1, 6)))
    feat = jnp.asarray(rng.randn(1, 12, cfg.output_size), jnp.float32)
    spk = jnp.asarray(rng.randn(1, cfg.spk_embed_dim), jnp.float32)
    args = (jax.random.PRNGKey(1), tokens, jnp.asarray([6]), feat,
            jnp.asarray([12]), spk)
    variables = model.init(jax.random.PRNGKey(0), *args)
    flat = _flat(variables["params"])

    # emit reference-named torch-layout state from our shapes
    state = {}
    rngs = np.random.RandomState(1)
    state.update({f"flow.{k}": v for k, v in
                  _reference_names_for_conformer(flat, "encoder").items()})
    for path, leaf in flat.items():
        parts = path.split("/")
        w = rngs.randn(*leaf.shape).astype("f4")
        if path == "input_embedding/embedding":
            state["flow.input_embedding.weight"] = w
        elif parts[0] in ("spk_embed_affine_layer", "encoder_proj"):
            kind = "weight" if parts[-1] == "kernel" else "bias"
            state[f"flow.{parts[0]}.{kind}"] = w.T if kind == "weight" else w
        elif parts[0] == "length_regulator":
            if parts[1].startswith("conv") or parts[1] == "proj":
                idx = (int(parts[1].split("_")[-1]) * 3
                       if parts[1] != "proj" else 4 * 3)
                kind = "weight" if parts[-1] == "kernel" else "bias"
                state[f"flow.length_regulator.model.{idx}.{kind}"] = \
                    w.transpose(2, 1, 0) if kind == "weight" else w
            else:  # norm_{i}
                idx = int(parts[1].split("_")[-1]) * 3 + 1
                kind = "weight" if parts[-1] == "scale" else "bias"
                state[f"flow.length_regulator.model.{idx}.{kind}"] = w
        elif parts[0] == "decoder":
            assert parts[1] == "estimator"
            name = parts[2]
            tail = parts[3:]
            base = "flow.decoder.estimator"
            def emit_dense(tb):
                kind = "weight" if tail[-1] == "kernel" else "bias"
                state[f"{tb}.{kind}"] = w.T if kind == "weight" else w
            def emit_conv(tb):
                kind = "weight" if tail[-1] == "kernel" else "bias"
                state[f"{tb}.{kind}"] = \
                    w.transpose(2, 1, 0) if kind == "weight" else w
            def emit_norm(tb):
                kind = "weight" if tail[-1] == "scale" else "bias"
                state[f"{tb}.{kind}"] = w
            if name in ("time_mlp_1", "time_mlp_2"):
                emit_dense(f"{base}.time_mlp.linear_{name[-1]}")
            elif name.endswith("_resnet"):
                loc, i = name.split("_")[0], name.split("_")[1]
                tb = f"{base}.{loc}_blocks.{i}.0"
                if tail[0] == "mlp":
                    emit_dense(f"{tb}.mlp.1")
                elif tail[0] in ("block1", "block2"):
                    if tail[1] == "conv":
                        emit_conv(f"{tb}.{tail[0]}.block.0")
                    else:
                        emit_norm(f"{tb}.{tail[0]}.block.1")
                elif tail[0] == "res_conv":
                    emit_conv(f"{tb}.res_conv")
            elif "_tf_" in name:
                loc, i, _, j = name.split("_")
                tb = f"{base}.{loc}_blocks.{i}.1.{j}"
                if tail[0] == "attn1":
                    if tail[1] == "to_out":
                        emit_dense(f"{tb}.attn1.to_out.0")
                    else:
                        emit_dense(f"{tb}.attn1.{tail[1]}")
                elif tail[0] in ("norm1", "norm3"):
                    emit_norm(f"{tb}.{tail[0]}")
                elif tail[0] == "ff_in":
                    emit_dense(f"{tb}.ff.net.0.proj")
                elif tail[0] == "ff_out":
                    emit_dense(f"{tb}.ff.net.2")
            elif name.endswith("_downsample"):
                i = name.split("_")[1]
                emit_conv(f"{base}.down_blocks.{i}.2")
            elif name.endswith("_upsample"):
                i = name.split("_")[1]
                if len(w.shape) == 3 and path.endswith("kernel") and \
                        name == f"up_{i}_upsample" and i == "0":
                    # transposed conv: ours [k, out, in] -> torch [in, out, k]
                    state[f"{base}.up_blocks.{i}.2.conv.weight"] = \
                        w.transpose(2, 1, 0)
                elif path.endswith("bias") and i == "0":
                    state[f"{base}.up_blocks.{i}.2.conv.bias"] = w
                else:
                    emit_conv(f"{base}.up_blocks.{i}.2")
            elif name == "final_block":
                if tail[0] == "conv":
                    emit_conv(f"{base}.final_block.block.0")
                else:
                    emit_norm(f"{base}.final_block.block.1")
            elif name == "final_proj":
                emit_conv(f"{base}.final_proj")

    tree = convert.flow_params(
        state, n_blocks=cfg.estimator_n_blocks,
        num_mid_blocks=cfg.estimator_num_mid_blocks,
        n_channels=len(cfg.estimator_channels))
    got, want = set(_flat(tree)), set(flat)
    assert got == want, (sorted(want - got)[:8], sorted(got - want)[:8])
    out = model.apply({"params": tree}, *args)
    assert np.isfinite(float(out["loss"]))


def test_spoken_lm_converter_roundtrip():
    """Composite-checkpoint spoken_lm subtree (peft llama + bridges + pad
    embeds) -> our flax tree: same key set, same shapes, applies cleanly."""
    import dataclasses
    from taste_spokenlm_tpu.config import SpokenLMConfig
    from taste_spokenlm_tpu.models.quantizer import Codebook
    from taste_spokenlm_tpu.models.spoken_lm import TasteSpokenLM

    A, K, D, L = 16, 32, 16, 4
    cfg = SpokenLMConfig.tiny()
    model = TasteSpokenLM(cfg, audio_dim=A, taste_k=K, taste_d=D, taste_l=L)
    rng = np.random.RandomState(0)
    cb = Codebook(embed=jnp.asarray(rng.randn(L, K, D), jnp.float32),
                  proj_kernel=jnp.asarray(rng.randn(D, A) * 0.1, jnp.float32),
                  proj_bias=jnp.zeros((A,), jnp.float32))
    ids = jnp.asarray(rng.randint(0, cfg.llama.vocab_size, (2, 6)))
    word_ids = jnp.asarray([[0, 0, 1, 2, 2, 3], [0, 1, 1, 2, 0, 0]])
    lens = jnp.asarray([6, 4])
    indices = jnp.asarray(rng.randint(0, K, (2, 6, L)))
    variables = model.init(jax.random.PRNGKey(0), cb, indices, ids, lens,
                           word_ids)
    flat = _flat(variables["params"])

    # synthesize the reference-named state dict from our shapes
    state = {}
    for path, leaf in flat.items():
        w = np.random.RandomState(len(path)).randn(*leaf.shape).astype("f4")
        parts = path.split("/")
        if parts[0] == "language_model":
            base = "spoken_lm.language_model.base_model.model.model."
            if parts[1] == "embed_tokens":
                state[base + "embed_tokens.weight"] = w
            elif parts[1] == "norm":
                state[base + "norm.weight"] = w
            else:
                i = parts[1].split("_")[1]
                if parts[2].endswith("layernorm"):
                    state[f"{base}layers.{i}.{parts[2]}.weight"] = w
                else:  # self_attn / mlp projections
                    mod, proj = parts[2], parts[3]
                    if parts[4] == "base":
                        state[f"{base}layers.{i}.{mod}.{proj}."
                              f"base_layer.weight"] = w.T
                    elif parts[4] == "lora_a":
                        state[f"{base}layers.{i}.{mod}.{proj}."
                              f"lora_A.default.weight"] = w.T
                    else:
                        state[f"{base}layers.{i}.{mod}.{proj}."
                              f"lora_B.default.weight"] = w.T
        elif parts[0] in ("fuse_for_bridge_in_llm",
                          "extract_for_bridge_out_llm"):
            tname = ".".join(parts[:-1]).replace("/", ".")
            if parts[-1] == "kernel":
                state[f"spoken_lm.{tname}.weight"] = w.T
            elif parts[-1] == "bias":
                state[f"spoken_lm.{tname}.bias"] = w
            else:  # bare parameter (weights, b_logvar, alpha)
                state[f"spoken_lm.{'.'.join(parts)}"] = w
        else:  # pad_*_unit_embed
            state[f"spoken_lm.{path}"] = w

    from taste_spokenlm_tpu.utils import convert
    tree = convert.spoken_lm_params(state)
    flat_conv = _flat(tree)
    assert set(flat_conv) == set(flat), (
        set(flat) ^ set(flat_conv))
    for k in flat:
        assert flat_conv[k].shape == flat[k].shape, k
    out = model.apply({"params": tree}, cb, indices, ids, lens, word_ids)
    assert np.isfinite(float(out["loss"]))

    # LoRA layout check: lora_a/lora_b reconstruct the torch matmul order
    k0 = next(k for k in flat if k.endswith("q_proj/lora_a"))
    torch_a = state["spoken_lm.language_model.base_model.model.model."
                    "layers.0.self_attn.q_proj.lora_A.default.weight"]
    np.testing.assert_allclose(np.asarray(flat_conv[k0]), torch_a.T)


def test_audio_tower_params_prefix_stripping():
    """Composite-checkpoint tower keys route to encoder/decoder converters."""
    from taste_spokenlm_tpu.utils import convert
    state = {
        "audio_tower.audio_joint_encoder_segmenter.audio_encoder.encoder."
        "conv1.weight": np.zeros((8, 4, 3), "f4"),
        "audio_tower.audio_joint_encoder_segmenter.audio_encoder.encoder."
        "layer_norm.weight": np.ones((8,), "f4"),
        "audio_tower.audio_joint_encoder_segmenter.audio_segmenter.decoder."
        "embed_tokens.weight": np.zeros((10, 8), "f4"),
    }
    tree = convert.audio_tower_params(state)
    assert tree["encoder"]["conv1"]["kernel"].shape == (3, 4, 8)
    assert tree["encoder"]["layer_norm"]["scale"].shape == (8,)
    assert tree["decoder"]["embed_tokens"]["embedding"].shape == (10, 8)
