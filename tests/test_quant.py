"""Weight-only int8 serving quantization (utils/quant + LoraDense
quantized=True): tree transformation round-trip, forward agreement with the
float model, and LoRA adapters riding on the quantized base."""

import numpy as np
import jax
import jax.numpy as jnp

from taste_spokenlm_tpu.config import LlamaConfig, LoraConfig
from taste_spokenlm_tpu.models.llama import LlamaModel
from taste_spokenlm_tpu.utils.quant import (quantization_error,
                                            quantize_llama_params)


def _cfg(**kw):
    return LlamaConfig.tiny().replace(**kw)


def test_quantized_forward_matches_float():
    cfg = _cfg()
    lm = LlamaModel(cfg)
    rng = jax.random.PRNGKey(0)
    ids = jax.random.randint(rng, (2, 6), 0, cfg.vocab_size)
    v = lm.init(rng, input_ids=ids)
    out_fp = lm.apply(v, input_ids=ids)

    qtree = quantize_llama_params(v["params"])
    assert quantization_error(v["params"], qtree) < 0.01
    lm_q = LlamaModel(cfg.replace(quantized_serving=True))
    out_q = lm_q.apply({"params": qtree}, input_ids=ids)

    a = np.asarray(out_fp["last_hidden"])
    b = np.asarray(out_q["last_hidden"])
    # int8 carries ~0.4% per-kernel error; hidden states stay close
    assert np.abs(a - b).max() / max(np.abs(a).max(), 1e-6) < 0.05
    logits_fp = np.asarray(lm.apply(v, out_fp["last_hidden"],
                                    method=lm.logits))
    logits_q = np.asarray(lm_q.apply({"params": qtree}, out_q["last_hidden"],
                                     method=lm_q.logits))
    # random-init logits are near-uniform, so compare values not argmax
    assert (np.abs(logits_fp - logits_q).max()
            / max(np.abs(logits_fp).max(), 1e-6)) < 0.05


def test_quantized_with_lora_adapters():
    cfg = _cfg()
    lora = LoraConfig.tiny()
    lm = LlamaModel(cfg, lora=lora)
    rng = jax.random.PRNGKey(1)
    ids = jax.random.randint(rng, (1, 5), 0, cfg.vocab_size)
    v = lm.init(rng, input_ids=ids)
    qtree = quantize_llama_params(v["params"])
    # adapters survive the transformation
    p0 = qtree["layers_0"]["self_attn"]["q_proj"]
    assert set(p0) == {"base_q", "base_scale", "lora_a", "lora_b"}
    assert p0["base_q"].dtype == jnp.int8

    lm_q = LlamaModel(cfg.replace(quantized_serving=True), lora=lora)
    out_on = lm_q.apply({"params": qtree}, input_ids=ids)
    out_off = lm_q.apply({"params": qtree}, input_ids=ids, disable_lora=True)
    # lora_b starts at zero -> adapter is a no-op either way
    np.testing.assert_allclose(np.asarray(out_on["last_hidden"]),
                               np.asarray(out_off["last_hidden"]), atol=1e-6)


def test_quantized_conformer_matches_float():
    from taste_spokenlm_tpu.config import EncoderStackConfig
    from taste_spokenlm_tpu.models.conformer import ConformerEncoder
    from taste_spokenlm_tpu.utils.quant import quantize_encoder_params

    cfg = EncoderStackConfig.tiny(32, 32, 2)
    enc = ConformerEncoder(cfg)
    rng = jax.random.PRNGKey(3)
    x = jax.random.normal(rng, (2, 7, 32))
    lens = jnp.asarray([7, 5])
    v = enc.init(rng, x, lens)
    out_fp = enc.apply(v, x, lens)

    qtree = quantize_encoder_params(v["params"])
    p0 = qtree["encoders_0"]["self_attn"]["linear_q"]
    assert set(p0) == {"kernel_q", "scale", "bias"}
    enc_q = ConformerEncoder(cfg.replace(quantized_serving=True))
    out_q = enc_q.apply({"params": qtree}, x, lens)
    a, b = np.asarray(out_fp), np.asarray(out_q)
    assert np.abs(a - b).max() / max(np.abs(a).max(), 1e-6) < 0.05


def test_quantized_speech_decoder_generate_runs():
    from taste_spokenlm_tpu.config import SpeechDecoderConfig
    from taste_spokenlm_tpu.models.speech_decoder import TasteSpeechDecoder
    from taste_spokenlm_tpu.utils.quant import quantize_encoder_params

    cfg = SpeechDecoderConfig.tiny()
    m = TasteSpeechDecoder(cfg)
    rng = jax.random.PRNGKey(4)
    b, t = 1, 5
    spk = jax.random.normal(rng, (b, cfg.spk_embed_dim))
    audio = jax.random.normal(rng, (b, t, cfg.audio_encoder_input_size))
    asr = jax.random.randint(rng, (b, t), 0, cfg.text_token_size)
    lens = jnp.asarray([t])
    sp = jax.random.randint(rng, (b, 6), 0, cfg.speech_token_size)
    slens = jnp.asarray([6])
    v = m.init(rng, spk, audio, lens, asr, lens, sp, slens)
    from taste_spokenlm_tpu.utils.quant import _quantize_dense_leaf
    v = {"params": dict(
        v["params"],
        llm=quantize_encoder_params(v["params"]["llm"]),
        # the logits head rides the llm stack's serving flag
        llm_decoder=_quantize_dense_leaf(v["params"]["llm_decoder"]))}
    mq = TasteSpeechDecoder(cfg.replace(
        llm=cfg.llm.replace(quantized_serving=True)))
    out = mq.apply(v, rng, spk, audio, lens, asr, lens, max_steps=8,
                   method=mq.generate)
    assert np.isfinite(np.asarray(out["speech_token_ids"])).all() \
        if isinstance(out, dict) else True


def test_quantized_cached_decode_runs():
    cfg = _cfg().replace(quantized_serving=True)
    lm = LlamaModel(cfg)
    rng = jax.random.PRNGKey(2)
    ids = jax.random.randint(rng, (1, 4), 0, cfg.vocab_size)
    v = lm.init(rng, input_ids=ids)
    caches = lm.apply(v, 1, 8, method=lm.init_cache)
    out = lm.apply(v, input_ids=ids, caches=caches,
                   cache_index=jnp.int32(0))
    step = lm.apply(v, input_ids=ids[:, :1], caches=out["caches"],
                    cache_index=jnp.int32(4), position_offset=4)
    assert np.isfinite(np.asarray(step["last_hidden"])).all()


def test_quantized_params_shard_under_tp():
    """The int8 serving layout shards over the ('data','model') mesh with
    the TP rules (base_q like kernel, base_scale on the output axis) and the
    sharded forward matches single-device."""
    from taste_spokenlm_tpu.parallel import mesh as mesh_lib
    from taste_spokenlm_tpu.utils.quant import quantize_llama_params
    import jax

    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs the virtual 8-device mesh")
    cfg = _cfg().replace(quantized_serving=True)
    lm = LlamaModel(cfg)
    rng = jax.random.PRNGKey(5)
    ids = jax.random.randint(rng, (4, 6), 0, cfg.vocab_size)
    v = lm.init(rng, input_ids=ids)
    base = LlamaModel(_cfg())
    vb = base.init(rng, input_ids=ids)
    qtree = quantize_llama_params(vb["params"])
    ref = np.asarray(lm.apply({"params": qtree}, input_ids=ids)["last_hidden"])

    mesh = mesh_lib.make_mesh(data=4, model=2)
    shardings = mesh_lib.param_shardings(mesh, qtree)
    # q/k/v kernels must actually be model-sharded
    s = shardings["layers_0"]["self_attn"]["q_proj"]["base_q"]
    assert "model" in str(s.spec), s.spec
    with mesh:
        qdev = jax.device_put(qtree, shardings)
        out = jax.jit(lambda p, i: lm.apply({"params": p}, input_ids=i))(
            qdev, ids)
    np.testing.assert_allclose(np.asarray(out["last_hidden"]), ref,
                               atol=2e-5)


def test_quantized_embed_and_tied_head():
    from taste_spokenlm_tpu.utils.quant import quantize_llama_params

    cfg = _cfg()   # tied embeddings
    lm = LlamaModel(cfg)
    rng = jax.random.PRNGKey(6)
    ids = jax.random.randint(rng, (2, 5), 0, cfg.vocab_size)
    v = lm.init(rng, input_ids=ids)
    out_fp = lm.apply(v, input_ids=ids)
    logits_fp = np.asarray(lm.apply(v, out_fp["last_hidden"],
                                    method=lm.logits))

    qtree = quantize_llama_params(v["params"], include_embed=True)
    assert qtree["embed_tokens"]["embedding_q"].dtype == jnp.int8
    lm_q = LlamaModel(cfg.replace(quantized_serving=True,
                                  quantized_embed_serving=True))
    out_q = lm_q.apply({"params": qtree}, input_ids=ids)
    logits_q = np.asarray(lm_q.apply({"params": qtree}, out_q["last_hidden"],
                                     method=lm_q.logits))
    assert (np.abs(logits_fp - logits_q).max()
            / max(np.abs(logits_fp).max(), 1e-6)) < 0.05


def test_quantized_int4_forward_matches_dequantized():
    """int4 weight-only serving (packed nibbles + Pallas VMEM unpack): the
    int4 model must match a FLOAT model running the dequantized weights
    (separates kernel correctness from int4 quantization noise, which at
    tiny dims compounds to tens of percent on random gaussians)."""
    from taste_spokenlm_tpu.utils.quant import dequantize_kernel
    cfg = _cfg()
    lm = LlamaModel(cfg)
    rng = jax.random.PRNGKey(3)
    ids = jax.random.randint(rng, (2, 6), 0, cfg.vocab_size)
    v = lm.init(rng, input_ids=ids)

    qtree = quantize_llama_params(v["params"], mode="int4")
    p0 = qtree["layers_0"]["self_attn"]["q_proj"]
    assert "base_q4" in p0 and p0["base_q4"].dtype == jnp.uint8
    assert quantization_error(v["params"], qtree) < 0.12
    lm_q = LlamaModel(cfg.replace(quantized_serving="int4"))
    out_q = lm_q.apply({"params": qtree}, input_ids=ids)

    # float model over dequantized weights = ground truth for the kernel
    deq = jax.tree_util.tree_map(lambda x: x, v["params"])
    import copy
    deq = copy.deepcopy(jax.tree_util.tree_map(np.asarray, v["params"]))
    for key, val in qtree.items():
        if not key.startswith("layers_"):
            continue
        for sub in ("self_attn", "mlp"):
            for proj, pt in val[sub].items():
                if "base_q4" in pt:
                    deq[key][sub][proj]["base"]["kernel"] = np.asarray(
                        dequantize_kernel(pt))
    out_ref = lm.apply({"params": deq}, input_ids=ids)
    a = np.asarray(out_ref["last_hidden"])
    b = np.asarray(out_q["last_hidden"])
    assert np.abs(a - b).max() / max(np.abs(a).max(), 1e-6) < 2e-2, \
        np.abs(a - b).max() / np.abs(a).max()


def test_quantized_int4_decode_matches_prefill():
    """The Pallas decode path (rows<=256) and the unpack prefill path
    (rows>256) share one layout: a cached decode over a long prompt must
    produce the same hiddens as the prefill forward."""
    cfg = _cfg()
    lm_q = LlamaModel(cfg.replace(quantized_serving="int4"))
    rng = jax.random.PRNGKey(4)
    T = 300   # > 256 rows -> prefill takes the unpack path
    ids = jax.random.randint(rng, (1, T), 0, cfg.vocab_size)
    v = lm_q.init(rng, input_ids=ids)
    from taste_spokenlm_tpu.utils.quant import quantize_llama_params as q
    # init under int4 already builds packed params; forward both ways
    full = lm_q.apply(v, input_ids=ids)
    cache = lm_q.apply(v, 1, T, method=lm_q.init_cache)
    step_h = []
    for t in range(3):   # decode the first 3 tokens stepwise
        out = lm_q.apply(v, input_ids=ids[:, t:t + 1], caches=cache,
                         cache_index=t, position_offset=t)
        cache = out["caches"]
        step_h.append(np.asarray(out["last_hidden"][:, 0]))
    a = np.asarray(full["last_hidden"][:, :3])
    b = np.stack(step_h, axis=1)
    np.testing.assert_allclose(a, b, atol=2e-2, rtol=2e-2)


def test_quantized_int4_head():
    """quantized_embed_serving='int4head': int8 gathers unchanged, the tied
    lm_head served through the Pallas int4 kernel from the packed
    transposed copy — logits must track the float head within int4
    quantization noise and agree on argmax for well-separated rows."""
    from taste_spokenlm_tpu.utils.quant import quantize_llama_params

    cfg = _cfg()   # tiny: hidden divisible by 2, group clamps internally
    lm = LlamaModel(cfg)
    rng = jax.random.PRNGKey(11)
    ids = jax.random.randint(rng, (2, 5), 0, cfg.vocab_size)
    v = lm.init(rng, input_ids=ids)
    out_fp = lm.apply(v, input_ids=ids)
    logits_fp = np.asarray(lm.apply(v, out_fp["last_hidden"],
                                    method=lm.logits))

    qtree = quantize_llama_params(v["params"], include_embed=True,
                                  embed_head_mode="int4")
    emb = qtree["embed_tokens"]
    assert emb["head_q4"].dtype == jnp.uint8
    assert emb["head_q4"].shape == (cfg.hidden_size // 2, cfg.vocab_size)
    lm_q = LlamaModel(cfg.replace(quantized_serving=True,
                                  quantized_embed_serving="int4head"))
    out_q = lm_q.apply({"params": qtree}, input_ids=ids)
    # embedding lookups are the same int8 path as 'int8' mode
    np.testing.assert_allclose(
        np.asarray(out_q["last_hidden"]), np.asarray(
            LlamaModel(cfg.replace(quantized_serving=True,
                                   quantized_embed_serving=True)).apply(
                {"params": {k: ({kk: vv for kk, vv in vv_.items()
                                 if not kk.startswith("head_")}
                                if k == "embed_tokens" else vv_)
                            for k, vv_ in qtree.items()}},
                input_ids=ids)["last_hidden"]),
        rtol=1e-5, atol=1e-5)
    logits_q = np.asarray(lm_q.apply({"params": qtree}, out_q["last_hidden"],
                                     method=lm_q.logits))
    assert logits_q.shape == logits_fp.shape
    rel = (np.abs(logits_fp - logits_q).max()
           / max(np.abs(logits_fp).max(), 1e-6))
    assert rel < 0.15, rel   # tiny-dim int4 noise; production D gives ~2%


def test_int4_matmul_odd_features():
    """Regression: N with an odd factor (the 4097-way S3 logits head)
    must not collapse the Pallas lane block toward 1 — the N axis is
    zero-padded to a block multiple instead."""
    from taste_spokenlm_tpu.ops.pallas.int4_matmul import (
        dequantize_int4, matmul_int4, quantize_int4)
    r = np.random.RandomState(3)
    for N in (97, 513):
        w = r.randn(256, N).astype(np.float32)
        packed, scale = quantize_int4(jnp.asarray(w))
        x = jnp.asarray(r.randn(2, 256).astype(np.float32))
        y = matmul_int4(x, packed, scale)
        ref = x @ dequantize_int4(packed, scale)
        assert y.shape == (2, N)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   atol=0.2)


def test_merge_lora_matches_adapter_forward():
    """merge_lora_params folds W' = W + (alpha/r) A@B into the base kernels:
    a lora-free model on the merged tree must match the adapter model
    bit-for-tolerance in float — the serving decode then skips the ~2
    r-rank matmuls per projection per step (deployment-standard peft
    merge_and_unload, which the reference never does)."""
    from taste_spokenlm_tpu.utils.quant import merge_lora_params

    lora = LoraConfig.tiny()
    cfg = _cfg()
    lm = LlamaModel(cfg, lora=lora)
    rng = jax.random.PRNGKey(9)
    ids = jax.random.randint(rng, (2, 6), 0, cfg.vocab_size)
    v = lm.init(rng, input_ids=ids)

    # lora_b initializes to zero (peft default) -> give the adapters a real
    # contribution so the merge is actually exercised
    def put_b(t, key=jax.random.PRNGKey(33)):
        out = {}
        for k, val in t.items():
            if k == "lora_b":
                key = jax.random.fold_in(key, hash(str(val.shape)) % 997)
                out[k] = 0.3 * jax.random.normal(key, val.shape, val.dtype)
            elif isinstance(val, dict):
                out[k] = put_b(val, key)
            else:
                out[k] = val
        return out

    params = put_b(v["params"])
    out_lora = lm.apply({"params": params}, input_ids=ids)

    merged = merge_lora_params(params, lora.alpha, lora.r)
    # adapters gone, base kernels changed
    flat = jax.tree_util.tree_leaves_with_path(merged)
    assert not any("lora" in str(p) for p, _ in flat)
    lm_plain = LlamaModel(cfg)
    out_merged = lm_plain.apply({"params": merged}, input_ids=ids)
    np.testing.assert_allclose(np.asarray(out_merged["last_hidden"]),
                               np.asarray(out_lora["last_hidden"]),
                               atol=2e-5, rtol=1e-4)

    # merged tree quantizes like any float tree
    q = quantize_llama_params(merged)
    assert quantization_error(merged, q) < 0.01
    lm_q = LlamaModel(cfg.replace(quantized_serving=True))
    out_q = lm_q.apply({"params": q}, input_ids=ids)
    assert np.isfinite(np.asarray(out_q["last_hidden"])).all()


def test_fused_qkv_serving_matches_unfused():
    """The fused_qkv_serving layout (one qkv GEMV + one gateup GEMV per
    layer, quantize_llama_params(fuse_qkv=True)) computes exactly the same
    dot products as the per-projection int8 layout — outputs must agree to
    float tolerance, full forward AND cached decode step."""
    cfg = _cfg()
    lm_fp = LlamaModel(cfg)
    rng = jax.random.PRNGKey(12)
    ids = jax.random.randint(rng, (2, 6), 0, cfg.vocab_size)
    v = lm_fp.init(rng, input_ids=ids)

    q_sep = quantize_llama_params(v["params"])
    q_fused = quantize_llama_params(v["params"], fuse_qkv=True)
    # fused tree: q/k/v and gate/up replaced by qkv_proj / gateup_proj
    l0 = q_fused["layers_0"]
    assert "qkv_proj" in l0["self_attn"] and "q_proj" not in l0["self_attn"]
    assert "gateup_proj" in l0["mlp"] and "gate_proj" not in l0["mlp"]
    # per-output-channel scales concat losslessly: fused == sep, bitwise
    np.testing.assert_array_equal(
        np.asarray(l0["self_attn"]["qkv_proj"]["base_q"]),
        np.concatenate([np.asarray(q_sep["layers_0"]["self_attn"][n]["base_q"])
                        for n in ("q_proj", "k_proj", "v_proj")], axis=1))

    lm_sep = LlamaModel(cfg.replace(quantized_serving=True))
    lm_fused = LlamaModel(cfg.replace(quantized_serving=True,
                                      fused_qkv_serving=True))
    out_sep = lm_sep.apply({"params": q_sep}, input_ids=ids)
    out_fused = lm_fused.apply({"params": q_fused}, input_ids=ids)
    np.testing.assert_allclose(np.asarray(out_fused["last_hidden"]),
                               np.asarray(out_sep["last_hidden"]),
                               atol=2e-5, rtol=1e-5)

    # cached decode step agreement
    c_sep = lm_sep.apply({"params": q_sep}, 2, 8, method=lm_sep.init_cache)
    c_fused = lm_fused.apply({"params": q_fused}, 2, 8,
                             method=lm_fused.init_cache)
    o1 = lm_sep.apply({"params": q_sep}, input_ids=ids, caches=c_sep,
                      cache_index=jnp.int32(0))
    o2 = lm_fused.apply({"params": q_fused}, input_ids=ids, caches=c_fused,
                        cache_index=jnp.int32(0))
    s1 = lm_sep.apply({"params": q_sep}, input_ids=ids[:, :1],
                      caches=o1["caches"], cache_index=jnp.int32(6),
                      position_offset=6)
    s2 = lm_fused.apply({"params": q_fused}, input_ids=ids[:, :1],
                        caches=o2["caches"], cache_index=jnp.int32(6),
                        position_offset=6)
    np.testing.assert_allclose(np.asarray(s2["last_hidden"]),
                               np.asarray(s1["last_hidden"]),
                               atol=2e-5, rtol=1e-5)


def test_fused_qkv_int4_layout_concat_lossless():
    """fuse_qkv with mode='int4': group-wise scales run along the INPUT dim,
    so concatenating q/k/v along the output dim before quantization is
    bitwise identical to quantizing each projection separately — and the
    int4 fused model runs."""
    cfg = _cfg()
    lm = LlamaModel(cfg)
    rng = jax.random.PRNGKey(15)
    ids = jax.random.randint(rng, (1, 5), 0, cfg.vocab_size)
    v = lm.init(rng, input_ids=ids)

    q_sep = quantize_llama_params(v["params"], mode="int4")
    q_fused = quantize_llama_params(v["params"], mode="int4", fuse_qkv=True)
    att = q_fused["layers_0"]["self_attn"]
    assert "qkv_proj" in att and att["qkv_proj"]["base_q4"].dtype == jnp.uint8
    np.testing.assert_array_equal(
        np.asarray(att["qkv_proj"]["base_q4"]),
        np.concatenate([np.asarray(q_sep["layers_0"]["self_attn"][n]["base_q4"])
                        for n in ("q_proj", "k_proj", "v_proj")], axis=1))
    np.testing.assert_array_equal(
        np.asarray(att["qkv_proj"]["base_scale"]),
        np.concatenate(
            [np.asarray(q_sep["layers_0"]["self_attn"][n]["base_scale"])
             for n in ("q_proj", "k_proj", "v_proj")], axis=1))

    lm_fused = LlamaModel(cfg.replace(quantized_serving="int4",
                                      fused_qkv_serving=True))
    lm_sep = LlamaModel(cfg.replace(quantized_serving="int4"))
    out_f = lm_fused.apply({"params": q_fused}, input_ids=ids)
    out_s = lm_sep.apply({"params": q_sep}, input_ids=ids)
    np.testing.assert_allclose(np.asarray(out_f["last_hidden"]),
                               np.asarray(out_s["last_hidden"]),
                               atol=2e-5, rtol=1e-5)


def test_fused_qkv_conformer_matches_unfused():
    """EncoderStackConfig.fused_qkv_serving (linear_q/k/v as one linear_qkv
    GEMV, quantize_encoder_params(fuse_qkv=True)) is exact vs the
    per-projection layout: the quantized kernels/biases concat losslessly."""
    from taste_spokenlm_tpu.config import EncoderStackConfig
    from taste_spokenlm_tpu.models.conformer import ConformerEncoder
    from taste_spokenlm_tpu.utils.quant import quantize_encoder_params

    cfg = EncoderStackConfig.tiny(32, 32, 2)
    enc = ConformerEncoder(cfg)
    rng = jax.random.PRNGKey(13)
    x = jax.random.normal(rng, (2, 7, 32))
    lens = jnp.asarray([7, 5])
    v = enc.init(rng, x, lens)

    q_sep = quantize_encoder_params(v["params"])
    q_fused = quantize_encoder_params(v["params"], fuse_qkv=True)
    att = q_fused["encoders_0"]["self_attn"]
    assert "linear_qkv" in att and "linear_q" not in att
    np.testing.assert_array_equal(
        np.asarray(att["linear_qkv"]["kernel_q"]),
        np.concatenate(
            [np.asarray(q_sep["encoders_0"]["self_attn"][n]["kernel_q"])
             for n in ("linear_q", "linear_k", "linear_v")], axis=1))

    enc_sep = ConformerEncoder(cfg.replace(quantized_serving=True))
    enc_fused = ConformerEncoder(cfg.replace(quantized_serving=True,
                                             fused_qkv_serving=True))
    out_sep = enc_sep.apply({"params": q_sep}, x, lens)
    out_fused = enc_fused.apply({"params": q_fused}, x, lens)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_sep),
                               atol=2e-5, rtol=1e-5)

    # cached AR decode step agreement (the path fusion targets)
    c_sep = enc_sep.apply({"params": q_sep}, 2, 8,
                          method=enc_sep.init_cache)
    c_fused = enc_fused.apply({"params": q_fused}, 2, 8,
                              method=enc_fused.init_cache)
    step = jax.random.normal(jax.random.PRNGKey(14), (2, 1, 32))
    o1, _ = enc_sep.apply({"params": q_sep}, step, c_sep, jnp.int32(0),
                          method=enc_sep.decode_step)
    o2, _ = enc_fused.apply({"params": q_fused}, step, c_fused, jnp.int32(0),
                            method=enc_fused.decode_step)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1),
                               atol=2e-5, rtol=1e-5)
