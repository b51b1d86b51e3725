#!/usr/bin/env python
"""FULL-ARCHITECTURE parity vs the imported torch reference.

Every test_ref_parity_* suite runs at toy scale; this script builds the
REAL shapes — the whisper-large-v3 tower (32L/1280d, T_mel=3000 -> T=1500)
with RVQ 4x512x256 and the full CosyVoice-style speech decoder, plus the
16L/2048d Llama-1B spoken LM — with synthetic converted weights, and
checks the >99.9% speech-token agreement gate machinery at production
scale (BASELINE.md tokenizer-parity gate; SURVEY §7 "hard parts"
bit-parity: f32 drift, skew-trick index arithmetic at T=1500, RVQ argmin
stability at 1280-d).

Run on CPU (torch is the golden reference; single core, ~10-25 min/part):

  python scripts/full_arch_parity.py --part tower --platform cpu
  python scripts/full_arch_parity.py --part slm --platform cpu

Recorded output: docs/FULL_ARCH_PARITY.md
"""

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")


class _ProcessorStub:
    class feature_extractor:  # noqa: N801
        hop_length = 160
        nb_max_frames = 3000

    @classmethod
    def from_pretrained(cls, *a, **k):
        return cls()


def _report(name, payload):
    print(f"[{name}] " + json.dumps(payload))


def run_tower(tmpdir):
    import torch
    from ref_compat import import_reference
    import jax
    import jax.numpy as jnp
    from taste_spokenlm_tpu.config import TasteConfig
    from taste_spokenlm_tpu.models.taste import TasteForCausalLM
    from taste_spokenlm_tpu.utils import convert

    mt = import_reference("taste_speech.modeling_taste")
    cfgmod = import_reference("taste_speech.configuration_taste")
    ajes = import_reference(
        "taste_speech.modules_taste.audio_joint_encoder_segmenter")
    ajes.WhisperProcessor = _ProcessorStub
    ajes.WhisperTokenizer = _ProcessorStub
    cw = import_reference(
        "taste_speech.modules_taste.cosyvoice.customized_whisper")
    from transformers import WhisperConfig as HFWhisperConfig

    ours_cfg = TasteConfig.full()
    w = ours_cfg.audio_tower.whisper
    torch.manual_seed(0)
    hf_whisper_cfg = HFWhisperConfig(
        vocab_size=w.vocab_size, num_mel_bins=w.n_mels, d_model=w.d_model,
        encoder_layers=w.encoder_layers, encoder_attention_heads=w.encoder_heads,
        decoder_layers=w.decoder_layers, decoder_attention_heads=w.decoder_heads,
        encoder_ffn_dim=w.ffn_dim, decoder_ffn_dim=w.ffn_dim,
        max_source_positions=w.max_source_positions,
        max_target_positions=w.max_target_positions,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        # random-init std: whisper default 0.02 keeps activations O(1)
        init_std=0.02)
    whisper_dir = os.path.join(tmpdir, "whisper_full")
    t0 = time.perf_counter()
    cw.WhisperModel(hf_whisper_cfg).save_pretrained(whisper_dir)
    print(f"whisper-large random init+save: {time.perf_counter()-t0:.0f}s",
          file=sys.stderr)

    q = ours_cfg.audio_tower.quantizer
    sd = ours_cfg.speech_decoder
    ref_cfg = cfgmod.TasteConfig(
        audio_tower_config=cfgmod.TasteAudioTowerConfig(
            text_token_size=w.vocab_size, audio_embed_dim=w.d_model,
            quantization_on=True, is_joint_encoder_segmenter=True,
            encoder__target_hidden_layer=ours_cfg.audio_tower.encoder_target_hidden_layer,
            kwargs_for_joint_encoder_segmenter=dict(
                model_name_or_path=whisper_dir,
                target_hidden_layer=ours_cfg.audio_tower.encoder_target_hidden_layer,
                forward_type="asr_attn_pooling", make_v_proj_identity=True,
                is_word_level=True, skip_prefix_idx=4, dtype="float32"),
            kwargs_for_quantizer=dict(
                quantizer_class="rvq", dim=q.dim,
                num_quantizers=q.num_quantizers, codebook_dim=q.codebook_dim,
                codebook_size=q.codebook_size, kmeans_init=False, decay=0.99,
                quantize_dropout=False, threshold_ema_dead_code=0,
                commitment_weight=1.0, sample_codebook_temp=0.0)),
        speech_decoder_config=cfgmod.TasteSpeechDecoderConfig(
            encoder_input_size=sd.text_encoder_input_size,
            audio_encoder_input_size=sd.audio_encoder_input_size,
            llm_input_size=sd.llm_input_size, llm_output_size=sd.llm_output_size,
            text_token_size=sd.text_token_size,
            speech_token_size=sd.speech_token_size,
            spk_embed_dim=sd.spk_embed_dim, skip_prefix_idx=4,
            fuse_encoded_audio_text_type="weighted_sum",
            fuse_encoded_audio_text_kwargs={
                "normalize": False, "use_layer_norm": False,
                "use_trainable_weight": True, "weight_init_type": "balance"},
            encoder__attention_heads=sd.text_encoder.attention_heads,
            encoder__linear_units=sd.text_encoder.linear_units,
            encoder__num_blocks=sd.text_encoder.num_blocks,
            encoder__dropout_rate=0.0, encoder__positional_dropout_rate=0.0,
            llm__attention_heads=sd.llm.attention_heads,
            llm__linear_units=sd.llm.linear_units,
            llm__num_blocks=sd.llm.num_blocks,
            llm__dropout_rate=0.0, llm__positional_dropout_rate=0.0),
        _attn_implementation="eager",
    )
    del ref_cfg.spoken_lm_config  # tower part only (the reference's own
    #                               export script does the same)
    t0 = time.perf_counter()
    ref = mt.TasteForCausalLM(ref_cfg).eval()
    ref._mode = "SpeechAutoEncoder"
    ref._skip_vq_in_audio_encoder = False
    ref._skip_audio_in_audio_decoder = False
    print(f"reference composite built: {time.perf_counter()-t0:.0f}s",
          file=sys.stderr)

    # drop the dropout the reference hard-codes in the audio token encoder
    ours = TasteForCausalLM(ours_cfg.replace(
        speech_decoder=sd.replace(
            text_encoder=sd.text_encoder.replace(
                dropout_rate=0.0, positional_dropout_rate=0.0),
            audio_encoder=sd.audio_encoder.replace(
                dropout_rate=0.0, positional_dropout_rate=0.0),
            llm=sd.llm.replace(dropout_rate=0.0,
                               positional_dropout_rate=0.0))))

    state = {k: v.detach().float().numpy() for k, v in ref.state_dict().items()}
    params = {
        "speech_decoder": convert.speech_decoder_params(state),
        "audio_tower": convert.audio_tower_params(state),
    }
    vq_params, vq_state = convert.rvq_state(state, "audio_tower.vq.rvq.")
    params["audio_tower"]["vq"] = vq_params
    variables = {"params": params,
                 "quantizer": {"audio_tower": {"vq": vq_state}}}

    # batch at PRODUCTION shapes: B=1, full 30 s mel (T=1500 after conv),
    # 64 asr tokens, 128 S3 tokens
    rng = np.random.RandomState(7)
    b, t, s = 1, 64, 128
    mel_T = 2 * w.max_source_positions
    mel = (rng.randn(b, mel_T, w.n_mels) * 0.5).astype(np.float32)
    spk = rng.randn(b, sd.spk_embed_dim).astype(np.float32)
    asr = rng.randint(100, 40000, (b, t)).astype(np.int64)
    asr_len = np.asarray([t], np.int64)
    word_ids = np.minimum(np.arange(t) // 2, t - 1)[None]
    word_ids_ref = np.concatenate(
        [word_ids, word_ids[:, -1:] + 1], axis=1)
    speech = rng.randint(0, sd.speech_token_size, (b, s)).astype(np.int64)
    speech_len = np.asarray([s], np.int64)
    feat_len = np.full((b,), mel_T, np.int64)

    t0 = time.perf_counter()
    with torch.no_grad():
        out_ref = ref(
            speaker_embeds=torch.from_numpy(spk),
            asr_token_ids=torch.from_numpy(asr),
            asr_token_lengths=torch.from_numpy(asr_len),
            asr_word_ids=torch.from_numpy(word_ids_ref.astype(np.int64)),
            audio_features=torch.from_numpy(mel),
            audio_feature_lengths=torch.from_numpy(feat_len),
            speech_token_ids=torch.from_numpy(speech),
            speech_token_lengths=torch.from_numpy(speech_len))
    print(f"reference forward: {time.perf_counter()-t0:.0f}s", file=sys.stderr)
    ref_logits = out_ref.speech_logits.float().numpy()
    # RVQ indices at asr level via the reference tower itself
    with torch.no_grad():
        ref_enc = ref.audio_tower(
            torch.from_numpy(asr), torch.from_numpy(asr_len),
            torch.from_numpy(mel), torch.from_numpy(feat_len),
            asr_word_ids=torch.from_numpy(word_ids_ref.astype(np.int64)))

    def run_ours(dtype):
        import jax.numpy as jnp
        if dtype == "float32":
            model = ours
        elif dtype == "served":
            # the production serving layout (bench.py): bf16 AR decoders /
            # flow / vocoder, f32 tokenizer tower — the taste indices must
            # hold the >99.9% agreement gate in the SHIPPED configuration
            model = TasteForCausalLM(ours.config, dtype=jnp.bfloat16,
                                     tower_dtype=jnp.float32)
        else:
            model = TasteForCausalLM(ours.config, dtype=jnp.bfloat16)
        out = model.apply(
            variables, jnp.asarray(spk),
            jnp.asarray(asr.astype(np.int32)),
            jnp.asarray(asr_len.astype(np.int32)),
            jnp.asarray(word_ids.astype(np.int32)),
            jnp.asarray(mel.transpose(0, 2, 1)),
            jnp.asarray(speech.astype(np.int32)),
            jnp.asarray(speech_len.astype(np.int32)),
            method=TasteForCausalLM.forward_speech_autoencoder)
        return (np.asarray(out["quantized_indices"]),
                np.asarray(out["speech_logits"], np.float32),
                np.asarray(out["speech_labels"]))

    t0 = time.perf_counter()
    idx_f32, logits_f32, labels = run_ours("float32")
    print(f"ours f32 forward: {time.perf_counter()-t0:.0f}s", file=sys.stderr)

    ref_indices = ref_enc["quantized_indices"].numpy()
    valid = labels != -1
    am_ref = ref_logits.argmax(-1)
    am_ours = logits_f32.argmax(-1)
    sl = min(am_ref.shape[1], am_ours.shape[1])
    vmask = valid[:, :sl]
    argmax_agree = float(
        (am_ref[:, :sl] == am_ours[:, :sl])[vmask].mean())
    diff_full = np.abs(ref_logits[:, :sl] - logits_f32[:, :sl])
    diff = diff_full[vmask]
    # margin-aware agreement (random weights flatten the logits; see slm)
    srt = np.sort(ref_logits[:, :sl], axis=-1)
    margin = srt[..., -1] - srt[..., -2]
    decided = (margin > 2 * diff_full.max(-1)) & vmask
    agree_decided = float((am_ref[:, :sl] == am_ours[:, :sl])[decided].mean())         if decided.any() else None
    rep = dict(
        speech_argmax_agreement_raw=argmax_agree,
        speech_argmax_agreement_decided=agree_decided,
        decided_fraction=float(decided.sum() / max(vmask.sum(), 1)),
        logits_max_abs_diff=float(diff.max()),
        logits_mean_abs_diff=float(diff.mean()),
        T_mel=mel_T, T_enc=w.max_source_positions,
        rvq=f"{q.num_quantizers}x{q.codebook_size}x{q.codebook_dim}")
    if ref_indices is not None:
        tt = min(ref_indices.shape[1], idx_f32.shape[1])
        rep["rvq_index_agreement"] = float(
            (ref_indices[:, :tt] == idx_f32[:, :tt]).mean())
    _report("tower_f32", rep)

    t0 = time.perf_counter()
    idx_bf16, logits_bf16, _ = run_ours("bfloat16")
    print(f"ours bf16 forward: {time.perf_counter()-t0:.0f}s", file=sys.stderr)
    rep16 = dict(
        speech_argmax_agreement_vs_ref=float(
            (am_ref[:, :sl] == logits_bf16.argmax(-1)[:, :sl])[vmask].mean()),
        rvq_index_agreement_vs_f32=float((idx_bf16 == idx_f32).mean()),
        speech_argmax_agreement_vs_f32=float(
            (logits_bf16.argmax(-1)[:, :sl] == am_ours[:, :sl])[vmask].mean()))
    if ref_indices is not None:
        rep16["rvq_index_agreement_vs_ref"] = float(
            (ref_indices[:, :tt] == idx_bf16[:, :tt]).mean())
    _report("tower_bf16", rep16)

    # the SHIPPED serving layout: f32 tower + bf16 decoders — the taste
    # indices (the tokenizer-parity gate) must agree >=99.9%
    t0 = time.perf_counter()
    idx_served, logits_served, _ = run_ours("served")
    print(f"ours served-layout forward: {time.perf_counter()-t0:.0f}s",
          file=sys.stderr)
    rep_served = dict(
        rvq_index_agreement_vs_f32=float((idx_served == idx_f32).mean()),
        speech_argmax_agreement_vs_ref=float(
            (am_ref[:, :sl]
             == logits_served.argmax(-1)[:, :sl])[vmask].mean()))
    if ref_indices is not None:
        rep_served["rvq_index_agreement_vs_ref"] = float(
            (ref_indices[:, :tt] == idx_served[:, :tt]).mean())
    _report("tower_served", rep_served)
    assert rep_served["rvq_index_agreement_vs_f32"] >= 0.999, rep_served


def run_slm(tmpdir):
    import torch
    from ref_compat import import_reference
    import jax
    import jax.numpy as jnp
    from taste_spokenlm_tpu.config import TasteConfig
    from taste_spokenlm_tpu.models.quantizer import Codebook
    from taste_spokenlm_tpu.models.spoken_lm import TasteSpokenLM
    from taste_spokenlm_tpu.utils.convert import rvq_state, spoken_lm_params

    mt = import_reference("taste_speech.modeling_taste")
    vq_mod = import_reference("ref_mt.vq.residual_vq")
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM

    full = TasteConfig.full()
    lc = full.spoken_lm.llama
    qc = full.audio_tower.quantizer
    torch.manual_seed(0)
    hf_cfg = HFLlamaConfig(
        vocab_size=lc.vocab_size, hidden_size=lc.hidden_size,
        intermediate_size=lc.intermediate_size,
        num_hidden_layers=lc.num_hidden_layers,
        num_attention_heads=lc.num_attention_heads,
        num_key_value_heads=lc.num_key_value_heads, head_dim=lc.head_dim,
        max_position_embeddings=16384, rope_theta=lc.rope_theta,
        rope_scaling=dict(rope_type="llama3",
                          factor=lc.rope_scaling_factor,
                          low_freq_factor=lc.rope_low_freq_factor,
                          high_freq_factor=lc.rope_high_freq_factor,
                          original_max_position_embeddings=lc.rope_original_max_position),
        attention_dropout=0.0, tie_word_embeddings=True,
        initializer_range=0.02)
    llama_dir = os.path.join(tmpdir, "llama_full")
    t0 = time.perf_counter()
    LlamaForCausalLM(hf_cfg).save_pretrained(llama_dir,
                                             safe_serialization=True)
    print(f"llama-1B random init+save: {time.perf_counter()-t0:.0f}s",
          file=sys.stderr)
    hf_cfg._name_or_path = llama_dir

    torch.manual_seed(1)
    rvq = vq_mod.ResidualVQ(
        dim=1280, num_quantizers=qc.num_quantizers,
        codebook_dim=qc.codebook_dim, codebook_size=qc.codebook_size,
        kmeans_init=False, decay=0.99, threshold_ema_dead_code=0,
        commitment_weight=1.0, sample_codebook_temp=0.0).eval()
    vq_sd = {k: v.detach().numpy() for k, v in rvq.state_dict().items()}
    _, quant = rvq_state(vq_sd, prefix="")
    cb = Codebook(embed=jnp.asarray(quant["embed"]),
                  proj_kernel=jnp.asarray(vq_sd["project_out.weight"].T),
                  proj_bias=jnp.asarray(vq_sd["project_out.bias"]))

    torch.manual_seed(2)
    ref = mt.TasteSpokenLM(
        text_config=hf_cfg, k=qc.codebook_size, d=qc.codebook_dim,
        sos_id=full.spoken_lm.sos_id, loss_weights="0.5-0.5",
        delay=full.spoken_lm.delay, delay_level=full.spoken_lm.delay_level,
        audio_embed_conv_mode="fill_forward", in_llm_module="weighted_sum",
        out_llm_module="weighted_layer", _attn_implementation="eager",
        use_lora=False).eval()
    ref.language_model = ref.language_model.to(torch.float32)
    with torch.no_grad():
        ref.pad_text_unit_embed.normal_(0, 0.1)
        ref.pad_audio_unit_embed.normal_(0, 0.1)

    ours_cfg = full.spoken_lm.replace(
        lora=None, use_lora=False, out_llm_module="weighted_layer")
    ours = TasteSpokenLM(ours_cfg, audio_dim=1280, taste_k=qc.codebook_size,
                         taste_d=qc.codebook_dim, taste_l=qc.num_quantizers)

    state = {f"spoken_lm.{k}": v.detach().float().numpy()
             for k, v in ref.state_dict().items()}
    params = {"params": spoken_lm_params(state)}

    rng = np.random.RandomState(11)
    b, t = 1, 64
    L = qc.num_quantizers
    ids = rng.randint(100, lc.vocab_size - 100, (b, t)).astype(np.int64)
    word_ids = np.minimum(np.arange(t) // 2, t - 1)[None]
    lens = np.asarray([t], np.int64)
    indices = np.full((b, t, L), -1, np.int64)
    starts = np.flatnonzero(np.diff(word_ids[0], prepend=-1) != 0)
    indices[:, starts] = rng.randint(0, qc.codebook_size,
                                     (b, len(starts), L))

    t0 = time.perf_counter()
    with torch.no_grad():
        out_ref = ref(
            torch.from_numpy(indices),
            torch.from_numpy(ids),
            torch.from_numpy(lens),
            torch.from_numpy(word_ids.astype(np.int64)),
            rvq, output_loss_at_inference=True)
    print(f"reference forward: {time.perf_counter()-t0:.0f}s", file=sys.stderr)

    t0 = time.perf_counter()
    out = ours.apply(
        params, cb, jnp.asarray(indices.astype(np.int32)),
        jnp.asarray(ids.astype(np.int32)), jnp.asarray(lens.astype(np.int32)),
        jnp.asarray(word_ids.astype(np.int32)))
    print(f"ours f32 forward: {time.perf_counter()-t0:.0f}s", file=sys.stderr)

    ref_tl = out_ref["text_logits"].float().numpy()
    our_tl = np.asarray(out["text_logits"], np.float32)
    labels = np.asarray(out["text_labels"])
    sl = min(ref_tl.shape[1], our_tl.shape[1])
    vmask = (labels != -1)[:, :sl]
    diff_full = np.abs(ref_tl[:, :sl] - our_tl[:, :sl])
    diff = diff_full[vmask]
    agree = float((ref_tl[:, :sl].argmax(-1)
                   == our_tl[:, :sl].argmax(-1))[vmask].mean())
    # with RANDOM weights the 128k logits are nearly flat, so raw argmax
    # agreement conflates f32 drift with razor-thin margins; report
    # margin-aware agreement: positions whose ref top1-top2 margin exceeds
    # the observed per-position drift are the decidable ones
    srt = np.sort(ref_tl[:, :sl], axis=-1)
    margin = srt[..., -1] - srt[..., -2]
    per_pos_drift = diff_full.max(-1)
    decided = (margin > 2 * per_pos_drift) & vmask
    agree_decided = float((ref_tl[:, :sl].argmax(-1)
                           == our_tl[:, :sl].argmax(-1))[decided].mean())         if decided.any() else None
    ref_ta = out_ref["taste_logits"].float().numpy()
    our_ta = np.asarray(out["taste_logits"], np.float32)
    ta_sl = min(ref_ta.shape[1], our_ta.shape[1])
    ta_diff = np.abs(ref_ta[:, :ta_sl] - our_ta[:, :ta_sl])
    _report("slm_f32", dict(
        text_argmax_agreement_raw=agree,
        text_argmax_agreement_decided=agree_decided,
        decided_fraction=float(decided.sum() / max(vmask.sum(), 1)),
        text_logits_max_abs_diff=float(diff.max()),
        text_logits_rel_drift=float(diff.max() / max(np.abs(ref_tl).max(),
                                                     1e-9)),
        taste_logits_max_abs_diff=float(ta_diff.max()),
        loss_ref=float(out_ref["loss"]) if "loss" in out_ref else None,
        loss_ours=float(out["loss"]),
        shape=f"{lc.num_hidden_layers}L/{lc.hidden_size}d T={t}"))


def run_serving(assert_floors: bool = True):
    """Fidelity of the SHIPPED serving tiers vs the float model (VERDICT r4
    #1): bench.py defaults to int8 weights + int4 lm_head + merged LoRA +
    fused qkv/gateup + fused DiT + Pallas HiFT convs, a numerically
    different configuration from the f32/bf16 rows above — this part puts a
    trajectory-agreement number on it at production shapes and GATES it.

    Torch-free (the f32 JAX model — itself reference-gated by the tower/slm
    parts — is the ground truth), so it runs on the real TPU chip where the
    Pallas serving kernels are native.  Rows:

      f32          unmerged-LoRA float model (ground truth)
      served_bf16  merged LoRA, bf16 decoders (r4 gated layout)
      served_int8  the bench DEFAULT tier (int8+int4head+fused qkv+DiT)
      served_int4  the int4 weight tier (BENCH_QUANT=4)

    Per row vs f32: greedy joint-decode trajectory agreement (text + taste),
    teacher-forced stepwise argmax agreement (margin-aware, as the slm part
    — random weights flatten logits), greedy S3 AR-decode trajectory
    agreement, and flow-mel relative error on a fixed token stream.
    Reference counterpart being replaced: unmerged peft adapters + fp16
    (modeling_taste.py:1030-1206,1559-1624) — the reference ships NO
    quantized tier and so has no fidelity number to match; the gate here is
    against our own float model."""
    import jax
    import jax.numpy as jnp
    from taste_spokenlm_tpu.config import TasteConfig
    from taste_spokenlm_tpu.models.sampler import (SamplerConfig,
                                                   build_sampler_tables)
    from taste_spokenlm_tpu.models.taste import TasteForCausalLM
    from taste_spokenlm_tpu.utils.quant import (_quantize_dense_leaf,
                                                merge_lora_params,
                                                quantize_encoder_params,
                                                quantize_llama_params)

    tiny = os.environ.get("TASTE_SERVING_PARITY_TINY", "") == "1"
    if tiny:                       # script-logic smoke (tests, CPU)
        cfg = TasteConfig.tiny()
        b, t_tok, decode_steps = 1, 8, 8
        max_speech, mel_len_max = 64, 128
        mel_frames = cfg.audio_tower.whisper.max_source_positions * 2
    else:
        cfg = TasteConfig.full()
        b, t_tok, decode_steps = 1, 40, 64
        max_speech, mel_len_max = 512, 904
        mel_frames = 3000
    lora = cfg.spoken_lm.lora

    # ---- shared float weights (decode path only: the whisper encoder /
    # segmenter never run here, so prune everything under audio_tower except
    # the RVQ the codebook reads — saves ~2.5 GB of f32 HBM) ----
    model_f32 = TasteForCausalLM(cfg)
    rng_np = np.random.RandomState(0)
    word_ids_np = np.minimum(np.arange(t_tok) // 2, t_tok - 1)
    asr_vocab = cfg.audio_tower.whisper.vocab_size
    llm_vocab = cfg.spoken_lm.llama.vocab_size
    L = cfg.audio_tower.quantizer.num_quantizers
    K = cfg.audio_tower.quantizer.codebook_size
    dummy = dict(
        speaker_embeds=jnp.zeros((b, cfg.speech_decoder.spk_embed_dim),
                                 jnp.float32),
        asr_token_ids=jnp.zeros((b, t_tok), jnp.int32),
        asr_token_lengths=jnp.full((b,), t_tok, jnp.int32),
        asr_word_ids=jnp.asarray(word_ids_np[None]),
        audio_features=jnp.zeros((b, cfg.audio_tower.whisper.n_mels,
                                  mel_frames), jnp.float32))
    t0 = time.perf_counter()
    shapes = jax.eval_shape(
        functools.partial(model_f32.init, method=TasteForCausalLM.init_all),
        {"params": jax.random.PRNGKey(0)}, jax.random.PRNGKey(1),
        dummy["speaker_embeds"], dummy["asr_token_ids"],
        dummy["asr_token_lengths"], dummy["asr_word_ids"],
        dummy["audio_features"],
        jnp.zeros((b, 8), jnp.int32), jnp.full((b,), 8, jnp.int32),
        dummy["asr_token_ids"] % llm_vocab, dummy["asr_token_lengths"],
        dummy["asr_word_ids"])
    shapes = dict(shapes)
    shapes["params"] = dict(shapes["params"],
                            audio_tower={"vq": shapes["params"]
                                         ["audio_tower"]["vq"]})
    shapes["quantizer"] = {"audio_tower":
                           shapes["quantizer"]["audio_tower"]}
    base = _fill_variables_f32(shapes)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(base["params"]))
    print(f"float weights: {n_params/1e6:.0f}M in "
          f"{time.perf_counter()-t0:.1f}s", file=sys.stderr)

    # ---- shared inputs (mirror bench.py serve_main) ----
    llm_ids = jnp.asarray(
        (rng_np.randint(100, 120000, (b, t_tok)) % llm_vocab), jnp.int32)
    llm_indices_np = np.full((b, t_tok, L), -1, np.int32)
    starts = np.flatnonzero(np.diff(word_ids_np, prepend=-1) != 0)
    llm_indices_np[:, starts] = rng_np.randint(0, K, (b, len(starts), L))
    llm_indices = jnp.asarray(llm_indices_np)
    lens = jnp.full((b,), t_tok, jnp.int32)
    words = jnp.asarray(word_ids_np[None])
    spk = jnp.asarray(rng_np.randn(b, cfg.speech_decoder.spk_embed_dim),
                      jnp.float32)
    tables = {k: jnp.asarray(v) for k, v in
              build_sampler_tables(_VocabStub(), llm_vocab).items()}
    # GREEDY sampler (top_p == 0.0 -> argmax in models/sampler.py): the
    # trajectory is deterministic, so disagreement measures numerics only
    scfg = SamplerConfig(
        delay=cfg.spoken_lm.delay, delay_level=cfg.spoken_lm.delay_level,
        extra_words=decode_steps, text_top_p=0.0, taste_top_p=0.0,
        text_temperature=1.0, repetition_penalty=1.1, has_prefix=True)
    gen_asr_len = 2 * decode_steps
    syn_asr_ids = jnp.asarray(
        rng_np.randint(100, 20000, (b, gen_asr_len)) % asr_vocab, jnp.int32)
    syn_asr_words = jnp.asarray(
        np.minimum(np.arange(gen_asr_len) // 2, decode_steps - 1)[None])
    syn_lens = jnp.full((b,), gen_asr_len, jnp.int32)

    def row_fns(model):
        jd = jax.jit(lambda v: model.apply(
            v, jax.random.PRNGKey(5), scfg, tables, llm_indices, llm_ids,
            lens, words, "audio", decode_steps,
            method=TasteForCausalLM.generate_completion))
        tf = jax.jit(lambda v: model.apply(
            v, llm_indices, llm_ids, lens, words,
            method=TasteForCausalLM.forward_spoken_llm))
        syn = jax.jit(lambda v, taste: model.apply(
            v, jax.random.PRNGKey(6), spk, taste, syn_asr_ids, syn_lens,
            syn_asr_words, max_speech_steps=max_speech,
            mel_len_max=mel_len_max, sampling_k=1,
            method=TasteForCausalLM.synthesize_from_taste))
        mel = jax.jit(lambda v, tokens, tok_lens: model.apply(
            v, jax.random.PRNGKey(7), tokens, tok_lens, spk, mel_len_max,
            method=lambda m, *a: m.voice_generator.flow.inference(*a)))
        return jd, tf, syn, mel

    def run_row(name, model, variables, ref=None, taste_ref=None,
                mel_tokens=None, mel_tok_lens=None):
        jd_f, tf_f, syn_f, mel_f = row_fns(model)
        t0 = time.perf_counter()
        jd = jax.device_get(jd_f(variables))
        tf = tf_f(variables)
        tf = {k: np.asarray(tf[k], np.float32) for k in
              ("text_logits", "taste_logits", "text_labels", "taste_labels")}
        taste_in = (taste_ref if taste_ref is not None
                    else _dense_taste(jd, decode_steps, L))
        syn = jax.device_get(syn_f(variables, jnp.asarray(taste_in)))
        if mel_tokens is None:
            mel_tokens = np.maximum(syn["speech_token_ids"], 0)
            mel_tok_lens = syn["speech_token_lengths"]
        mel, mel_lens = mel_f(variables, jnp.asarray(mel_tokens),
                              jnp.asarray(mel_tok_lens))
        mel = np.asarray(mel, np.float32)
        print(f"{name}: forward walls {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
        out = dict(jd=jd, tf=tf, syn=syn, mel=mel,
                   mel_tokens=mel_tokens, mel_tok_lens=mel_tok_lens,
                   taste_in=taste_in)
        if ref is None:
            n_jd = int(jd["num_tokens"][0])
            n_s3 = int(syn["speech_token_lengths"][0])
            assert n_jd >= decode_steps // 2, f"degenerate jd: {n_jd}"
            assert n_s3 >= min(64, max_speech // 2), \
                f"degenerate s3 decode: {n_s3}"
            _report(f"serving_{name}", dict(
                jd_tokens=n_jd, s3_tokens=n_s3,
                mel_frames=int(mel_lens[0])))
            return out
        rep = _serving_agreement(ref, out, decode_steps, L)
        _report(f"serving_{name}", rep)
        return out, rep

    # ---- row 1: f32 ground truth ----
    ref = run_row("f32", model_f32, base)

    # ---- row 2: merged LoRA + bf16 decoders (r4 gated layout) ----
    # production serving STORES params in bf16 (bench.py param_dtype), so
    # every row below gets the float leaves cast to bf16 — modules that
    # promote to the widest input dtype (e.g. the flow TapConvs) must see
    # bf16 weights, exactly as deployed, or the mel/flow drift reads ~0
    def to_bf16(tree):
        return jax.tree_util.tree_map(
            lambda x: (x.astype(jnp.bfloat16)
                       if hasattr(x, "dtype")
                       and jnp.issubdtype(x.dtype, jnp.floating)
                       and x.dtype == jnp.float32 else x), tree)

    merged = dict(base["params"])
    sl = dict(merged["spoken_lm"])
    sl["language_model"] = merge_lora_params(
        sl["language_model"], lora.alpha, lora.r)
    merged["spoken_lm"] = sl
    cfg_m = cfg.replace(spoken_lm=cfg.spoken_lm.replace(use_lora=False))
    q_bf16 = to_bf16(base["quantizer"])
    vars_m = {"params": to_bf16(merged), "quantizer": q_bf16}
    model_bf16 = TasteForCausalLM(cfg_m, dtype=jnp.bfloat16,
                                  tower_dtype=jnp.float32)
    _, rep_bf16 = run_row("bf16_merged", model_bf16, vars_m, ref=ref,
                          taste_ref=ref["taste_in"],
                          mel_tokens=ref["mel_tokens"],
                          mel_tok_lens=ref["mel_tok_lens"])

    def quant_row(qs):
        head_mode = "int4"   # bench default BENCH_INT4_HEAD=1
        # quantize on the HOST cpu device: the round/clip transients over
        # the 1B-param tree (plus the f32 master + bf16 row copies already
        # resident) OOM the 16 GB chip if run there
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            p_host = jax.device_put(merged, cpu)
            p = dict(p_host)
            slq = dict(p["spoken_lm"])
            slq["language_model"] = quantize_llama_params(
                slq["language_model"], include_embed=True, mode=qs,
                embed_head_mode=head_mode, fuse_qkv=True)
            p["spoken_lm"] = slq
            sd = dict(p["speech_decoder"])
            sd["llm"] = quantize_encoder_params(sd["llm"], mode=qs,
                                                fuse_qkv=True)
            sd["llm_decoder"] = _quantize_dense_leaf(sd["llm_decoder"], qs)
            p["speech_decoder"] = sd
            p = to_bf16(p)
        p = jax.device_put(p, jax.devices()[0])
        cfg_q = cfg_m.replace(
            spoken_lm=cfg_m.spoken_lm.replace(
                llama=cfg_m.spoken_lm.llama.replace(
                    quantized_serving=qs,
                    quantized_embed_serving="int4head",
                    fused_qkv_serving=True)),
            speech_decoder=cfg_m.speech_decoder.replace(
                llm=cfg_m.speech_decoder.llm.replace(
                    quantized_serving=qs, fused_qkv_serving=True)),
            flow=cfg_m.flow.replace(fused_dit_serving=True),
            hift=cfg_m.hift.replace(pallas_conv=True))
        model_q = TasteForCausalLM(cfg_q, dtype=jnp.bfloat16,
                                   tower_dtype=jnp.float32)
        # quantized FROM f32, remaining float leaves stored bf16 (scales
        # included) — byte-for-byte the bench serving layout
        return run_row(f"{qs}_fused", model_q,
                       {"params": p, "quantizer": q_bf16},
                       ref=ref, taste_ref=ref["taste_in"],
                       mel_tokens=ref["mel_tokens"],
                       mel_tok_lens=ref["mel_tok_lens"])

    # ---- rows 3-4: the bench-default int8 tier and the int4 tier ----
    del vars_m   # free the bf16 row's device tree before the quant rows
    _, rep_i8 = quant_row("int8")
    _, rep_i4 = quant_row("int4")

    if assert_floors and not tiny:
        # floors set from the recorded measurement
        # (docs/FULL_ARCH_PARITY.md serving section: bf16/int8 greedy jd
        # and S3 trajectories agree 1.0 with the f32 model at production
        # shapes) with safety margin.  The tf_*_decided metric is NOT
        # gated: under int8 drift on random-weight (near-flat) logits the
        # decidable set can be empty, which would make the gate vacuous.
        for nm, rep, jd_floor, s3_floor in (
                ("bf16_merged", rep_bf16, 0.98, 0.98),
                ("int8_fused", rep_i8, 0.98, 0.95)):
            assert rep["jd_text_trajectory_agreement"] >= jd_floor, (nm, rep)
            assert rep["s3_trajectory_agreement"] >= s3_floor, (nm, rep)
            assert rep["tf_taste_agreement"] >= 0.98, (nm, rep)
            assert rep["mel_rel_err"] <= 0.05, (nm, rep)
        # int4 (opt-in HBM-capacity tier): the text/taste channels must
        # hold, but its greedy S3 trajectory DIVERGES (recorded 0.668,
        # first flip at step 3) — that is the tier's documented trade-off
        # and exactly why the serving default stays int8
        assert rep_i4["jd_text_trajectory_agreement"] >= 0.90, rep_i4
        assert rep_i4["tf_taste_agreement"] >= 0.95, rep_i4
        assert rep_i4["mel_rel_err"] <= 0.10, rep_i4
        print("serving fidelity floors: PASS", file=sys.stderr)


def _dense_taste(jd, max_words, L):
    n = max(int(jd["num_taste_words"][0]), 1)
    dense = np.zeros((1, max_words, L), np.int32)
    dense[0, :n] = np.maximum(np.asarray(jd["taste_indices"])[0, :n], 0)
    return dense


def _serving_agreement(ref, row, decode_steps, L):
    """All agreement metrics of one serving row vs the f32 reference."""
    out = {}
    # greedy joint-decode trajectory: token-for-token over the shared span
    n = min(int(ref["jd"]["num_tokens"][0]), int(row["jd"]["num_tokens"][0]))
    a = np.asarray(ref["jd"]["llm_token_ids"])[0, :n]
    b_ = np.asarray(row["jd"]["llm_token_ids"])[0, :n]
    out["jd_tokens"] = int(row["jd"]["num_tokens"][0])
    out["jd_text_trajectory_agreement"] = float((a == b_).mean())
    div = np.flatnonzero(a != b_)
    out["jd_first_divergence"] = int(div[0]) if len(div) else n
    nw = min(int(ref["jd"]["num_taste_words"][0]),
             int(row["jd"]["num_taste_words"][0]))
    out["jd_words"] = int(row["jd"]["num_taste_words"][0])
    if nw > 0:
        ta = np.asarray(ref["jd"]["taste_indices"])[0, :nw]
        tb = np.asarray(row["jd"]["taste_indices"])[0, :nw]
        out["jd_taste_trajectory_agreement"] = float((ta == tb).mean())
    else:
        # the greedy stub-vocab trajectory can stay inside one word; the
        # taste channel is then covered by tf_taste_agreement below
        out["jd_taste_trajectory_agreement"] = None
    # teacher-forced stepwise argmax (no compounding); margin-aware like
    # the slm part: random weights flatten the 128k logits, so positions
    # whose f32 top1-top2 margin exceeds the observed drift are the
    # decidable ones
    rtl, otl = ref["tf"]["text_logits"], row["tf"]["text_logits"]
    vmask = ref["tf"]["text_labels"] != -1
    agree = (rtl.argmax(-1) == otl.argmax(-1)) & vmask
    out["tf_text_agreement_raw"] = float(agree.sum() / vmask.sum())
    drift = np.abs(rtl - otl).max(-1)
    srt = np.sort(rtl, axis=-1)
    margin = srt[..., -1] - srt[..., -2]
    decided = (margin > 2 * drift) & vmask
    out["tf_text_agreement_decided"] = (
        float(agree[decided].mean()) if decided.any() else 1.0)
    out["tf_decided_fraction"] = float(decided.sum() / max(vmask.sum(), 1))
    rta, ota = ref["tf"]["taste_logits"], row["tf"]["taste_logits"]
    tmask = (ref["tf"]["taste_labels"] != -1)
    tagree = (rta.argmax(-1) == ota.argmax(-1)) & tmask
    out["tf_taste_agreement"] = float(tagree.sum() / max(tmask.sum(), 1))
    # greedy S3 AR decode from the SAME taste rows
    sa = np.asarray(ref["syn"]["speech_token_ids"])[0]
    sb = np.asarray(row["syn"]["speech_token_ids"])[0]
    ns = min(int(ref["syn"]["speech_token_lengths"][0]),
             int(row["syn"]["speech_token_lengths"][0]))
    out["s3_tokens"] = int(row["syn"]["speech_token_lengths"][0])
    out["s3_trajectory_agreement"] = float((sa[:ns] == sb[:ns]).mean())
    sdiv = np.flatnonzero(sa[:ns] != sb[:ns])
    out["s3_first_divergence"] = int(sdiv[0]) if len(sdiv) else ns
    # flow-mel on the FIXED f32 token stream: pure numerics, no trajectory
    nf = min(ref["mel"].shape[1], row["mel"].shape[1])
    rm, om = ref["mel"][:, :nf], row["mel"][:, :nf]
    print(f"mel norms ref={np.linalg.norm(rm):.4f} "
          f"row={np.linalg.norm(om):.4f} "
          f"diff={np.linalg.norm(om - rm):.6f}", file=sys.stderr)
    out["mel_rel_err"] = float(np.linalg.norm(om - rm)
                               / max(np.linalg.norm(rm), 1e-9))
    return {k: (round(v, 4) if isinstance(v, float) else v)
            for k, v in out.items()}


class _VocabStub:
    """Deterministic id->subword map standing in for the llama tokenizer
    (bench.py _VocabScan; table SHAPES and sampler behavior identical)."""

    def decode(self, i):
        r = i % 11
        return (" the", "ing", ".", " end.", "!!", "a\nb", " word", "s",
                ",'", " no.", "xyz")[r]


def _fill_variables_f32(shapes):
    """Random f32 weights ON DEVICE (bench.py _fill_variables, pinned f32:
    these are the master weights every serving tier derives from)."""
    import jax
    import jax.numpy as jnp
    counter = iter(range(10 ** 9))
    base_key = jax.random.PRNGKey(42)
    fill_fns = {}

    def fill_fn(shape, scale):
        key = (shape, scale)
        if key not in fill_fns:
            fill_fns[key] = jax.jit(functools.partial(
                lambda k, s, sc: jax.random.normal(k, s, jnp.float32) * sc,
                s=shape, sc=scale))
        return fill_fns[key]

    def make(path, leaf):
        name = str(getattr(path[-1], "key", path[-1])) if path else ""
        if leaf.dtype == jnp.bool_:
            return jnp.full(leaf.shape, name == "initted", bool)
        if not np.issubdtype(leaf.dtype, np.floating):
            return jnp.zeros(leaf.shape, leaf.dtype)
        scale = 0.02 if leaf.ndim >= 2 else 1e-3
        k = jax.random.fold_in(base_key, next(counter))
        return fill_fn(tuple(leaf.shape), scale)(k)

    variables = jax.tree_util.tree_map_with_path(make, shapes)
    jax.block_until_ready(variables)
    return variables


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--part", choices=["tower", "slm", "serving"],
                   required=True)
    p.add_argument("--platform", default=None)
    p.add_argument("--tmpdir", default="/tmp/full_arch_parity")
    p.add_argument("--no-assert", action="store_true",
                   help="serving part: measure without gating (for picking "
                        "floors)")
    args = p.parse_args()
    os.makedirs(args.tmpdir, exist_ok=True)
    from taste_spokenlm_tpu.utils.platform import force_platform
    if args.part == "serving":
        # torch-free; runs on the ambient platform (the real TPU chip —
        # the Pallas serving kernels are native there)
        os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                              "/root/repo/.jax_cache_tpu")
        force_platform(args.platform)
        import jax
        jax.config.update("jax_default_matmul_precision", "highest")
        try:
            jax.config.update("jax_compilation_cache_dir",
                              os.environ["JAX_COMPILATION_CACHE_DIR"])
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              1.0)
        except Exception:
            pass
        run_serving(assert_floors=not args.no_assert)
        return
    force_platform(args.platform or "cpu")
    import jax
    jax.config.update("jax_default_matmul_precision", "highest")
    if args.part == "tower":
        run_tower(args.tmpdir)
    else:
        run_slm(args.tmpdir)


if __name__ == "__main__":
    main()
