"""Streaming synthesis: chunked S3 decode parity + windowed vocoding seams.

The reference pipeline never streams (modeling_taste.py:1742-1791 decodes
everything, flows the whole mel, then vocodes); these tests pin the TPU
streaming redesign:

  * chunked AR decode reproduces the one-shot trajectory EXACTLY,
  * the StreamingSynthesizer emits the same token stream as
    synthesize_from_taste on the same key, with continuous wav chunks.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from taste_spokenlm_tpu.config import SpeechDecoderConfig, TasteConfig
from taste_spokenlm_tpu.models.speech_decoder import TasteSpeechDecoder
from taste_spokenlm_tpu.models.taste import TasteForCausalLM


@pytest.fixture(scope="module")
def decoder_setup():
    cfg = SpeechDecoderConfig.tiny()
    model = TasteSpeechDecoder(cfg)
    rng = np.random.RandomState(0)
    b, t = 2, 6
    spk = jnp.asarray(rng.randn(b, cfg.spk_embed_dim), jnp.float32)
    audio = jnp.asarray(rng.randn(b, t, cfg.audio_encoder_input_size),
                        jnp.float32)
    asr_ids = jnp.asarray(rng.randint(0, cfg.text_token_size, (b, t)))
    asr_lens = jnp.asarray([6, 4])
    sp_ids = jnp.asarray(rng.randint(0, cfg.speech_token_size, (b, 10)))
    variables = model.init(jax.random.PRNGKey(0), spk, audio, asr_lens,
                           asr_ids, asr_lens, sp_ids, jnp.asarray([10, 7]))
    return cfg, model, variables, (spk, audio, asr_lens, asr_ids, asr_lens)


def test_chunked_decode_matches_oneshot_exactly(decoder_setup):
    cfg, model, variables, (spk, audio, asr_lens, asr_ids, _) = decoder_setup
    max_steps = 16
    key = jax.random.PRNGKey(5)
    oneshot = model.apply(variables, key, spk, audio, asr_lens, asr_ids,
                          asr_lens, max_steps=max_steps,
                          method=TasteSpeechDecoder.generate)

    state = model.apply(variables, key, spk, audio, asr_lens, asr_ids,
                        asr_lens, max_steps=max_steps,
                        method=TasteSpeechDecoder.generate_stream_init)
    chunks = []
    for _ in range(4):
        toks, state = model.apply(
            variables, state, 4,
            method=TasteSpeechDecoder.generate_stream_chunk)
        chunks.append(np.asarray(toks))
    streamed = np.concatenate(chunks, axis=1)
    np.testing.assert_array_equal(streamed,
                                  np.asarray(oneshot["speech_token_ids"]))
    lengths = (streamed >= 0).sum(axis=1)
    np.testing.assert_array_equal(
        lengths, np.asarray(oneshot["speech_token_lengths"]))


@pytest.fixture(scope="module")
def taste_setup():
    cfg = TasteConfig.tiny()
    model = TasteForCausalLM(cfg)
    rng = np.random.RandomState(0)
    b, t_tok, t_sp, t_llm = 1, 8, 12, 7
    variables = model.init(
        jax.random.PRNGKey(0), jax.random.PRNGKey(1),
        jnp.asarray(rng.randn(b, cfg.speech_decoder.spk_embed_dim),
                    jnp.float32),
        jnp.asarray(rng.randint(5, 100, (b, t_tok))), jnp.asarray([t_tok]),
        jnp.asarray((np.arange(t_tok) // 2)[None]),
        jnp.asarray(rng.randn(b, cfg.audio_tower.whisper.n_mels,
                              cfg.audio_tower.whisper.max_source_positions * 2),
                    jnp.float32),
        jnp.asarray(rng.randint(0, cfg.speech_decoder.speech_token_size,
                                (b, t_sp))), jnp.asarray([t_sp]),
        jnp.asarray(rng.randint(2, 100, (b, t_llm))), jnp.asarray([t_llm]),
        jnp.asarray((np.arange(t_llm) // 2)[None]),
        method=TasteForCausalLM.init_all)
    rngd = np.random.RandomState(1)
    t = 9
    nq = cfg.audio_tower.quantizer.num_quantizers
    args = dict(
        speaker_embeds=jnp.asarray(
            rngd.randn(1, cfg.speech_decoder.spk_embed_dim), jnp.float32),
        taste=jnp.asarray(rngd.randint(
            0, cfg.audio_tower.quantizer.codebook_size, (1, 4, nq))),
        asr_ids=jnp.asarray(rngd.randint(5, 100, (1, t))),
        asr_lens=jnp.asarray([t]),
        asr_words=jnp.asarray(np.minimum(np.arange(t) // 3, 3)[None]),
    )
    return cfg, model, variables, args


def test_streaming_synthesis_matches_tokens_and_is_continuous(taste_setup):
    cfg, model, variables, a = taste_setup
    from taste_spokenlm_tpu.frontend.streaming import (StreamingSynthesizer,
                                                       mel_per_token)
    key = jax.random.PRNGKey(3)
    max_steps = 16
    oneshot = model.apply(
        variables, key, a["speaker_embeds"], a["taste"], a["asr_ids"],
        a["asr_lens"], a["asr_words"], max_speech_steps=max_steps,
        mel_len_max=40, method=TasteForCausalLM.synthesize_from_taste)

    syn = StreamingSynthesizer(model, variables, chunk_tokens=5,
                               left_ctx_tokens=3, crossfade_tokens=1,
                               max_speech_steps=max_steps)
    chunks = list(syn.stream(key, a["speaker_embeds"], a["taste"],
                             a["asr_ids"], a["asr_lens"], a["asr_words"]))
    assert chunks and chunks[-1]["is_last"]
    streamed_tokens = np.concatenate([c["tokens"] for c in chunks], axis=1)
    ref_tokens = np.asarray(oneshot["speech_token_ids"])
    n = int(np.asarray(oneshot["speech_token_lengths"])[0])
    # identical decode trajectory (same key split)
    np.testing.assert_array_equal(streamed_tokens[0, :n], ref_tokens[0, :n])

    wav = np.concatenate([c["wav"] for c in chunks], axis=1)
    assert np.isfinite(wav).all()
    # total streamed duration tracks the token count (window quantization
    # is < one mel frame per seam)
    spf = np.asarray(oneshot["waveform"]).shape[1] // 40   # mel_len_max=40
    mpt = mel_per_token(cfg.flow)
    expect = int(np.floor(n * mpt)) * spf
    assert abs(wav.shape[1] - expect) <= 2 * spf * len(chunks)
    # seams are not discontinuities: the max first-difference near each seam
    # is bounded by a few times the global max first-difference
    d = np.abs(np.diff(wav[0]))
    seams = np.cumsum([c["wav"].shape[1] for c in chunks])[:-1]
    interior = np.ones(len(d), bool)
    for sm in seams:
        interior[max(0, sm - 4):sm + 4] = False
    base = d[interior].max() if interior.any() else 0.0
    if base > 0:
        for sm in seams:
            lo, hi = max(0, sm - 4), min(len(d), sm + 4)
            assert d[lo:hi].max() <= 5.0 * base + 1e-6, (sm, d[lo:hi].max(), base)


def test_streaming_small_first_chunk_same_tokens(taste_setup):
    """first_chunk_tokens < chunk_tokens (the TTFA cut) must not change the
    decoded token stream — chunk boundaries are invisible to the AR
    trajectory — and every chunk's audio stays finite."""
    cfg, model, variables, a = taste_setup
    from taste_spokenlm_tpu.frontend.streaming import StreamingSynthesizer
    key = jax.random.PRNGKey(3)
    max_steps = 16
    base = StreamingSynthesizer(model, variables, chunk_tokens=5,
                                left_ctx_tokens=3, crossfade_tokens=1,
                                max_speech_steps=max_steps)
    small = StreamingSynthesizer(model, variables, chunk_tokens=5,
                                 left_ctx_tokens=3, crossfade_tokens=1,
                                 first_chunk_tokens=2,
                                 max_speech_steps=max_steps)
    args = (key, a["speaker_embeds"], a["taste"], a["asr_ids"],
            a["asr_lens"], a["asr_words"])
    chunks_b = list(base.stream(*args))
    chunks_s = list(small.stream(*args))
    tok_b = np.concatenate([c["tokens"] for c in chunks_b], axis=1)
    tok_s = np.concatenate([c["tokens"] for c in chunks_s], axis=1)
    keep_b = tok_b[tok_b >= 0]
    keep_s = tok_s[tok_s >= 0]
    np.testing.assert_array_equal(keep_b, keep_s)
    assert chunks_s[0]["n_new"] <= 2          # first chunk really is small
    assert chunks_s[-1]["is_last"]
    for c in chunks_s:
        assert np.isfinite(c["wav"]).all()
    # same total emitted duration as the uniform chunking (within seam
    # quantization: one mel frame per seam each way)
    n_b = sum(c["wav"].shape[1] for c in chunks_b)
    n_s = sum(c["wav"].shape[1] for c in chunks_s)
    spf_est = max(n_b // max(len(keep_b), 1), 1)
    assert abs(n_b - n_s) <= 2 * spf_est * (len(chunks_s) + len(chunks_b))


def test_streaming_synthesize_reports_ttfa(taste_setup):
    cfg, model, variables, a = taste_setup
    from taste_spokenlm_tpu.frontend.streaming import StreamingSynthesizer
    syn = StreamingSynthesizer(model, variables, chunk_tokens=6,
                               left_ctx_tokens=3, max_speech_steps=12)
    wav, ttfa = syn.synthesize(jax.random.PRNGKey(4), a["speaker_embeds"],
                               a["taste"], a["asr_ids"], a["asr_lens"],
                               a["asr_words"])
    assert wav.shape[0] == 1 and wav.shape[1] > 0
    assert ttfa > 0
