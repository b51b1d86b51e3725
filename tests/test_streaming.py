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


def test_resume_replay_matches_uninterrupted_stream(decoder_setup):
    """generate_stream_resume (re-prefill + multi-token history replay)
    must continue EXACTLY like the uninterrupted stream when the text is
    unchanged: replayed KV rows == step-by-step rows, rng fast-forward ==
    the executed per-step splits."""
    cfg, model, variables, (spk, audio, asr_lens, asr_ids, _) = decoder_setup
    max_steps = 16
    key = jax.random.PRNGKey(5)
    state = model.apply(variables, key, spk, audio, asr_lens, asr_ids,
                        asr_lens, max_steps=max_steps,
                        method=TasteSpeechDecoder.generate_stream_init)
    toks1, state1 = model.apply(
        variables, state, 8, method=TasteSpeechDecoder.generate_stream_chunk)
    toks1 = np.asarray(toks1)
    assert (toks1 >= 0).all(), "precondition: no EOS inside the first chunk"
    ref_toks2, _ = model.apply(
        variables, state1, 8, method=TasteSpeechDecoder.generate_stream_chunk)

    hist = np.zeros((toks1.shape[0], max_steps), np.int32)
    hist[:, :8] = np.maximum(toks1, 0)
    resumed = model.apply(
        variables, key, spk, audio, asr_lens, asr_ids, asr_lens,
        jnp.asarray(hist), jnp.int32(8), max_steps=max_steps,
        method=TasteSpeechDecoder.generate_stream_resume)
    res_toks2, _ = model.apply(
        variables, resumed, 8, method=TasteSpeechDecoder.generate_stream_chunk)
    np.testing.assert_array_equal(np.asarray(res_toks2),
                                  np.asarray(ref_toks2))


def test_resume_with_extended_text_changes_conditioning(decoder_setup):
    """Resume with LONGER text must produce a valid continuation that
    actually conditions on the new tokens (different from the short-text
    continuation), with the committed history untouched."""
    cfg, model, variables, (spk, audio, asr_lens, asr_ids, _) = decoder_setup
    max_steps = 16
    key = jax.random.PRNGKey(5)
    short_lens = jnp.asarray([4, 3])
    state = model.apply(variables, key, spk, audio, short_lens, asr_ids,
                        short_lens, max_steps=max_steps,
                        method=TasteSpeechDecoder.generate_stream_init)
    toks1, _ = model.apply(
        variables, state, 8, method=TasteSpeechDecoder.generate_stream_chunk)
    toks1 = np.asarray(toks1)
    assert (toks1 >= 0).all()
    hist = np.zeros((toks1.shape[0], max_steps), np.int32)
    hist[:, :8] = np.maximum(toks1, 0)
    resumed = model.apply(
        variables, key, spk, audio, asr_lens, asr_ids, asr_lens,
        jnp.asarray(hist), jnp.int32(8), max_steps=max_steps,
        method=TasteSpeechDecoder.generate_stream_resume)
    toks2, _ = model.apply(
        variables, resumed, 8, method=TasteSpeechDecoder.generate_stream_chunk)
    toks2 = np.asarray(toks2)
    assert int(resumed["step"]) == 8
    # valid ids (EOS/-1 allowed at the tail)
    live = toks2[toks2 >= 0]
    assert (live <= cfg.speech_token_size).all()


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


def test_streaming_chunk_schedule_same_tokens(taste_setup):
    """Adaptive chunk growth (chunk_schedule) must not change the decoded
    token stream — only the window partitioning — and the emitted duration
    must match uniform chunking within seam quantization."""
    cfg, model, variables, a = taste_setup
    from taste_spokenlm_tpu.frontend.streaming import StreamingSynthesizer
    key = jax.random.PRNGKey(3)
    max_steps = 16
    base = StreamingSynthesizer(model, variables, chunk_tokens=5,
                                left_ctx_tokens=3, crossfade_tokens=1,
                                max_speech_steps=max_steps)
    grown = StreamingSynthesizer(model, variables, chunk_tokens=3,
                                 left_ctx_tokens=3, crossfade_tokens=1,
                                 first_chunk_tokens=2,
                                 chunk_schedule=(3, 6, 9),
                                 max_speech_steps=max_steps)
    args = (key, a["speaker_embeds"], a["taste"], a["asr_ids"],
            a["asr_lens"], a["asr_words"])
    chunks_b = list(base.stream(*args))
    chunks_g = list(grown.stream(*args))
    tok_b = np.concatenate([c["tokens"] for c in chunks_b], axis=1)
    tok_g = np.concatenate([c["tokens"] for c in chunks_g], axis=1)
    np.testing.assert_array_equal(tok_b[tok_b >= 0], tok_g[tok_g >= 0])
    # growth really happened: later chunks carry more new tokens than the
    # first, and fewer windows were paid overall
    n_new = [c["n_new"] for c in chunks_g]
    assert n_new[0] <= 2 and max(n_new) > n_new[0]
    assert chunks_g[-1]["is_last"]
    for c in chunks_g:
        assert np.isfinite(c["wav"]).all()
    n_b = sum(c["wav"].shape[1] for c in chunks_b)
    n_g = sum(c["wav"].shape[1] for c in chunks_g)
    keep = tok_b[tok_b >= 0]
    spf_est = max(n_b // max(len(keep), 1), 1)
    assert abs(n_b - n_g) <= 2 * spf_est * (len(chunks_g) + len(chunks_b))


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


# ---------------------------------------------------------------------------
# pipelined completion (CompletionStreamer)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def completion_setup(taste_setup):
    cfg, model, variables, a = taste_setup
    from taste_spokenlm_tpu.models.sampler import SamplerConfig
    rng = np.random.RandomState(7)
    V = cfg.spoken_lm.llama.vocab_size
    L = cfg.audio_tower.quantizer.num_quantizers
    K = cfg.audio_tower.quantizer.codebook_size
    b, t = 1, 8
    word_ids = np.arange(t) // 2
    llm_ids = jnp.asarray(rng.randint(2, V, (b, t)), jnp.int32)
    indices = np.full((b, t, L), -1, np.int32)
    starts = np.flatnonzero(np.diff(word_ids, prepend=-1) != 0)
    indices[:, starts] = rng.randint(0, K, (b, len(starts), L))
    tables = {"word_start": jnp.asarray(np.arange(V) % 3 == 0),
              "banned": jnp.zeros((V,), bool),
              "sentence_end": jnp.asarray(np.arange(V) % 7 == 0)}
    scfg = SamplerConfig(delay=cfg.spoken_lm.delay, delay_level="word",
                         extra_words=16, has_prefix=True)  # greedy
    jd_inputs = dict(llm_indices=jnp.asarray(indices), llm_token_ids=llm_ids,
                     llm_token_lengths=jnp.asarray([t]),
                     llm_word_ids=jnp.asarray(word_ids[None]))
    # full-budget asr buffers for the completion text (fixed shape; only
    # lengths vary as the joint decode produces words)
    t_asr = 12
    syn_asr = dict(
        asr_token_ids=jnp.asarray(rng.randint(5, 100, (b, t_asr))),
        asr_word_ids=jnp.asarray(np.minimum(np.arange(t_asr) // 2, 5)[None]))
    return cfg, model, variables, a, scfg, tables, jd_inputs, syn_asr


def test_completion_streamer_pipelined_end_to_end(completion_setup):
    """Pipelined completion: synthesis starts from a PARTIAL joint decode
    and re-contextualizes as more words arrive (stream_extend_step).  The
    audio must be finite and the committed S3 stream in-vocab."""
    cfg, model, variables, a, scfg, tables, jd, syn_asr = completion_setup
    from taste_spokenlm_tpu.frontend.streaming import CompletionStreamer
    streamer = CompletionStreamer(
        model, variables, scfg, tables, chunk_tokens=5, left_ctx_tokens=3,
        crossfade_tokens=1, first_chunk_tokens=2, jd_first_chunk=3,
        jd_chunk=4, min_start_words=1, max_speech_steps=12)
    chunks = list(streamer.stream(
        jax.random.PRNGKey(11), a["speaker_embeds"], jd["llm_indices"],
        jd["llm_token_ids"], jd["llm_token_lengths"], jd["llm_word_ids"],
        syn_asr["asr_token_ids"], syn_asr["asr_word_ids"], max_steps=10))
    assert chunks, "pipelined stream produced no audio"
    assert chunks[-1]["is_last"]
    assert chunks[-1]["jd_done"], "joint decode must finish within budget"
    for c in chunks:
        assert np.isfinite(c["wav"]).all()
    toks = np.concatenate([c["tokens"] for c in chunks], axis=1)
    live = toks[toks >= 0]
    assert live.size > 0
    assert (live <= cfg.speech_decoder.speech_token_size).all()
    # total emitted tokens respect the budget
    assert live.size <= 12
    # the jd really was partial when synthesis started: with
    # jd_first_chunk=3 < max_steps=10, n_words grows across chunks
    assert chunks[0]["n_words"] <= chunks[-1]["n_words"]


def test_completion_streamer_matches_plain_stream_when_jd_first(
        completion_setup):
    """With the whole joint decode in the FIRST jd chunk (no extends), the
    pipelined stream must equal StreamingSynthesizer on the final text —
    pins that the pipelined plumbing adds nothing when there is nothing to
    pipeline."""
    cfg, model, variables, a, scfg, tables, jd, syn_asr = completion_setup
    from taste_spokenlm_tpu.frontend.streaming import (CompletionStreamer,
                                                       StreamingSynthesizer)
    max_steps = 10
    key = jax.random.PRNGKey(11)
    streamer = CompletionStreamer(
        model, variables, scfg, tables, chunk_tokens=5, left_ctx_tokens=3,
        crossfade_tokens=1, first_chunk_tokens=2, jd_first_chunk=max_steps,
        min_start_words=1, max_speech_steps=12)
    chunks_p = list(streamer.stream(
        key, a["speaker_embeds"], jd["llm_indices"], jd["llm_token_ids"],
        jd["llm_token_lengths"], jd["llm_word_ids"],
        syn_asr["asr_token_ids"], syn_asr["asr_word_ids"],
        max_steps=max_steps))
    assert chunks_p and chunks_p[-1]["is_last"]
    n_words = chunks_p[-1]["n_words"]
    assert all(c["n_words"] == n_words for c in chunks_p), "no extends"

    # reproduce the final text view + rng stream of the pipelined run
    rng_jd, rng_syn = jax.random.split(key)
    words_np = np.asarray(syn_asr["asr_word_ids"])
    lens = jnp.asarray(np.sum(words_np < n_words, axis=1).astype(np.int32))
    # taste rows exactly as the jd produced them
    out = model.apply(
        variables, rng_jd, scfg, tables,
        jd["llm_indices"], jd["llm_token_ids"], jd["llm_token_lengths"],
        jd["llm_word_ids"], "audio", max_steps,
        method=TasteForCausalLM.generate_completion)
    taste = jnp.asarray(np.maximum(np.asarray(out["taste_indices"]), 0))
    plain = StreamingSynthesizer(
        model, variables, chunk_tokens=5, left_ctx_tokens=3,
        crossfade_tokens=1, first_chunk_tokens=2, max_speech_steps=12)
    chunks_s = list(plain.stream(rng_syn, a["speaker_embeds"], taste,
                                 syn_asr["asr_token_ids"], lens,
                                 syn_asr["asr_word_ids"]))
    tok_p = np.concatenate([c["tokens"] for c in chunks_p], axis=1)
    tok_s = np.concatenate([c["tokens"] for c in chunks_s], axis=1)
    np.testing.assert_array_equal(tok_p[tok_p >= 0], tok_s[tok_s >= 0])
    wav_p = np.concatenate([c["wav"] for c in chunks_p], axis=1)
    wav_s = np.concatenate([c["wav"] for c in chunks_s], axis=1)
    assert wav_p.shape == wav_s.shape
    np.testing.assert_allclose(wav_p, wav_s, atol=1e-5)


def test_completion_streamer_reuse_with_different_max_steps(completion_setup):
    """A second stream() on the SAME instance with a different max_steps
    must honor the new decode budget (regression: the jd_start jit was
    memoized by name only, so the second call silently reused the first
    budget and could hang phase 1 when the new budget was larger)."""
    cfg, model, variables, a, scfg, tables, jd, syn_asr = completion_setup
    from taste_spokenlm_tpu.frontend.streaming import CompletionStreamer
    streamer = CompletionStreamer(
        model, variables, scfg, tables, chunk_tokens=5, left_ctx_tokens=3,
        crossfade_tokens=1, first_chunk_tokens=2, jd_first_chunk=3,
        jd_chunk=4, min_start_words=1, max_speech_steps=12)

    def run(max_steps):
        return list(streamer.stream(
            jax.random.PRNGKey(11), a["speaker_embeds"], jd["llm_indices"],
            jd["llm_token_ids"], jd["llm_token_lengths"], jd["llm_word_ids"],
            syn_asr["asr_token_ids"], syn_asr["asr_word_ids"],
            max_steps=max_steps))

    small = run(4)
    large = run(10)
    fresh = CompletionStreamer(
        model, variables, scfg, tables, chunk_tokens=5, left_ctx_tokens=3,
        crossfade_tokens=1, first_chunk_tokens=2, jd_first_chunk=3,
        jd_chunk=4, min_start_words=1, max_speech_steps=12)
    expect = list(fresh.stream(
        jax.random.PRNGKey(11), a["speaker_embeds"], jd["llm_indices"],
        jd["llm_token_ids"], jd["llm_token_lengths"], jd["llm_word_ids"],
        syn_asr["asr_token_ids"], syn_asr["asr_word_ids"], max_steps=10))
    assert small and small[-1]["is_last"]
    assert large and large[-1]["is_last"]
    assert large[-1]["n_words"] == expect[-1]["n_words"]
    wav_l = np.concatenate([c["wav"] for c in large], axis=1)
    wav_e = np.concatenate([c["wav"] for c in expect], axis=1)
    np.testing.assert_allclose(wav_l, wav_e, atol=1e-5)


def test_completion_streamer_synthesize_drain(completion_setup):
    """The shared-base synthesize() wrapper (drain + TTFA) forwards the
    CompletionStreamer's extra positional/keyword args to stream()."""
    cfg, model, variables, a, scfg, tables, jd, syn_asr = completion_setup
    from taste_spokenlm_tpu.frontend.streaming import CompletionStreamer
    streamer = CompletionStreamer(
        model, variables, scfg, tables, chunk_tokens=5, left_ctx_tokens=3,
        crossfade_tokens=1, first_chunk_tokens=2, jd_first_chunk=3,
        jd_chunk=4, min_start_words=1, max_speech_steps=12)
    wav, ttfa = streamer.synthesize(
        jax.random.PRNGKey(11), a["speaker_embeds"], jd["llm_indices"],
        jd["llm_token_ids"], jd["llm_token_lengths"], jd["llm_word_ids"],
        syn_asr["asr_token_ids"], syn_asr["asr_word_ids"], max_steps=10)
    assert wav.shape[0] == 1 and np.isfinite(wav).all()
    assert ttfa >= 0.0


def test_completion_streamer_fallback_when_first_chunk_too_few_words(
        completion_setup):
    """When the fused first-audio dispatch's jd chunk produces fewer than
    min_start_words, the streamer must DISCARD that synthesis and fall back
    to jd polling + a fresh prefill — and the result must match a streamer
    whose first jd chunk covers the same words directly (the two paths
    prefill from the same word set on the same key)."""
    cfg, model, variables, a, scfg, tables, jd, syn_asr = completion_setup
    from taste_spokenlm_tpu.frontend.streaming import CompletionStreamer
    common = dict(chunk_tokens=5, left_ctx_tokens=3, crossfade_tokens=1,
                  first_chunk_tokens=2, max_speech_steps=12)

    def run(streamer):
        return list(streamer.stream(
            jax.random.PRNGKey(11), a["speaker_embeds"], jd["llm_indices"],
            jd["llm_token_ids"], jd["llm_token_lengths"], jd["llm_word_ids"],
            syn_asr["asr_token_ids"], syn_asr["asr_word_ids"], max_steps=10))

    # jd_first_chunk=1 cannot complete 2 words -> fused synthesis discarded,
    # fallback polls jd_step (chunk 3) until >=2 words
    fallback = run(CompletionStreamer(
        model, variables, scfg, tables, jd_first_chunk=1, jd_chunk=3,
        min_start_words=2, **common))
    # jd_first_chunk=4 == 1+3: same decoded words before first audio, no
    # fallback (the jd trajectory is chunk-size invariant)
    direct = run(CompletionStreamer(
        model, variables, scfg, tables, jd_first_chunk=4, jd_chunk=3,
        min_start_words=2, **common))
    assert fallback and fallback[-1]["is_last"]
    assert direct and direct[-1]["is_last"]
    assert fallback[-1]["n_words"] == direct[-1]["n_words"]
    wav_f = np.concatenate([c["wav"] for c in fallback], axis=1)
    wav_d = np.concatenate([c["wav"] for c in direct], axis=1)
    assert np.isfinite(wav_f).all()
    np.testing.assert_allclose(wav_f, wav_d, atol=1e-5)
