"""Shared deterministic tiny-model e2e computation for the committed golden
fixtures (reference ships committed generation fixtures under
examples/generated_cases/ — this is the equivalent regression anchor).

Everything is seeded: params from PRNGKey(0) via init_all, greedy sampling,
fixed inputs from RandomState(0).  `compute_outputs()` returns a
JSON-serializable dict; tests/fixtures/golden_e2e.json pins it.
"""

import numpy as np


def compute_outputs():
    import jax
    import jax.numpy as jnp
    from taste_spokenlm_tpu.config import TasteConfig
    from taste_spokenlm_tpu.models.taste import TasteForCausalLM
    from taste_spokenlm_tpu.models.sampler import SamplerConfig

    cfg = TasteConfig.tiny()
    model = TasteForCausalLM(cfg)
    rng = np.random.RandomState(0)
    b, t = 1, 10
    L = cfg.audio_tower.quantizer.num_quantizers
    K = cfg.audio_tower.quantizer.codebook_size
    V = cfg.spoken_lm.llama.vocab_size
    word_ids = np.minimum(np.arange(t) // 2, t - 1)
    asr_ids = jnp.asarray(
        rng.randint(5, cfg.audio_tower.whisper.vocab_size, (b, t)), jnp.int32)
    llm_ids = jnp.asarray(rng.randint(2, V, (b, t)), jnp.int32)
    mel = jnp.asarray(
        rng.randn(b, cfg.audio_tower.whisper.n_mels,
                  2 * cfg.audio_tower.whisper.max_source_positions) * 0.3,
        jnp.float32)
    spk = jnp.asarray(rng.randn(b, cfg.speech_decoder.spk_embed_dim),
                      jnp.float32)
    lens = jnp.asarray([t])
    words = jnp.asarray(word_ids[None])
    indices = np.full((b, t, L), -1, np.int32)
    starts = np.flatnonzero(np.diff(word_ids, prepend=-1) != 0)
    indices[:, starts] = rng.randint(0, K, (b, len(starts), L))

    variables = model.init(
        jax.random.PRNGKey(0), jax.random.PRNGKey(1), spk, asr_ids, lens,
        words, mel, jnp.zeros((b, 8), jnp.int32), jnp.full((b,), 8, jnp.int32),
        llm_ids, lens, words, method=TasteForCausalLM.init_all)

    # ---- reconstruction (audio -> taste -> S3 -> wav) ----
    recon = jax.jit(lambda v, r: model.apply(
        v, r, spk, asr_ids, lens, words, mel,
        max_speech_steps=16, mel_len_max=48,
        method=TasteForCausalLM.inference_reconstruction))(
            variables, jax.random.PRNGKey(2))
    wav = np.asarray(recon["waveform"], np.float64)[0]
    n_wav = int(recon["waveform_lengths"][0])

    # ---- completion (joint text+taste greedy decode) ----
    tables = {"word_start": jnp.asarray(np.arange(V) % 3 == 0),
              "banned": jnp.zeros((V,), bool),
              "sentence_end": jnp.asarray(np.arange(V) % 7 == 0)}
    scfg = SamplerConfig(delay=cfg.spoken_lm.delay, delay_level="word",
                         extra_words=3, has_prefix=True)  # greedy top_p=0
    gen = jax.jit(lambda v, r: model.apply(
        v, r, scfg, tables, jnp.asarray(indices), llm_ids, lens, words,
        "audio", 12, method=TasteForCausalLM.generate_completion))(
            variables, jax.random.PRNGKey(3))
    n = int(gen["num_tokens"][0])
    nt = int(gen["num_taste_words"][0])

    # ---- VQ tokenization ids ----
    _, llm_idx = jax.jit(lambda v: model.apply(
        v, asr_ids, lens, words, llm_ids, lens, words, mel,
        method=TasteForCausalLM.extract_vq))(variables)

    return {
        "speech_token_ids":
            np.asarray(recon["speech_token_ids"])[0].tolist(),
        "speech_token_length": int(recon["speech_token_lengths"][0]),
        "waveform_length": n_wav,
        "waveform_rms": float(np.sqrt(np.mean(wav[:n_wav] ** 2))),
        "waveform_head": [float(x) for x in wav[:8]],
        "completion_token_ids":
            np.asarray(gen["llm_token_ids"])[0, :n].tolist(),
        "completion_word_ids":
            np.asarray(gen["llm_word_ids"])[0, :n].tolist(),
        "completion_taste":
            np.asarray(gen["taste_indices"])[0, :nt].tolist(),
        "vq_llm_indices": np.asarray(llm_idx)[0].tolist(),
    }
