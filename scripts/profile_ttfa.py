#!/usr/bin/env python
"""First-chunk (TTFA tail) latency on the real chip, with the production
streaming settings: small first chunk + single per-chunk host transfer.

Prints first-chunk latency for first_chunk_tokens in {50 (old), 16 (new)}
so the TTFA effect of the small-first-chunk + fused-readback change is
measured directly.  Full-size model, random weights (speed only).

Usage: python scripts/profile_ttfa.py
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp

from bench import _fill_variables
from taste_spokenlm_tpu.config import TasteConfig
from taste_spokenlm_tpu.frontend.streaming import StreamingSynthesizer
from taste_spokenlm_tpu.models.taste import TasteForCausalLM


def main():
    dtype = jnp.bfloat16
    cfg = TasteConfig.full()
    qs = "int8"
    cfg = cfg.replace(
        speech_decoder=cfg.speech_decoder.replace(
            llm=cfg.speech_decoder.llm.replace(quantized_serving=qs)),
        hift=cfg.hift.replace(pallas_conv=True))
    model = TasteForCausalLM(cfg, dtype=dtype)

    b, max_words, L = 1, 64, cfg.audio_tower.quantizer.num_quantizers
    gen_asr_len = 128
    max_speech = 512
    rng = np.random.RandomState(0)
    asr_vocab = cfg.audio_tower.whisper.vocab_size
    taste_dense = rng.randint(
        0, cfg.audio_tower.quantizer.codebook_size,
        (b, max_words, L)).astype(np.int32)
    syn_asr_ids = jnp.asarray(
        rng.randint(100, 20000, (b, gen_asr_len)) % asr_vocab, jnp.int32)
    syn_asr_words = jnp.asarray(np.minimum(np.arange(gen_asr_len) // 2,
                                           max_words - 1)[None].repeat(b, 0))
    syn_lens = jnp.asarray([gen_asr_len] * b)
    spk = jnp.asarray(rng.randn(b, cfg.speech_decoder.spk_embed_dim),
                      jnp.float32)

    print("init (full model via init_all)...", file=sys.stderr)
    t0 = time.perf_counter()
    t_tok = 40
    n_mel_frames = 3000
    word_ids_np = np.minimum(np.arange(t_tok) // 2, t_tok - 1)
    llm_vocab = cfg.spoken_lm.llama.vocab_size
    shapes = jax.eval_shape(
        functools.partial(model.init, method=TasteForCausalLM.init_all),
        {"params": jax.random.PRNGKey(0)}, jax.random.PRNGKey(1), spk,
        jnp.asarray(rng.randint(100, 20000, (b, t_tok)) % asr_vocab,
                    jnp.int32),
        jnp.asarray([t_tok] * b), jnp.asarray(word_ids_np[None].repeat(b, 0)),
        jnp.asarray(rng.randn(b, cfg.audio_tower.whisper.n_mels,
                              n_mel_frames) * 0.3, jnp.float32),
        jnp.zeros((b, 8), jnp.int32), jnp.full((b,), 8, jnp.int32),
        jnp.asarray((rng.randint(100, 120000, (b, t_tok)) % llm_vocab
                     ).astype(np.int32)),
        jnp.asarray([t_tok] * b),
        jnp.asarray(word_ids_np[None].repeat(b, 0)))
    variables = _fill_variables(shapes, jnp.bfloat16)
    print(f"init {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    for fc in (50, 16):
        streamer = StreamingSynthesizer(
            model, variables, chunk_tokens=50, left_ctx_tokens=25,
            first_chunk_tokens=fc, max_speech_steps=max_speech)

        def first(key):
            t0 = time.perf_counter()
            it = streamer.stream(key, spk, jnp.asarray(taste_dense),
                                 syn_asr_ids, syn_lens, syn_asr_words)
            chunk = next(it)
            dt = time.perf_counter() - t0
            it.close()
            return dt, chunk["wav"].shape[1]

        t0 = time.perf_counter()
        _, n = first(jax.random.PRNGKey(50))
        print(f"fc={fc}: compile+first {time.perf_counter()-t0:.1f}s "
              f"({n} samples)", file=sys.stderr)
        walls = [first(jax.random.PRNGKey(51 + i))[0] for i in range(5)]
        print(f"fc={fc}: first-chunk p50 "
              f"{np.median(walls)*1e3:.0f} ms  "
              f"walls={['%.0f' % (w*1e3) for w in walls]}")


if __name__ == "__main__":
    main()
