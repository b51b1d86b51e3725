#!/usr/bin/env python
"""Sweep the pipelined-completion TTFA chunk geometry on the real chip.

Grid over (jd_first_chunk, first_chunk_tokens): TTFA = one fused dispatch
(jd prefill + jd_first_chunk joint-decode steps + S3 prefill +
first_chunk_tokens AR steps + one small flow/HiFT window), so both axes
trade decode steps / window size against how much audio the first chunk
carries.  Serving layout matches bench.py defaults (bf16 params, int8
weight-only + int4 tied head, merged LoRA, fused qkv, Pallas HiFT conv).

Each point reports p50 TTFA over N timed iterations (inputs varied per
call; the first-chunk wav readback is the host sync) plus the first-chunk
audio seconds it buys, so "TTFA minus audio covered" comparisons are fair.

Usage: python scripts/sweep_ttfa.py [--grid 8,12,16x8,12,16] [--iters 3]
"""
import argparse
import functools
import json
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
from taste_spokenlm_tpu.frontend.streaming import CompletionStreamer
from taste_spokenlm_tpu.models.sampler import SamplerConfig, build_sampler_tables
from taste_spokenlm_tpu.models.taste import TasteForCausalLM


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", default="8,12,16x8,12,16",
                    help="jd_first_chunk values x first_chunk_tokens values")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--decode-steps", type=int, default=None)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny config on CPU (plumbing smoke, no real timing)")
    args = ap.parse_args()
    jfc_vals, fc_vals = (sorted(int(v) for v in part.split(","))
                         for part in args.grid.split("x"))
    if args.decode_steps is None:
        args.decode_steps = 8 if args.tiny else 64

    dtype = jnp.bfloat16
    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
        cfg = TasteConfig.tiny()
    else:
        cfg = TasteConfig.full().replace(hift=TasteConfig.full().hift.replace(
            pallas_conv=True))
        cfg = cfg.replace(
            spoken_lm=cfg.spoken_lm.replace(
                use_lora=False,     # merged-LoRA serving
                llama=cfg.spoken_lm.llama.replace(
                    quantized_serving="int8",
                    quantized_embed_serving="int4head",
                    fused_qkv_serving=True)),
            speech_decoder=cfg.speech_decoder.replace(
                llm=cfg.speech_decoder.llm.replace(
                    quantized_serving="int8", fused_qkv_serving=True)))
    model = TasteForCausalLM(cfg, dtype=dtype)

    b, t_tok = 1, 16 if args.tiny else 40
    max_speech = 64 if args.tiny else 512
    rng = np.random.RandomState(0)
    word_ids_np = np.minimum(np.arange(t_tok) // 2, t_tok - 1)
    asr_vocab = cfg.audio_tower.whisper.vocab_size
    llm_vocab = cfg.spoken_lm.llama.vocab_size
    spk = jnp.asarray(rng.randn(b, cfg.speech_decoder.spk_embed_dim),
                      jnp.float32)
    asr_word_ids = jnp.asarray(word_ids_np[None].repeat(b, 0))
    llm_ids = (rng.randint(100, 120000, (b, t_tok)) % llm_vocab
               ).astype(np.int32)
    L = cfg.audio_tower.quantizer.num_quantizers
    K = cfg.audio_tower.quantizer.codebook_size
    llm_indices = np.full((b, t_tok, L), -1, np.int32)
    starts = np.flatnonzero(np.diff(word_ids_np, prepend=-1) != 0)
    llm_indices[:, starts] = rng.randint(0, K, (b, len(starts), L))
    llm_token_ids = jnp.asarray(llm_ids)
    llm_token_lengths = jnp.asarray([t_tok] * b)
    llm_indices = jnp.asarray(llm_indices)
    # generation-side asr buffers (full budget, host-filled in production)
    gen_asr_len = 32 if args.tiny else 128
    syn_asr_ids = jnp.asarray(
        rng.randint(100, 20000, (b, gen_asr_len)) % asr_vocab, jnp.int32)
    syn_asr_words = jnp.asarray(np.minimum(np.arange(gen_asr_len) // 2,
                                           t_tok + 23)[None].repeat(b, 0))

    print("initializing full-size model (host-side fill)...", file=sys.stderr)
    t0 = time.perf_counter()
    shapes = jax.eval_shape(
        functools.partial(model.init, method=TasteForCausalLM.init_all),
        {"params": jax.random.PRNGKey(0)}, jax.random.PRNGKey(1),
        spk, syn_asr_ids[:, :t_tok], llm_token_lengths, asr_word_ids,
        jnp.zeros((b, cfg.audio_tower.whisper.n_mels,
                   100 if args.tiny else 3000), jnp.float32),
        jnp.zeros((b, 8), jnp.int32), jnp.full((b,), 8, jnp.int32),
        llm_token_ids, llm_token_lengths, asr_word_ids)
    variables = _fill_variables(shapes, jnp.bfloat16)
    print(f"init {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    from bench import _VocabScan
    tables = {k: jnp.asarray(v) for k, v in
              build_sampler_tables(_VocabScan(),
                                   cfg.spoken_lm.llama.vocab_size).items()}
    scfg = SamplerConfig(
        delay=cfg.spoken_lm.delay, delay_level=cfg.spoken_lm.delay_level,
        extra_words=args.decode_steps, text_top_p=0.3, taste_top_p=0.0,
        text_temperature=0.5, repetition_penalty=1.1, has_prefix=True)

    results = []
    for jfc in jfc_vals:
        for fc in fc_vals:
            streamer = CompletionStreamer(
                model, variables, scfg, tables,
                chunk_tokens=50, left_ctx_tokens=25, first_chunk_tokens=fc,
                jd_first_chunk=jfc, jd_chunk=24,
                min_start_words=2, max_speech_steps=max_speech)

            def first(i, key):
                ids_i = (llm_token_ids + i) % llm_vocab
                t0 = time.perf_counter()
                it = streamer.stream(key, spk, llm_indices, ids_i,
                                     llm_token_lengths, asr_word_ids,
                                     syn_asr_ids, syn_asr_words,
                                     max_steps=args.decode_steps)
                chunk = next(it)
                dt = time.perf_counter() - t0
                it.close()      # only the first chunk is under test
                return dt, chunk["wav"].shape[1], int(chunk["n_new"])

            t0 = time.perf_counter()
            _, n_samp, n_tok = first(0, jax.random.PRNGKey(40))
            print(f"[jfc={jfc} fc={fc}] compile+first "
                  f"{time.perf_counter()-t0:.1f}s ({n_samp} samples, "
                  f"{n_tok} tokens)", file=sys.stderr)
            walls = [first(1 + i, jax.random.PRNGKey(41 + i))[0]
                     for i in range(args.iters)]
            p50 = float(np.median(walls))
            audio_s = n_samp / 22050.0
            row = {"jd_first_chunk": jfc, "first_chunk_tokens": fc,
                   "ttfa_p50_s": round(p50, 4),
                   "first_chunk_audio_s": round(audio_s, 3),
                   "headroom_s": round(audio_s - p50, 3),
                   "walls_ms": [round(w * 1e3) for w in walls]}
            results.append(row)
            print(f"[jfc={jfc} fc={fc}] ttfa_p50={p50*1e3:.0f}ms "
                  f"audio={audio_s:.2f}s", file=sys.stderr)

    results.sort(key=lambda r: r["ttfa_p50_s"])
    print(json.dumps({"sweep": results, "best": results[0]}, indent=1))


if __name__ == "__main__":
    main()
