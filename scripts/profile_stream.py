#!/usr/bin/env python
"""Streaming first-chunk latency attribution on the real chip.

BENCH_r03 shows first-chunk p50 ~237 ms for chunk=50/left_ctx=25 while the
FULL vocoder (512 tokens) is ~109 ms — the windowed path should be far
cheaper than it measures.  Times each component of stream_start_step
separately (each is its own dispatch, ~30 ms tunnel overhead applies
per call — only deltas >50 ms are meaningful):

  prefill        stream_synth_init (fused prefix + S3 decoder prefill)
  decode chunk   50 AR steps from the stream state
  flow window    flow.inference over window=75 tokens
  hift window    HiFT over the window mel
  start fused    the production single-dispatch stream_start_step

Usage: python scripts/profile_stream.py [--chunk 50 --left 25]
"""
import argparse
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

sys.path.insert(0, "/root/repo")
from bench import _fill_variables, _force
from taste_spokenlm_tpu.config import TasteConfig
from taste_spokenlm_tpu.models.taste import TasteForCausalLM
from taste_spokenlm_tpu.frontend.streaming import mel_per_token


def timed(label, fn, args_list):
    t0 = time.perf_counter()
    out = fn(*args_list[0])
    jax.block_until_ready(out)
    comp = time.perf_counter() - t0
    walls = []
    for a in args_list[1:]:
        t0 = time.perf_counter()
        _force(fn(*a))
        walls.append(time.perf_counter() - t0)
    w = min(walls)
    print(f"{label:16s} {w*1e3:8.1f} ms   (compile+first {comp:.0f}s)",
          flush=True)
    return w, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=50)
    ap.add_argument("--left", type=int, default=25)
    args = ap.parse_args()

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    cfg = TasteConfig.full()
    qs = "int8"
    cfg = cfg.replace(
        speech_decoder=cfg.speech_decoder.replace(
            llm=cfg.speech_decoder.llm.replace(quantized_serving=qs)),
        hift=cfg.hift.replace(pallas_conv=True))
    model = TasteForCausalLM(cfg, dtype=jnp.bfloat16)

    b, t_tok, max_speech = 1, 40, 512
    ct, lc = args.chunk, args.left
    window = ct + lc
    mpt = mel_per_token(cfg.flow)
    mel_window_max = int(np.ceil(window * mpt)) + 4
    L = cfg.audio_tower.quantizer.num_quantizers
    K = cfg.audio_tower.quantizer.codebook_size
    r = np.random.RandomState(0)
    word_ids_np = np.minimum(np.arange(t_tok) // 2, t_tok - 1)
    spk = jnp.asarray(r.randn(b, cfg.speech_decoder.spk_embed_dim),
                      jnp.float32)
    asr_ids = jnp.asarray(
        r.randint(100, 20000, (b, t_tok)) % cfg.audio_tower.whisper.vocab_size,
        jnp.int32)
    asr_lens = jnp.asarray([t_tok] * b)
    asr_words = jnp.asarray(word_ids_np[None].repeat(b, 0))
    n_words = len(np.unique(word_ids_np))
    taste = jnp.asarray(r.randint(0, K, (b, t_tok, L)), jnp.int32)

    print("initializing full-size model (decoder+vocoder weights)...",
          flush=True)
    t0 = time.perf_counter()
    shapes = jax.eval_shape(
        functools.partial(model.init, method=TasteForCausalLM.init_all),
        {"params": jax.random.PRNGKey(0)}, jax.random.PRNGKey(1), spk,
        asr_ids, asr_lens, asr_words,
        jnp.zeros((b, cfg.audio_tower.whisper.n_mels, 3000), jnp.float32),
        jnp.zeros((b, 8), jnp.int32), jnp.full((b,), 8, jnp.int32),
        jnp.zeros((b, t_tok), jnp.int32), jnp.asarray([t_tok] * b),
        asr_words)
    variables = _fill_variables(shapes, jnp.bfloat16)
    print(f"init {time.perf_counter()-t0:.1f}s", flush=True)

    key = jax.random.PRNGKey(3)

    # ---- full fused start step (the production TTFA path) ----
    start = jax.jit(lambda v, rr, rv, s, ta: model.apply(
        v, rr, rv, s, ta, asr_ids, asr_lens, asr_words,
        max_speech, ct, window, mel_window_max,
        method=TasteForCausalLM.stream_start_step))
    starts = [(variables, jax.random.fold_in(key, i),
               jax.random.fold_in(key, 100 + i),
               spk + jnp.float32(1e-4 * i), taste) for i in range(4)]
    jax.block_until_ready(starts)
    w_start, out0 = timed("start fused", start, starts)

    # ---- prefill only ----
    prefill = jax.jit(lambda v, rr, s, ta: model.apply(
        v, rr, s, ta, asr_ids, asr_lens, asr_words, max_speech,
        method=TasteForCausalLM.stream_synth_init))
    pres = [(variables, jax.random.fold_in(key, i),
             spk + jnp.float32(1e-4 * i), taste) for i in range(4)]
    w_pre, state0 = timed("prefill", prefill, pres)

    # ---- decode chunk only (from the prefilled state) ----
    chunk = jax.jit(lambda v, st: model.apply(
        v, st, ct, method=TasteForCausalLM.stream_decode_chunk))
    # vary the state rng leaf per call
    chunk_args = []
    for i in range(4):
        st = dict(state0)
        st["rng"] = jax.random.fold_in(key, 200 + i)
        chunk_args.append((variables, st))
    jax.block_until_ready(chunk_args)
    w_chunk, (tok0, _) = timed("decode chunk", chunk, chunk_args)

    # ---- flow window only ----
    win_tokens = jnp.maximum(
        jnp.asarray(r.randint(0, cfg.flow.vocab_size, (b, window)),
                    jnp.int32), 0)
    win_lens = jnp.asarray([window] * b)
    flow_fn = jax.jit(lambda v, rr, tks, s: model.apply(
        v, rr, tks, win_lens, s, mel_window_max,
        method=lambda m, *a: m.voice_generator.flow.inference(*a)))
    flow_args = [(variables, jax.random.fold_in(key, 300 + i),
                  (win_tokens + i) % cfg.flow.vocab_size,
                  spk + jnp.float32(1e-4 * i)) for i in range(4)]
    jax.block_until_ready(flow_args)
    w_flow, (mel0, mel_lens0) = timed("flow window", flow_fn, flow_args)

    # ---- hift window only ----
    hift_fn = jax.jit(lambda v, rr, mel: model.apply(
        v, mel, rr, method=lambda m, *a: m.voice_generator.hift(*a)))
    hift_args = [(variables, jax.random.fold_in(key, 400 + i),
                  mel0 + jnp.bfloat16(1e-3 * i) if mel0.dtype == jnp.bfloat16
                  else mel0 + jnp.float32(1e-3 * i)) for i in range(4)]
    jax.block_until_ready(hift_args)
    w_hift, _ = timed("hift window", hift_fn, hift_args)

    # ---- full vocode window (flow + hift fused, as in stream_step) ----
    voc_fn = jax.jit(lambda v, rr, tks, s: model.apply(
        v, rr, tks, win_lens, s, mel_window_max,
        method=lambda m, *a: m.voice_generator(*a)))
    w_voc, _ = timed("vocode window", voc_fn, flow_args)

    print(f"\nsum(prefill+chunk+vocode) = {(w_pre+w_chunk+w_voc)*1e3:.0f} ms "
          f"(3 dispatches) vs fused start {w_start*1e3:.0f} ms (1 dispatch)")


if __name__ == "__main__":
    main()
