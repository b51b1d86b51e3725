#!/usr/bin/env python
"""Attribute the joint-decode per-step cost on the real chip.

Times the full generate_completion loop under ablations (sampling modes,
bridge on/off) plus a bare-backbone decode lower bound, so the gap to the
int8 weight-read roofline (~1.5 ms/step at Llama-1B) can be attributed.

Usage: python scripts/profile_decode.py [--steps 64]
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=64)
    p.add_argument("--platform", default=None)
    p.add_argument("--int4", action="store_true")
    args = p.parse_args()
    from taste_spokenlm_tpu.utils.platform import force_platform
    force_platform(args.platform)

    import jax
    import jax.numpy as jnp
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, "/root/repo")
    from bench import _fill_variables, _VocabScan
    from taste_spokenlm_tpu.config import TasteConfig
    from taste_spokenlm_tpu.models.sampler import (SamplerConfig,
                                                   build_sampler_tables)
    from taste_spokenlm_tpu.models.taste import TasteForCausalLM

    cfg = TasteConfig.full()
    qs = "int4" if args.int4 else "int8"
    cfg = cfg.replace(
        spoken_lm=cfg.spoken_lm.replace(
            llama=cfg.spoken_lm.llama.replace(
                quantized_serving=qs, quantized_embed_serving=True)))
    model = TasteForCausalLM(cfg, dtype=jnp.bfloat16)

    b, t_tok = 1, 40
    steps = args.steps
    rng = np.random.RandomState(0)
    llm_vocab = cfg.spoken_lm.llama.vocab_size
    L = cfg.audio_tower.quantizer.num_quantizers
    K = cfg.audio_tower.quantizer.codebook_size
    word_ids = np.minimum(np.arange(t_tok) // 2, t_tok - 1)
    ids = (rng.randint(100, 120000, (b, t_tok)) % llm_vocab).astype(np.int32)
    idx = np.full((b, t_tok, L), -1, np.int32)
    starts = np.flatnonzero(np.diff(word_ids, prepend=-1) != 0)
    idx[:, starts] = rng.randint(0, K, (b, len(starts), L))

    print("init (spoken_lm subtree only)...", file=sys.stderr)
    tables = {k: jnp.asarray(v) for k, v in
              build_sampler_tables(_VocabScan(), llm_vocab).items()}
    base_scfg = dict(delay=cfg.spoken_lm.delay,
                     delay_level=cfg.spoken_lm.delay_level,
                     extra_words=steps, repetition_penalty=1.1,
                     has_prefix=True)

    def make_fn(scfg):
        @jax.jit
        def fn(v, key, idx_, ids_, lens_, words_):
            return model.apply(v, key, scfg, tables, idx_, ids_, lens_,
                               words_, "audio", steps,
                               method=TasteForCausalLM.generate_completion)
        return fn

    # init via init_all (touches EVERY param — params created inside the
    # decode while_loop body are not materialized by a generate-only init)
    n_mel_frames = 3000
    asr_vocab = cfg.audio_tower.whisper.vocab_size
    shapes = jax.eval_shape(
        functools.partial(model.init, method=TasteForCausalLM.init_all),
        {"params": jax.random.PRNGKey(0)}, jax.random.PRNGKey(1),
        jnp.zeros((b, cfg.speech_decoder.spk_embed_dim), jnp.float32),
        jnp.asarray(ids % asr_vocab), jnp.asarray([t_tok], np.int32),
        jnp.asarray(word_ids[None]),
        jnp.zeros((b, cfg.audio_tower.whisper.n_mels, n_mel_frames),
                  jnp.float32),
        jnp.zeros((b, 8), jnp.int32), jnp.full((b,), 8, jnp.int32),
        jnp.asarray(ids), jnp.asarray([t_tok], np.int32),
        jnp.asarray(word_ids[None]))
    variables = _fill_variables(shapes, jnp.bfloat16)
    dev_args = (jnp.asarray(idx), jnp.asarray(ids),
                jnp.asarray([t_tok], np.int32), jnp.asarray(word_ids[None]))

    def timeit(fn, label):
        t0 = time.perf_counter()
        out = fn(variables, jax.random.PRNGKey(9), *dev_args)
        float(jnp.sum(out["num_tokens"]))
        compile_s = time.perf_counter() - t0
        walls = []
        for i in range(4):
            key = jax.random.PRNGKey(100 + i)
            a = (dev_args[0], (dev_args[1] + i) % llm_vocab) + dev_args[2:]
            t0 = time.perf_counter()
            out = fn(variables, key, *a)
            float(jnp.sum(out["num_tokens"]))
            walls.append(time.perf_counter() - t0)
        w = min(walls)
        print(f"{label:35s} {w*1e3:7.1f} ms  {w/steps*1e3:6.2f} ms/step "
              f"(compile {compile_s:.1f}s)")
        return w

    timeit(make_fn(SamplerConfig(**base_scfg, text_top_p=0.3,
                                 taste_top_p=0.0, text_temperature=0.5)),
           "full (top_p=0.3, taste greedy)")
    timeit(make_fn(SamplerConfig(**base_scfg, text_top_p=0.0,
                                 taste_top_p=0.0, text_temperature=1.0)),
           "greedy text (no top-p sort)")
    timeit(make_fn(SamplerConfig(**base_scfg, text_top_p=0.3,
                                 taste_top_p=0.9, text_temperature=0.5)),
           "top_p text + top_p taste")

    # --- bare-backbone lower bound: llama decode_step loop only ---
    lm_params = {"params": variables["params"]["spoken_lm"]["language_model"]}
    from taste_spokenlm_tpu.models.llama import LlamaModel
    lm = LlamaModel(cfg.spoken_lm.llama,
                    lora=cfg.spoken_lm.lora if cfg.spoken_lm.use_lora else None,
                    dtype=jnp.bfloat16)

    @jax.jit
    def backbone_loop(v, key):
        cache = lm.apply(v, b, t_tok + steps, method=LlamaModel.init_cache)
        x0 = jax.random.normal(key, (b, 1, cfg.spoken_lm.llama.hidden_size),
                               jnp.bfloat16)

        def body(carry, i):
            x, cache = carry
            out = lm.apply(v, inputs_embeds=x, caches=cache,
                           cache_index=i, position_offset=i)
            h = out["last_hidden"]
            logits = lm.apply(v, h, method=LlamaModel.logits)
            nxt = jnp.argmax(logits, axis=-1)
            emb = lm.apply(v, nxt, method=lambda m, a: m.embed_tokens(a))
            return (emb.astype(jnp.bfloat16), out["caches"]), logits[0, 0, 0]

        (_, _), ls = jax.lax.scan(body, (x0, cache),
                                  jnp.arange(steps, dtype=jnp.int32))
        return ls

    t0 = time.perf_counter()
    out = backbone_loop(lm_params, jax.random.PRNGKey(1))
    float(jnp.sum(out))
    print(f"backbone compile {time.perf_counter()-t0:.1f}s")
    walls = []
    for i in range(4):
        t0 = time.perf_counter()
        out = backbone_loop(lm_params, jax.random.PRNGKey(2 + i))
        float(jnp.sum(out))
        walls.append(time.perf_counter() - t0)
    w = min(walls)
    print(f"{'bare backbone+logits+embed loop':35s} {w*1e3:7.1f} ms  "
          f"{w/steps*1e3:6.2f} ms/step")

    # --- backbone WITHOUT the [V, D] logits head: isolates the lm_head
    # HBM traffic (the head re-reads the full embedding table per step) ---
    @jax.jit
    def backbone_nohead_loop(v, key):
        cache = lm.apply(v, b, t_tok + steps, method=LlamaModel.init_cache)
        x0 = jax.random.normal(key, (b, 1, cfg.spoken_lm.llama.hidden_size),
                               jnp.bfloat16)

        def body(carry, i):
            x, cache = carry
            out = lm.apply(v, inputs_embeds=x, caches=cache,
                           cache_index=i, position_offset=i)
            h = out["last_hidden"]
            nxt = (jnp.argmax(h[..., :256], axis=-1)
                   + i.astype(jnp.int32)) % 1000
            emb = lm.apply(v, nxt, method=lambda m, a: m.embed_tokens(a))
            return (emb.astype(jnp.bfloat16), out["caches"]), h[0, 0, 0]

        (_, _), ls = jax.lax.scan(body, (x0, cache),
                                  jnp.arange(steps, dtype=jnp.int32))
        return ls

    t0 = time.perf_counter()
    out = backbone_nohead_loop(lm_params, jax.random.PRNGKey(1))
    float(jnp.sum(out))
    print(f"no-head compile {time.perf_counter()-t0:.1f}s")
    walls = []
    for i in range(4):
        t0 = time.perf_counter()
        out = backbone_nohead_loop(lm_params, jax.random.PRNGKey(2 + i))
        float(jnp.sum(out))
        walls.append(time.perf_counter() - t0)
    w = min(walls)
    print(f"{'backbone+embed (no logits head)':35s} {w*1e3:7.1f} ms  "
          f"{w/steps*1e3:6.2f} ms/step")


if __name__ == "__main__":
    main()
