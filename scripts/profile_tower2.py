#!/usr/bin/env python
"""Audio-tower wall-time bisect on the real chip.

profile_tower.py puts the 32L whisper encoder at ~60 ms wall (~30 ms of it
tunnel dispatch) yet the bench `tower` stage measures ~126 ms — ~66 ms is
in the decoder-segmenter / RVQ / pooling tail whose FLOPs are trivial.
Bisect: time the FULL tower, the encoder+decoder `_segment` slice, and the
encoder submodule, all under the bench-identical full-model variables tree
so the full-tower jit hits the bench's compile cache.

Usage: python scripts/profile_tower2.py
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

sys.path.insert(0, "/root/repo")
from bench import _fill_variables, _force
from taste_spokenlm_tpu.config import TasteConfig
from taste_spokenlm_tpu.models.taste import TasteForCausalLM


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
    print(f"{label:24s} {w*1e3:8.1f} ms   (compile+first {comp:.0f}s)",
          flush=True)
    return w


def main():
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    cfg = TasteConfig.full()
    qs = "int8"
    cfg = cfg.replace(
        spoken_lm=cfg.spoken_lm.replace(
            llama=cfg.spoken_lm.llama.replace(
                quantized_serving=qs, quantized_embed_serving=True)),
        speech_decoder=cfg.speech_decoder.replace(
            llm=cfg.speech_decoder.llm.replace(quantized_serving=qs)),
        hift=cfg.hift.replace(pallas_conv=True))
    model = TasteForCausalLM(cfg, dtype=jnp.bfloat16)

    b, t_tok = 1, 40
    r = np.random.RandomState(0)
    word_ids_np = np.minimum(np.arange(t_tok) // 2, t_tok - 1)
    asr_vocab = cfg.audio_tower.whisper.vocab_size
    batch = dict(
        speaker_embeds=jnp.asarray(
            r.randn(b, cfg.speech_decoder.spk_embed_dim), jnp.float32),
        asr_token_ids=jnp.asarray(
            r.randint(100, 20000, (b, t_tok)) % asr_vocab, jnp.int32),
        asr_token_lengths=jnp.asarray([t_tok] * b),
        asr_word_ids=jnp.asarray(word_ids_np[None].repeat(b, 0)),
        audio_features=jnp.asarray(
            r.randn(b, cfg.audio_tower.whisper.n_mels, 3000) * 0.3,
            jnp.float32),
    )
    print("initializing full-size model...", flush=True)
    t0 = time.perf_counter()
    shapes = jax.eval_shape(
        functools.partial(model.init, method=TasteForCausalLM.init_all),
        {"params": jax.random.PRNGKey(0)}, jax.random.PRNGKey(1),
        batch["speaker_embeds"], batch["asr_token_ids"],
        batch["asr_token_lengths"], batch["asr_word_ids"],
        batch["audio_features"],
        jnp.zeros((b, 8), jnp.int32), jnp.full((b,), 8, jnp.int32),
        jnp.zeros((b, t_tok), jnp.int32), jnp.asarray([t_tok] * b),
        batch["asr_word_ids"])
    variables = _fill_variables(shapes, jnp.bfloat16)
    print(f"init {time.perf_counter()-t0:.1f}s", flush=True)

    mels = [batch["audio_features"] + jnp.float32(1e-4 * i) for i in range(4)]
    jax.block_until_ready(mels)

    # 1) full tower (bench-identical jit -> compile-cache hit expected)
    tower = jax.jit(lambda v, m: model.apply(
        v, m, batch["asr_token_ids"], batch["asr_token_lengths"],
        batch["asr_word_ids"],
        method=lambda mdl, *a: mdl.audio_tower(*a)))
    timed("tower full", tower, [(variables, m) for m in mels])

    # 2) encoder + decoder segmenter, no VQ / no pooling tail
    seg = jax.jit(lambda v, m: model.apply(
        v, m, batch["asr_token_ids"], batch["asr_token_lengths"],
        batch["asr_word_ids"],
        method=lambda mdl, *a: mdl.audio_tower._segment(*a)))
    timed("segment (enc+dec)", seg, [(variables, m) for m in mels])

    # 3) encoder submodule only (same full variables signature)
    enc = jax.jit(lambda v, m: model.apply(
        v, m,
        method=lambda mdl, x: mdl.audio_tower.encoder(
            x, collect_layer=mdl.audio_tower.config.encoder_target_hidden_layer)))
    timed("encoder only", enc, [(variables, m) for m in mels])


if __name__ == "__main__":
    main()
