#!/usr/bin/env python
"""Component-level attribution of the stage-1 training step at B=8.

profile_train.py showed fwd 440 ms (21.5% MFU) / fwd+bwd 874 ms (15.8%);
this splits the forward into encoder / segmenter / speech-decoder and
times the trainable tail's fwd+bwd alone, so the MFU sink is localized.

Usage: python scripts/profile_train_parts.py [--b 8]
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
    p.add_argument("--b", type=int, default=8)
    p.add_argument("--platform", default=None)
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
    sys.path.insert(0, "/root/repo")
    from bench import _fill_variables, PEAK_FLOPS
    from taste_spokenlm_tpu.config import TasteConfig
    from taste_spokenlm_tpu.models.audio_tower import TasteAudioTower
    from taste_spokenlm_tpu.models.speech_decoder import TasteSpeechDecoder
    from taste_spokenlm_tpu.models.whisper import WhisperEncoder

    dtype = jnp.bfloat16
    cfg = TasteConfig.full()
    wcfg = cfg.audio_tower.whisper.replace(remat=True)
    sd = cfg.speech_decoder.replace(
        text_encoder=cfg.speech_decoder.text_encoder.replace(remat=True),
        audio_encoder=cfg.speech_decoder.audio_encoder.replace(remat=True),
        llm=cfg.speech_decoder.llm.replace(remat=True))

    b, t_tok, t_speech, mel_frames = args.b, 96, 1500, 3000
    r = np.random.RandomState(0)
    mel = jnp.asarray(r.randn(b, wcfg.n_mels, mel_frames) * 0.3, jnp.float32)
    word_ids = np.minimum(np.arange(t_tok) // 2, t_tok - 1)
    asr_ids = jnp.asarray(r.randint(100, 20000, (b, t_tok)) % wcfg.vocab_size,
                          jnp.int32)
    asr_lens = jnp.asarray([t_tok] * b)
    asr_words = jnp.asarray(word_ids[None].repeat(b, 0))
    spk = jnp.asarray(r.randn(b, sd.spk_embed_dim), jnp.float32)
    units = jnp.asarray(r.randn(b, t_tok, sd.audio_encoder_input_size) * 0.1,
                        dtype)
    sp_ids = jnp.asarray(r.randint(0, sd.speech_token_size, (b, t_speech)),
                         jnp.int32)
    sp_lens = jnp.asarray([t_speech] * b)

    def force(out):
        return float(jnp.sum(jnp.asarray(
            jax.tree_util.tree_leaves(out)[0], jnp.float32)))

    def timed(label, fn, build_args, n=3):
        t0 = time.perf_counter()
        force(fn(*build_args(0)))
        comp = time.perf_counter() - t0
        walls = []
        for i in range(1, n + 1):
            a = build_args(i)
            jax.block_until_ready(a)
            t0 = time.perf_counter()
            force(fn(*a))
            walls.append(time.perf_counter() - t0)
        w = min(walls)
        try:
            cost = fn.lower(*build_args(0)).compile().cost_analysis()
            if isinstance(cost, list):
                cost = cost[0]
            fl = float(cost["flops"])
            mfu = f"  {fl/1e12:6.1f} TF  mfu={fl/w/PEAK_FLOPS*100:4.1f}%"
        except Exception:
            mfu = ""
        print(f"{label:34s} {w*1e3:7.0f} ms{mfu} (compile {comp:.0f}s)",
              flush=True)
        return w

    # --- whisper encoder forward (frozen in training) ---
    enc = WhisperEncoder(wcfg, dtype=dtype, remat=True)
    eshapes = jax.eval_shape(enc.init, jax.random.PRNGKey(0), mel)
    evars = _fill_variables(eshapes, dtype)
    enc_fn = jax.jit(lambda v, m: enc.apply(v, m, collect_layer=6))
    timed("encoder fwd (T=1500)", enc_fn,
          lambda i: (evars, mel + jnp.float32(1e-5 * i)))

    # --- full tower forward (encoder + segmenter + RVQ) ---
    tower = TasteAudioTower(cfg.audio_tower.replace(whisper=wcfg),
                            dtype=dtype)
    tshapes = jax.eval_shape(tower.init, jax.random.PRNGKey(0), mel, asr_ids,
                             asr_lens, asr_words)
    tvars = _fill_variables(tshapes, dtype)
    tower_fn = jax.jit(lambda v, m: tower.apply(v, m, asr_ids, asr_lens,
                                                asr_words))
    timed("tower fwd (enc+seg+rvq)", tower_fn,
          lambda i: (tvars, mel + jnp.float32(1e-5 * i)))

    # --- speech decoder: fwd and fwd+bwd (the trainable tail) ---
    dec = TasteSpeechDecoder(sd, dtype=dtype)
    dshapes = jax.eval_shape(dec.init, jax.random.PRNGKey(0), spk, units,
                             asr_lens, asr_ids, asr_lens, sp_ids, sp_lens)
    dvars = _fill_variables(dshapes, dtype)

    dec_fwd = jax.jit(lambda v, u: dec.apply(v, spk, u, asr_lens, asr_ids,
                                             asr_lens, sp_ids,
                                             sp_lens)["loss"])
    timed("speech-decoder fwd (T=1500)", dec_fwd,
          lambda i: (dvars, units + jnp.float32(1e-5 * i)))

    dec_grad = jax.jit(jax.grad(
        lambda p, u: dec.apply({"params": p}, spk, u, asr_lens, asr_ids,
                               asr_lens, sp_ids, sp_lens)["loss"]))
    timed("speech-decoder fwd+bwd", dec_grad,
          lambda i: (dvars["params"], units + jnp.float32(1e-5 * i)))


if __name__ == "__main__":
    main()
