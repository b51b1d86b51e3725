#!/usr/bin/env python
"""Attribute the stage-1 training step cost on the real chip.

Times (a) the loss forward alone, (b) forward+backward, (c) the full
step (backward + optimizer + VQ EMA), plus forward ablations (no VQ /
text-only), so the 15% MFU of the full step can be localized.

Usage: python scripts/profile_train.py [--b 8]
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
    from taste_spokenlm_tpu.models.taste import TasteForCausalLM
    from taste_spokenlm_tpu.train import optim, train_step

    dtype = jnp.bfloat16
    cfg = TasteConfig.full()
    cfg = cfg.replace(
        audio_tower=cfg.audio_tower.replace(
            whisper=cfg.audio_tower.whisper.replace(remat=True)),
        speech_decoder=cfg.speech_decoder.replace(
            text_encoder=cfg.speech_decoder.text_encoder.replace(remat=True),
            audio_encoder=cfg.speech_decoder.audio_encoder.replace(remat=True),
            llm=cfg.speech_decoder.llm.replace(remat=True)))
    model = TasteForCausalLM(cfg, dtype=dtype)

    b, t_tok, t_speech, mel_frames = args.b, 96, 1500, 3000
    r = np.random.RandomState(0)
    asr_vocab = cfg.audio_tower.whisper.vocab_size
    sp_vocab = cfg.speech_decoder.speech_token_size
    word_ids = np.minimum(np.arange(t_tok) // 2, t_tok - 1)
    batch = {
        "speaker_embeds": jnp.asarray(
            r.randn(b, cfg.speech_decoder.spk_embed_dim), jnp.float32),
        "asr_token_ids": jnp.asarray(
            r.randint(100, 20000, (b, t_tok)) % asr_vocab, jnp.int32),
        "asr_token_lengths": jnp.asarray([t_tok] * b),
        "asr_word_ids": jnp.asarray(word_ids[None].repeat(b, 0)),
        "audio_features": jnp.asarray(
            r.randn(b, cfg.audio_tower.whisper.n_mels, mel_frames) * 0.3,
            jnp.float32),
        "speech_token_ids": jnp.asarray(
            r.randint(0, sp_vocab, (b, t_speech)), jnp.int32),
        "speech_token_lengths": jnp.asarray([t_speech] * b),
    }

    print("init...", file=sys.stderr)
    shapes = jax.eval_shape(
        functools.partial(model.init,
                          method=TasteForCausalLM.forward_speech_autoencoder),
        {"params": jax.random.PRNGKey(0)}, batch["speaker_embeds"],
        batch["asr_token_ids"], batch["asr_token_lengths"],
        batch["asr_word_ids"], batch["audio_features"],
        batch["speech_token_ids"], batch["speech_token_lengths"])
    variables = _fill_variables(shapes, jnp.bfloat16)
    mask = optim.trainable_mask(
        variables["params"],
        unfreeze_patterns=[r"audio_tower/decoder", r"audio_tower/vq",
                           r"speech_decoder"])

    def loss_fn(params, quantizer, batch, rng, **kw):
        params = train_step._with_frozen_stopped(params, mask)
        out, _ = model.apply(
            {"params": params, "quantizer": quantizer},
            batch["speaker_embeds"], batch["asr_token_ids"],
            batch["asr_token_lengths"], batch["asr_word_ids"],
            batch["audio_features"], batch["speech_token_ids"],
            batch["speech_token_lengths"], train=True, dropout_rng=rng,
            method=TasteForCausalLM.forward_speech_autoencoder,
            mutable=["quantizer"], **kw)
        return out["loss"]

    def vary(bt, i):
        return {**bt, "speaker_embeds":
                bt["speaker_embeds"] + jnp.float32(1e-5 * i)}

    def force(out):
        # the tunnel's block_until_ready can return before real execution
        # (CLAUDE.md): a host readback of one output leaf is the only
        # reliable completion barrier
        return float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))

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

    q0 = variables.get("quantizer")
    key = jax.random.PRNGKey(1)
    params = variables["params"]

    fwd = jax.jit(lambda p, q, bt, k: loss_fn(p, q, bt, k))
    timed("forward only", fwd, lambda i: (params, q0, vary(batch, i), key))

    if os.environ.get("PROFILE_FWD_ONLY") == "1":
        return

    fwd_novq = jax.jit(lambda p, q, bt, k: loss_fn(p, q, bt, k, skip_vq=True))
    timed("forward (skip_vq)", fwd_novq,
          lambda i: (params, q0, vary(batch, i), key))

    fwdbwd = jax.jit(lambda p, q, bt, k: jax.grad(loss_fn)(p, q, bt, k))
    timed("forward+backward", fwdbwd,
          lambda i: (params, q0, vary(batch, i), key))

    tx = optim.make_optimizer(1e-4, mask=mask, grad_clip=5.0)
    state = train_step.init_state(jax.random.PRNGKey(0), params, q0, tx)
    step = train_step.make_stage1_step(model, tx, mesh=None, donate=False,
                                       trainable_mask=mask)
    timed("full step (bwd+optim+EMA)",
          lambda s, bt: step(s, bt)[1]["loss"],
          lambda i: (state, vary(batch, i)))


if __name__ == "__main__":
    main()
