"""Benchmark: end-to-end speech-reconstruction RTF on one TPU chip.

Measures the full-size inference path audio -> taste tokenization (whisper
large tower + RVQ) -> S3 speech tokens (KV-cached AR speech decoder) ->
mel (10-step CFM with batched CFG) -> waveform (HiFT), with random weights
(speed is weight-independent), and reports

    rtf = wall_seconds / generated_audio_seconds      (target < 0.1, BASELINE.md)

as ONE JSON line: {"metric": "reconstruction_rtf", "value": rtf,
"unit": "wall_s_per_audio_s", "vs_baseline": 0.1 / rtf}.
"""

import functools
import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def _timed(fn):
    import jax
    t0 = time.perf_counter()
    jax.block_until_ready(fn())
    return time.perf_counter() - t0


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from taste_spokenlm_tpu.config import TasteConfig
    from taste_spokenlm_tpu.models.taste import TasteForCausalLM

    dtype = jnp.bfloat16
    cfg = TasteConfig.full()
    model = TasteForCausalLM(cfg, dtype=dtype)

    # ~14 s of source audio -> ~40 asr tokens; decode up to 512 S3 tokens
    # (~10.2 s at 50 Hz) and vocode them.
    b, t_tok = 1, 40
    max_speech = 512
    mel_len_max = 904  # ceil(512/50*22050/256) + headroom
    rng = np.random.RandomState(0)
    batch = dict(
        speaker_embeds=jnp.asarray(
            rng.randn(b, cfg.speech_decoder.spk_embed_dim), jnp.float32),
        asr_token_ids=jnp.asarray(
            rng.randint(100, 20000, (b, t_tok)), jnp.int32),
        asr_token_lengths=jnp.asarray([t_tok] * b),
        asr_word_ids=jnp.asarray(
            np.minimum(np.arange(t_tok) // 2, t_tok - 1)[None].repeat(b, 0)),
        audio_features=jnp.asarray(
            rng.randn(b, cfg.audio_tower.whisper.n_mels, 3000) * 0.3,
            jnp.float32),
    )

    print("initializing full-size model...", file=sys.stderr)
    t0 = time.perf_counter()
    # init weights host-side from eval_shape (speed benchmark only — the
    # values are irrelevant; avoids compiling a 1B-param init graph)
    shapes = jax.eval_shape(
        functools.partial(model.init,
                          method=TasteForCausalLM.init_reconstruction),
        {"params": jax.random.PRNGKey(0)}, jax.random.PRNGKey(1),
        batch["speaker_embeds"], batch["asr_token_ids"],
        batch["asr_token_lengths"], batch["asr_word_ids"],
        batch["audio_features"])
    # fill weights ON DEVICE: per-unique-shape jitted normal fills (compile
    # is trivial + persistent-cached) — avoids generating ~4 GB on the host
    # and shipping it through the remote-TPU tunnel
    fill_fns = {}

    def fill_fn(shape, dtype, scale):
        key = (shape, str(dtype), scale)
        if key not in fill_fns:
            fill_fns[key] = jax.jit(functools.partial(
                lambda k, s, d, sc: (jax.random.normal(k, s, jnp.float32)
                                     * sc).astype(d),
                s=shape, d=dtype, sc=scale))
        return fill_fns[key]

    counter = iter(range(10 ** 9))
    base_key = jax.random.PRNGKey(42)

    def make(leaf):
        if not np.issubdtype(leaf.dtype, np.floating):
            return jnp.zeros(leaf.shape, leaf.dtype)
        scale = 0.02 if leaf.ndim >= 2 else 1e-3
        k = jax.random.fold_in(base_key, next(counter))
        return fill_fn(tuple(leaf.shape), leaf.dtype, scale)(k)

    variables = jax.tree_util.tree_map(make, shapes)
    jax.block_until_ready(variables)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    print(f"init done in {time.perf_counter()-t0:.1f}s; params={n_params/1e6:.0f}M",
          file=sys.stderr)

    # stage-split jits: each compiles independently (and caches), avoiding
    # one monolithic XLA program
    from taste_spokenlm_tpu.models.audio_tower import TasteAudioTower
    from taste_spokenlm_tpu.models.speech_decoder import TasteSpeechDecoder
    from taste_spokenlm_tpu.models.generator import VoiceGenerator

    @jax.jit
    def run_tower(variables, batch):
        return model.apply(
            variables, batch["audio_features"], batch["asr_token_ids"],
            batch["asr_token_lengths"], batch["asr_word_ids"],
            method=lambda m, *a: m.audio_tower(*a))

    @jax.jit
    def run_decoder(variables, rng, spk, units, unit_lens, ids, lens):
        return model.apply(
            variables, rng, spk, units, unit_lens, ids, lens,
            max_steps=max_speech,
            method=lambda m, *a, **k: m.speech_decoder.generate(*a, **k))

    @jax.jit
    def run_vocoder(variables, rng, tokens, lengths, spk):
        return model.apply(
            variables, rng, tokens, lengths, spk, mel_len_max,
            method=lambda m, *a: m.voice_generator(*a))

    def run_all(rng, batch):
        r1, r2 = jax.random.split(rng)
        enc = run_tower(variables, batch)
        gen = run_decoder(variables, r1, batch["speaker_embeds"],
                          enc["audio_unit_embeds"], enc["audio_unit_lengths"],
                          batch["asr_token_ids"], batch["asr_token_lengths"])
        wav, wav_len = run_vocoder(variables, r2,
                                   jnp.maximum(gen["speech_token_ids"], 0),
                                   gen["speech_token_lengths"],
                                   batch["speaker_embeds"])
        return wav

    print("compiling + warmup...", file=sys.stderr)
    for name, fn in (("tower", lambda: run_tower(variables, batch)),):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        print(f"compile {name}: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    wav = run_all(jax.random.PRNGKey(2), batch)
    jax.block_until_ready(wav)
    print(f"compile+first full run: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    times = []
    for i in range(3):
        t0 = time.perf_counter()
        wav = run_all(jax.random.PRNGKey(3 + i), batch)
        jax.block_until_ready(wav)
        times.append(time.perf_counter() - t0)
    wall = min(times)

    # per-stage steady-state breakdown (stderr only)
    r1, r2 = jax.random.split(jax.random.PRNGKey(9))
    enc = jax.block_until_ready(run_tower(variables, batch))
    gen = jax.block_until_ready(run_decoder(
        variables, r1, batch["speaker_embeds"], enc["audio_unit_embeds"],
        enc["audio_unit_lengths"], batch["asr_token_ids"],
        batch["asr_token_lengths"]))
    stage_args = {
        "tower": lambda: run_tower(variables, batch),
        "decoder": lambda: run_decoder(
            variables, r1, batch["speaker_embeds"], enc["audio_unit_embeds"],
            enc["audio_unit_lengths"], batch["asr_token_ids"],
            batch["asr_token_lengths"]),
        "vocoder": lambda: run_vocoder(
            variables, r2, jnp.maximum(gen["speech_token_ids"], 0),
            gen["speech_token_lengths"], batch["speaker_embeds"]),
    }
    for name, fn in stage_args.items():
        best = min(_timed(fn) for _ in range(2))
        print(f"stage {name}: {best*1e3:.0f} ms", file=sys.stderr)

    # audio seconds actually generated: the decoder runs its full while_loop
    # budget with random weights, so count the fixed decode budget
    audio_sec = max_speech / cfg.frontend.s3_token_rate  # 512/50 = 10.24 s
    rtf = wall / audio_sec
    print(f"walls={['%.2f' % t for t in times]} audio_s={audio_sec:.2f}",
          file=sys.stderr)
    print(json.dumps({
        "metric": "reconstruction_rtf",
        "value": round(rtf, 4),
        "unit": "wall_s_per_audio_s",
        "vs_baseline": round(0.1 / rtf, 3),
    }))


if __name__ == "__main__":
    main()
