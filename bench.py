"""Benchmark: TASTE end-to-end performance on one TPU chip.

Measures BOTH headline paths at full model size (random weights — speed is
weight-independent):

  1. speech reconstruction  audio -> taste tokens (whisper-large tower + RVQ)
     -> S3 speech tokens (KV-cached AR speech decoder) -> mel (10-step CFM,
     batched CFG) -> waveform (HiFT)
  2. speech continuation (the flagship `inference_completion` path,
     reference modeling_taste.py:1663-1791): joint text+taste KV-cached
     decode over the Llama-1B spoken LM, then taste -> S3 -> waveform

and reports the four BASELINE.md targets as ONE JSON line:

  {"metric": "completion_rtf", "value": ..., "unit": "wall_s_per_audio_s",
   "vs_baseline": 0.1/value, "reconstruction_rtf": ...,
   "decode_tokens_per_sec": ..., "ttfa_p50_s": ...}

Per-stage wall times and MFU (vs 197 bf16 TFLOP/s for TPU v5e, override with
TPU_PEAK_FLOPS) go to stderr.
"""

import functools
import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

PEAK_FLOPS = float(os.environ.get("TPU_PEAK_FLOPS", 197e12))


def _timed(fn):
    import jax
    t0 = time.perf_counter()
    jax.block_until_ready(fn())
    return time.perf_counter() - t0


def _mfu(jitted, args, wall_s):
    """flops from XLA cost analysis / wall / peak; None if unavailable."""
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost["flops"])
        return flops / wall_s / PEAK_FLOPS
    except Exception:
        return None


class _VocabScan:
    """Deterministic id->subword map standing in for the llama tokenizer
    when building sampler vocab tables offline (speed benchmark only; the
    table SHAPES and the branchless sampler cost are identical to real
    tables)."""

    def decode(self, i):
        r = i % 11
        return (" the", "ing", ".", " end.", "!!", "a\nb", " word", "s",
                ",'", " no.", "xyz")[r]


def main():
    tiny = os.environ.get("BENCH_TINY", "") == "1"
    import jax
    if tiny:
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from taste_spokenlm_tpu.config import TasteConfig
    from taste_spokenlm_tpu.models.taste import TasteForCausalLM
    from taste_spokenlm_tpu.models.sampler import (SamplerConfig,
                                                   build_sampler_tables)

    dtype = jnp.bfloat16
    cfg = TasteConfig.tiny() if tiny else TasteConfig.full()
    # int8 weight-only serving layout for the joint-decode backbone
    # (utils/quant; ~1.66x decode tokens/sec) — BENCH_QUANT=0 opts out
    quant = os.environ.get("BENCH_QUANT", "1") == "1" and not tiny
    if quant:
        cfg = cfg.replace(
            spoken_lm=cfg.spoken_lm.replace(
                llama=cfg.spoken_lm.llama.replace(
                    quantized_serving=True, quantized_embed_serving=True)),
            speech_decoder=cfg.speech_decoder.replace(
                llm=cfg.speech_decoder.llm.replace(quantized_serving=True)))
    print(f"llama serving quantization: {'int8' if quant else 'off'}",
          file=sys.stderr)
    model = TasteForCausalLM(cfg, dtype=dtype)

    # ~14 s of source audio -> ~40 asr tokens; decode up to 512 S3 tokens
    # (~10.2 s at 50 Hz) and vocode them.
    b, t_tok = 1, 40
    max_speech = 64 if tiny else 512
    mel_len_max = 128 if tiny else 904  # ceil(512/50*22050/256) + headroom
    decode_steps = 8 if tiny else 64  # joint decode budget (completion path)
    rng = np.random.RandomState(0)
    word_ids_np = np.minimum(np.arange(t_tok) // 2, t_tok - 1)
    asr_vocab = cfg.audio_tower.whisper.vocab_size
    llm_vocab = cfg.spoken_lm.llama.vocab_size
    n_mel_frames = 100 if tiny else 3000
    batch = dict(
        speaker_embeds=jnp.asarray(
            rng.randn(b, cfg.speech_decoder.spk_embed_dim), jnp.float32),
        asr_token_ids=jnp.asarray(
            rng.randint(100, 20000, (b, t_tok)) % asr_vocab, jnp.int32),
        asr_token_lengths=jnp.asarray([t_tok] * b),
        asr_word_ids=jnp.asarray(word_ids_np[None].repeat(b, 0)),
        audio_features=jnp.asarray(
            rng.randn(b, cfg.audio_tower.whisper.n_mels, n_mel_frames) * 0.3,
            jnp.float32),
    )
    # spoken-LM prefix: same utterance in llama-tokenizer space
    llm_ids = (rng.randint(100, 120000, (b, t_tok)) % llm_vocab).astype(np.int32)
    L = cfg.audio_tower.quantizer.num_quantizers
    K = cfg.audio_tower.quantizer.codebook_size
    llm_indices = np.full((b, t_tok, L), -1, np.int32)
    starts = np.flatnonzero(np.diff(word_ids_np, prepend=-1) != 0)
    llm_indices[:, starts] = rng.randint(0, K, (b, len(starts), L))
    batch_lm = dict(
        llm_token_ids=jnp.asarray(llm_ids),
        llm_token_lengths=jnp.asarray([t_tok] * b),
        llm_word_ids=batch["asr_word_ids"],
        llm_indices=jnp.asarray(llm_indices),
    )

    print("initializing full-size model...", file=sys.stderr)
    t0 = time.perf_counter()
    # init weights host-side from eval_shape (speed benchmark only — the
    # values are irrelevant; avoids compiling a multi-B-param init graph).
    # init_all touches EVERY param (tower + decoder + spoken LM + vocoder).
    shapes = jax.eval_shape(
        functools.partial(model.init, method=TasteForCausalLM.init_all),
        {"params": jax.random.PRNGKey(0)}, jax.random.PRNGKey(1),
        batch["speaker_embeds"], batch["asr_token_ids"],
        batch["asr_token_lengths"], batch["asr_word_ids"],
        batch["audio_features"],
        jnp.zeros((b, 8), jnp.int32), jnp.full((b,), 8, jnp.int32),
        batch_lm["llm_token_ids"], batch_lm["llm_token_lengths"],
        batch_lm["llm_word_ids"])
    # fill weights ON DEVICE: per-unique-shape jitted normal fills (compile
    # is trivial + persistent-cached) — avoids generating GBs on the host
    # and shipping them through the remote-TPU tunnel
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
    # serve weights in bf16 (the production serving layout — halves HBM
    # traffic on the memory-bound AR decode; flax modules upcast where the
    # compute dtype is f32).  Override with BENCH_PARAM_DTYPE=float32.
    param_dtype = jnp.dtype(os.environ.get("BENCH_PARAM_DTYPE", "bfloat16"))
    print(f"param dtype: {param_dtype}", file=sys.stderr)

    def make(leaf):
        if leaf.dtype == jnp.int8:
            # quantized base kernels: realistic int8 payload
            k = jax.random.fold_in(base_key, next(counter))
            return jax.random.randint(k, leaf.shape, -127, 128, jnp.int32
                                      ).astype(jnp.int8)
        if not np.issubdtype(leaf.dtype, np.floating):
            return jnp.zeros(leaf.shape, leaf.dtype)
        scale = 0.02 if leaf.ndim >= 2 else 1e-3
        k = jax.random.fold_in(base_key, next(counter))
        return fill_fn(tuple(leaf.shape), param_dtype, scale)(k)

    variables = jax.tree_util.tree_map(make, shapes)
    jax.block_until_ready(variables)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    print(f"init done in {time.perf_counter()-t0:.1f}s; params={n_params/1e6:.0f}M",
          file=sys.stderr)

    # ---------------- reconstruction path ----------------
    # stage-split jits: each compiles independently (and caches), avoiding
    # one monolithic XLA program
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

    print("compiling + warmup (reconstruction)...", file=sys.stderr)
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
    recon_wall = min(times)

    # per-stage steady-state breakdown + MFU (stderr only)
    r1, r2 = jax.random.split(jax.random.PRNGKey(9))
    enc = jax.block_until_ready(run_tower(variables, batch))
    gen = jax.block_until_ready(run_decoder(
        variables, r1, batch["speaker_embeds"], enc["audio_unit_embeds"],
        enc["audio_unit_lengths"], batch["asr_token_ids"],
        batch["asr_token_lengths"]))
    voc_tokens = jnp.maximum(gen["speech_token_ids"], 0)
    stage_calls = {
        "tower": (run_tower, (variables, batch)),
        "decoder": (run_decoder,
                    (variables, r1, batch["speaker_embeds"],
                     enc["audio_unit_embeds"], enc["audio_unit_lengths"],
                     batch["asr_token_ids"], batch["asr_token_lengths"])),
        "vocoder": (run_vocoder,
                    (variables, r2, voc_tokens, gen["speech_token_lengths"],
                     batch["speaker_embeds"])),
    }
    from taste_spokenlm_tpu.utils.profiling import StageTimer
    timer = StageTimer()
    for name, (jitted, a) in stage_calls.items():
        best = min(_timed(lambda: jitted(*a)) for _ in range(2))
        with timer.stage(name):  # annotated re-run for profiler traces
            jax.block_until_ready(jitted(*a))
        timer.stages[name] = best  # keep the best-of wall time in the report
        mfu = _mfu(jitted, a, best)
        mfu_s = f" mfu={mfu*100:.1f}%" if mfu is not None else ""
        print(f"stage {name}: {best*1e3:.0f} ms{mfu_s}", file=sys.stderr)

    # audio seconds actually generated: the decoder runs its full while_loop
    # budget with random weights, so count the fixed decode budget
    audio_sec = max_speech / cfg.frontend.s3_token_rate  # 512/50 = 10.24 s
    recon_rtf = recon_wall / audio_sec
    print(f"reconstruction walls={['%.2f' % t for t in times]} "
          f"audio_s={audio_sec:.2f} rtf={recon_rtf:.4f}", file=sys.stderr)

    # ---------------- completion path (flagship) ----------------
    # quick-start sampling config (reference README.md:35-55), extra_words
    # raised to the decode budget so the loop runs all `decode_steps` steps
    # with random weights (steady-state timing; real runs terminate early)
    tables = {k: jnp.asarray(v) for k, v in
              build_sampler_tables(_VocabScan(),
                                   cfg.spoken_lm.llama.vocab_size).items()}
    scfg = SamplerConfig(
        delay=cfg.spoken_lm.delay, delay_level=cfg.spoken_lm.delay_level,
        extra_words=decode_steps, text_top_p=0.3, taste_top_p=0.0,
        text_temperature=0.5, repetition_penalty=1.1, has_prefix=True)

    @jax.jit
    def run_joint_decode(variables, rng, indices, ids, lens, words):
        return model.apply(
            variables, rng, scfg, tables, indices, ids, lens, words,
            "audio", decode_steps,
            method=TasteForCausalLM.generate_completion)

    # synthesis tail: per-word taste + asr tokens -> waveform
    max_words = decode_steps
    gen_asr_len = 2 * decode_steps  # ~2 asr tokens per word

    @jax.jit
    def run_synth(variables, rng, spk, taste, asr_ids, asr_lens, asr_words):
        return model.apply(
            variables, rng, spk, taste, asr_ids, asr_lens, asr_words,
            max_speech_steps=max_speech, mel_len_max=mel_len_max,
            method=TasteForCausalLM.synthesize_from_taste)

    print("compiling + warmup (completion)...", file=sys.stderr)
    t0 = time.perf_counter()
    out = run_joint_decode(variables, jax.random.PRNGKey(5),
                           batch_lm["llm_indices"], batch_lm["llm_token_ids"],
                           batch_lm["llm_token_lengths"],
                           batch_lm["llm_word_ids"])
    jax.block_until_ready(out)
    print(f"compile+first joint decode: {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)

    # host glue (normally the tokenizer round trip): build the synthesis
    # batch from the generated taste rows
    n_taste = max(int(out["num_taste_words"][0]), 1)
    taste_dense = np.zeros((b, max_words, L), np.int32)
    taste_dense[0, :n_taste] = np.maximum(
        np.asarray(out["taste_indices"])[0, :n_taste], 0)
    syn_asr_ids = jnp.asarray(
        rng.randint(100, 20000, (b, gen_asr_len)) % asr_vocab, jnp.int32)
    syn_asr_words = jnp.asarray(np.minimum(np.arange(gen_asr_len) // 2,
                                           max_words - 1)[None].repeat(b, 0))
    syn_args = (variables, jax.random.PRNGKey(6), batch["speaker_embeds"],
                jnp.asarray(taste_dense), syn_asr_ids,
                jnp.asarray([gen_asr_len] * b), syn_asr_words)
    t0 = time.perf_counter()
    syn = run_synth(*syn_args)
    jax.block_until_ready(syn)
    print(f"compile+first synthesis: {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)

    dec_args = (variables, jax.random.PRNGKey(7), batch_lm["llm_indices"],
                batch_lm["llm_token_ids"], batch_lm["llm_token_lengths"],
                batch_lm["llm_word_ids"])
    ttfa_samples, dec_walls, syn_walls = [], [], []
    for i in range(5):
        t0 = time.perf_counter()
        out = run_joint_decode(*dec_args)
        jax.block_until_ready(out)
        t_dec = time.perf_counter() - t0
        t0 = time.perf_counter()
        syn = run_synth(*syn_args)
        jax.block_until_ready(syn)
        t_syn = time.perf_counter() - t0
        dec_walls.append(t_dec)
        syn_walls.append(t_syn)
        # non-streaming pipeline: first audio is available after the joint
        # decode + the synthesis tail complete
        ttfa_samples.append(t_dec + t_syn)
    n_tokens = int(np.sum(out["num_tokens"]))
    dec_wall = min(dec_walls)
    syn_wall = min(syn_walls)
    toks_per_sec = n_tokens / dec_wall if dec_wall > 0 else 0.0

    # batched joint decode throughput (TPU-first win over the reference's
    # B=1 cache-less loop): same program, B=4 rows
    b4 = 4
    dec4_args = (variables, jax.random.PRNGKey(8),
                 jnp.tile(batch_lm["llm_indices"], (b4, 1, 1)),
                 jnp.tile(batch_lm["llm_token_ids"], (b4, 1)),
                 jnp.tile(batch_lm["llm_token_lengths"], (b4,)),
                 jnp.tile(batch_lm["llm_word_ids"], (b4, 1)))
    t0 = time.perf_counter()
    out4 = run_joint_decode(*dec4_args)
    jax.block_until_ready(out4)
    print(f"compile+first B=4 joint decode: {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)
    walls4 = []
    for _ in range(3):
        t0 = time.perf_counter()
        out4 = run_joint_decode(*dec4_args)
        jax.block_until_ready(out4)
        walls4.append(time.perf_counter() - t0)
    toks_per_sec_b4 = int(np.sum(out4["num_tokens"])) / min(walls4)
    print(f"B=4 decode: {min(walls4)*1e3:.0f} ms, "
          f"{toks_per_sec_b4:.1f} tok/s", file=sys.stderr)
    ttfa_p50 = float(np.median(ttfa_samples))
    completion_rtf = (dec_wall + syn_wall) / audio_sec
    dec_mfu = _mfu(run_joint_decode, dec_args, dec_wall)
    syn_mfu = _mfu(run_synth, syn_args, syn_wall)
    for name, w, m in (("joint_decode", dec_wall, dec_mfu),
                       ("synthesis", syn_wall, syn_mfu)):
        timer.stages[name] = w
        mfu_s = f" mfu={m*100:.1f}%" if m is not None else ""
        print(f"stage {name}: {w*1e3:.0f} ms{mfu_s}", file=sys.stderr)
    print("stage report:", json.dumps(timer.report(audio_sec)),
          file=sys.stderr)
    print(f"completion: tokens={n_tokens} decode={dec_wall*1e3:.0f}ms "
          f"synth={syn_wall*1e3:.0f}ms ttfa_p50={ttfa_p50*1e3:.0f}ms "
          f"rtf={completion_rtf:.4f}", file=sys.stderr)

    print(json.dumps({
        "metric": "completion_rtf",
        "value": round(completion_rtf, 4),
        "unit": "wall_s_per_audio_s",
        "vs_baseline": round(0.1 / completion_rtf, 3),
        "reconstruction_rtf": round(recon_rtf, 4),
        "decode_tokens_per_sec": round(toks_per_sec, 1),
        "decode_tokens_per_sec_b4": round(toks_per_sec_b4, 1),
        "ttfa_p50_s": round(ttfa_p50, 4),
    }))


if __name__ == "__main__":
    main()
