#!/usr/bin/env python
"""Attribute the vocoder stage (flow + HiFT) cost on the real chip.

The serving bench shows the vocoder stage far from compute bound, so this
times each sub-stage with IN-GRAPH repetition (a lax.scan over R reps with
varying inputs) — per-dispatch tunnel overhead (~30 ms) and memoization
can't distort the per-call number.

Usage: python scripts/profile_vocoder.py [--reps 8] [--platform cpu]
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
    p.add_argument("--reps", type=int, default=8)
    p.add_argument("--platform", default=None)
    p.add_argument("--tiny", action="store_true")
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
    from bench import _fill_variables
    from taste_spokenlm_tpu.config import TasteConfig
    from taste_spokenlm_tpu.models.generator import VoiceGenerator

    cfg = TasteConfig.tiny() if args.tiny else TasteConfig.full()
    dtype = jnp.bfloat16
    gen = VoiceGenerator(cfg.flow, cfg.hift, dtype=dtype)
    if args.tiny:
        b, n_tok, mel_max = 1, 16, 32
    else:
        b, n_tok, mel_max = 1, 512, 904
    R = args.reps
    rng = np.random.RandomState(0)
    tokens = jnp.asarray(rng.randint(0, cfg.flow.vocab_size, (b, n_tok)),
                         jnp.int32)
    lens = jnp.full((b,), n_tok, jnp.int32)
    spk = jnp.asarray(rng.randn(b, cfg.flow.spk_embed_dim), jnp.float32)

    print("init (host-side fill)...", file=sys.stderr)
    t0 = time.perf_counter()
    shapes = jax.eval_shape(
        lambda r, t, l, s: gen.init(jax.random.PRNGKey(0), r, t, l, s,
                                    mel_max),
        jax.random.PRNGKey(1), tokens, lens, spk)
    variables = _fill_variables(shapes, dtype)
    print(f"init {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    def timed_scan(label, body, *data):
        """body(v, key, i, *data) -> scalar; scanned R times in ONE dispatch.
        All arrays go through jit ARGUMENTS (closure constants would be
        baked into the program via a host readback the tunnel rejects)."""
        @jax.jit
        def run(v, key, *d):
            def step(c, i):
                return c, body(v, jax.random.fold_in(key, i), i, *d)
            _, ys = jax.lax.scan(step, jnp.float32(0), jnp.arange(R))
            return jnp.sum(ys)

        t0 = time.perf_counter()
        float(run(variables, jax.random.PRNGKey(7), *data))
        compile_s = time.perf_counter() - t0
        walls = []
        for i in range(3):
            t0 = time.perf_counter()
            float(run(variables, jax.random.PRNGKey(10 + i), *data))
            walls.append(time.perf_counter() - t0)
        w = min(walls) / R
        print(f"{label:42s} {w*1e3:8.2f} ms/call (compile {compile_s:.0f}s)",
              flush=True)
        return w

    V = cfg.flow.vocab_size

    def vary(key, toks):
        return (toks + jax.random.randint(key, (), 0, 97)) % V

    timed_scan(
        "flow+hift full",
        lambda v, key, i, toks, ln, sp: jnp.sum(
            gen.apply(v, key, vary(key, toks), ln, sp, mel_max)[0]
            .astype(jnp.float32)[:, ::997]),
        tokens, lens, spk)

    timed_scan(
        "flow.inference (enc + 10-step CFM)",
        lambda v, key, i, toks, ln, sp: jnp.sum(
            gen.apply(v, key, vary(key, toks), ln, sp, mel_max,
                      method=lambda m, r, t, l, s, mm: m.flow.inference(
                          r, t, l, s, mm))[0].astype(jnp.float32)[:, ::97]),
        tokens, lens, spk)

    timed_scan(
        "flow token encoder + regulator",
        lambda v, key, i, toks, ln: jnp.sum(
            gen.apply(v, vary(key, toks), ln, mel_max,
                      method=lambda m, t, l, mm: m.flow._encode(
                          t, l, mm, jnp.full((b,), mm, jnp.int32))[0])
            .astype(jnp.float32)[:, ::97]),
        tokens, lens)

    mu0 = jnp.asarray(rng.randn(b, mel_max, cfg.flow.output_size) * 0.1, dtype)
    spk80 = jnp.asarray(rng.randn(b, cfg.flow.output_size) * 0.1, dtype)
    conds = jnp.zeros((b, mel_max, cfg.flow.output_size), dtype)
    mask = jnp.ones((b, mel_max), bool)
    timed_scan(
        "CFM 10-step Euler (CFG 2B U-Net)",
        lambda v, key, i, mu_, ma, sp_, c: jnp.sum(
            gen.apply(v, key, mu_ + i.astype(dtype) * 1e-3, ma, sp_, c,
                      method=lambda m, r, m2, a2, s2, c2: m.flow.decoder(
                          r, m2, a2, s2, c2)).astype(jnp.float32)[:, ::97]),
        mu0, mask, spk80, conds)

    mel0 = jnp.asarray(rng.randn(b, mel_max, cfg.flow.output_size) * 0.1,
                       jnp.float32)
    timed_scan(
        "HiFT vocoder",
        lambda v, key, i, me: jnp.sum(
            gen.apply(v, me + i.astype(jnp.float32) * 1e-3, key,
                      method=lambda m, m2, r: m.hift(m2, r))
            .astype(jnp.float32)[:, ::997]),
        mel0)

    gen_pl = VoiceGenerator(cfg.flow, cfg.hift.replace(pallas_conv=True),
                            dtype=dtype)
    timed_scan(
        "HiFT vocoder [pallas resblocks]",
        lambda v, key, i, me: jnp.sum(
            gen_pl.apply(v, me + i.astype(jnp.float32) * 1e-3, key,
                         method=lambda m, m2, r: m.hift(m2, r))
            .astype(jnp.float32)[:, ::997]),
        mel0)


if __name__ == "__main__":
    main()
