#!/usr/bin/env python
"""S3 speech-decoder AR per-step attribution on the real chip.

The bench `decoder` stage runs 512 KV-cached steps in ~168 ms wall
(~0.28 ms/step after dispatch).  Roofline: ~75 MB int8 weights +
~16 MB KV cache per step ≈ 0.19 ms at the ~470 GB/s this chip streams —
so ~0.09 ms/step is overhead.  Attribute it by scaling the layer count
(per-layer vs fixed cost) and ablating the top-k sampler.

Usage: python scripts/profile_s3dec.py [--steps 512]
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=512)
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
    from bench import _fill_variables, _force
    from taste_spokenlm_tpu.config import TasteConfig
    from taste_spokenlm_tpu.models.speech_decoder import TasteSpeechDecoder

    base = TasteConfig.full().speech_decoder
    b, t_tok, steps = 1, 40, args.steps
    r = np.random.RandomState(0)

    def build(n_blocks, qs="int8"):
        cfg = base.replace(
            llm=base.llm.replace(num_blocks=n_blocks,
                                 quantized_serving=qs))
        return TasteSpeechDecoder(cfg, dtype=jnp.bfloat16)

    spk = jnp.asarray(r.randn(b, base.spk_embed_dim), jnp.float32)
    units = jnp.asarray(r.randn(b, t_tok, base.audio_encoder_input_size) * 0.1,
                        jnp.float32)
    unit_lens = jnp.asarray([t_tok] * b)
    asr_ids = jnp.asarray(r.randint(100, 20000, (b, t_tok)) % base.text_token_size,
                          jnp.int32)
    asr_lens = jnp.asarray([t_tok] * b)

    for n_blocks, sampling_k, qs in ((7, 25, "int8"), (7, 25, "int4"),
                                     (3, 25, "int8"), (7, 0, "int8")):
        model = build(n_blocks, qs)
        # init via the training forward (creates every param incl. the
        # llm_decoder head; generate's lifted while_loop cannot init)
        sp_ids = jnp.zeros((b, 8), jnp.int32)
        shapes = jax.eval_shape(
            model.init, jax.random.PRNGKey(0), spk,
            units, unit_lens, asr_ids, asr_lens, sp_ids,
            jnp.full((b,), 8, jnp.int32))
        variables = _fill_variables(shapes, jnp.bfloat16)
        run = jax.jit(lambda v, key, u, model=model, sk=sampling_k:
                      model.apply(
            v, key, spk, u, unit_lens, asr_ids, asr_lens, max_steps=steps,
            sampling_k=sk, method=TasteSpeechDecoder.generate))
        argl = [(variables, jax.random.fold_in(jax.random.PRNGKey(5), i),
                 units + jnp.float32(1e-4 * i)) for i in range(4)]
        jax.block_until_ready(argl)
        t0 = time.perf_counter()
        out = run(*argl[0])
        jax.block_until_ready(out)
        comp = time.perf_counter() - t0
        walls = []
        for a in argl[1:]:
            t0 = time.perf_counter()
            _force(run(*a))
            walls.append(time.perf_counter() - t0)
        w = min(walls)
        n = int(np.min(np.asarray(out["speech_token_lengths"])))
        print(f"{n_blocks}L k={sampling_k} {qs} generate: {w*1e3:7.1f} ms  "
              f"{w/steps*1e3:6.3f} ms/step  (decoded>={n}, compile {comp:.0f}s)",
              flush=True)

    # per-layer cost = (t7 - t3) / 4; fixed cost = t3 - 3*per_layer


if __name__ == "__main__":
    main()
