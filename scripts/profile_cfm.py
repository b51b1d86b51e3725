#!/usr/bin/env python
"""CFM estimator (U-Net) cost attribution on the real chip.

The vocoder profile puts the 10-step CFM Euler solve at ~46 ms (einsum
attention; the Pallas flash route measured WORSE, 58 ms — per-program
overhead at T=904/452, B*H=16 swamps the saved logit traffic).  Estimated
FLOPs are ~200 GFLOP per solve => ~2% MFU, so the time is NOT matmuls.
Ablate the architecture (transformer stacks vs resnet/conv trunk, mid
blocks vs down/up) to find where it goes.

Usage: python scripts/profile_cfm.py [--platform cpu] [--t 904]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu")
os.environ.setdefault("TASTE_DISABLE_FLASH", "1")  # einsum attention baseline


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--platform", default=None)
    p.add_argument("--t", type=int, default=904)
    p.add_argument("--reps", type=int, default=20)
    p.add_argument("--flash", action="store_true",
                   help="re-enable the Pallas flash attention route")
    args = p.parse_args()
    if args.flash:
        os.environ["TASTE_DISABLE_FLASH"] = "0"
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
    from taste_spokenlm_tpu.models.flow import ConditionalDecoder

    base = TasteConfig.full().flow
    b, t, n_mels = 2, args.t, base.output_size
    R = args.reps
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, t, n_mels) * 0.1, jnp.bfloat16)
    mu = jnp.asarray(rng.randn(b, t, n_mels) * 0.1, jnp.bfloat16)
    spks = jnp.asarray(rng.randn(b, n_mels) * 0.1, jnp.bfloat16)
    cond = jnp.zeros((b, t, n_mels), jnp.bfloat16)
    mask = jnp.arange(t)[None, :] < jnp.asarray([t, t - 131])[:, None]

    def timed(label, cfg):
        model = ConditionalDecoder(cfg)
        shapes = jax.eval_shape(
            model.init, jax.random.PRNGKey(0), x, mask, mu,
            jnp.full((b,), 0.5, jnp.bfloat16), spks, cond)
        variables = _fill_variables(shapes, jnp.bfloat16)

        @jax.jit
        def run(v, x0):
            def step(c, i):
                tt = jnp.full((b,), (i + 1) / (R + 1), jnp.bfloat16)
                out = model.apply(v, c, mask, mu, tt, spks, cond)
                return out.astype(jnp.bfloat16), ()
            out, _ = jax.lax.scan(step, x0, jnp.arange(R))
            return jnp.sum(out.astype(jnp.float32))

        t0 = time.perf_counter()
        float(run(variables, x))
        comp = time.perf_counter() - t0
        walls = []
        for i in range(3):
            t0 = time.perf_counter()
            float(run(variables, x + jnp.bfloat16(1e-3 * (i + 1))))
            walls.append(time.perf_counter() - t0)
        w = min(walls) / R
        print(f"{label:38s} {w*1e3:8.2f} ms/eval (compile {comp:.0f}s)",
              flush=True)
        return w

    full = timed("full (4 tf x 17 stages, 12 mid)", base)
    no_tf = timed("n_blocks=0 (conv/gn trunk only)",
                  base.replace(estimator_n_blocks=0))
    no_mid = timed("num_mid_blocks=0", base.replace(estimator_num_mid_blocks=0))
    timed("one tf block per stage", base.replace(estimator_n_blocks=1))
    print(f"=> transformer stacks: {1e3*(full-no_tf):.2f} ms/eval; "
          f"mid stage: {1e3*(full-no_mid):.2f} ms/eval", flush=True)


if __name__ == "__main__":
    main()
