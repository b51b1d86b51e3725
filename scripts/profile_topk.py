#!/usr/bin/env python
"""Isolate per-step cost of top-k/top-p filter variants inside a scan.

Times 512 chained filter+sample steps (mimicking the S3 AR loop's data
dependence: each step's logits derive from the previous sample) so the
measured per-step cost includes the real sequential-latency behavior.

Usage: python scripts/profile_topk.py [--platform cpu] [--v 4097]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--platform", default=None)
    p.add_argument("--v", type=int, default=4097)
    p.add_argument("--steps", type=int, default=512)
    p.add_argument("--iters", type=int, default=8)
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
    from taste_spokenlm_tpu.ops import sampling as S

    V, steps = args.v, args.steps
    base = jnp.asarray(np.random.RandomState(0).randn(1, V), jnp.float32)

    def old_top_k(logits, k):
        f = logits.astype(jnp.float32)
        hi = jnp.max(f, axis=-1, keepdims=True)
        lo = jnp.min(jnp.where(f > S.NEG_INF * 0.5, f, hi), axis=-1,
                     keepdims=True)

        def body(_, lohi):
            lo, hi = lohi
            mid = 0.5 * (lo + hi)
            n = jnp.sum((f >= mid).astype(jnp.int32), axis=-1, keepdims=True)
            ok = n >= k
            return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid)

        lo, hi = jax.lax.fori_loop(0, 30, body, (lo, hi))
        return jnp.where(f >= lo, logits, S.NEG_INF)

    def sort_top_k(logits, k):
        vals, _ = jax.lax.top_k(logits, k)
        return jnp.where(logits >= vals[..., -1:], logits, S.NEG_INF)

    def fan_top_k(logits, k, fan, rounds):
        f = logits.astype(jnp.float32)
        hi = jnp.max(f, axis=-1, keepdims=True)
        lo = jnp.min(jnp.where(f > S.NEG_INF * 0.5, f, hi), axis=-1,
                     keepdims=True)
        lo, _ = S._refine_bracket(f, None, lo, hi, jnp.float32(k),
                                  fan=fan, rounds=rounds)
        return jnp.where(f >= lo, logits, S.NEG_INF)

    def fan_top_p(logits, p, fan, rounds):
        f = logits.astype(jnp.float32)
        probs = jax.nn.softmax(f, axis=-1)
        mx = jnp.max(f, axis=-1, keepdims=True)
        lo = jnp.min(jnp.where(f > S.NEG_INF * 0.5, f, mx), axis=-1,
                     keepdims=True)
        _, hi = S._refine_bracket(f, probs, lo, mx, jnp.asarray(p),
                                  fan=fan, rounds=rounds, strict=True)
        keep = jnp.logical_or(f >= hi, f >= mx)
        return jnp.where(keep, logits, S.NEG_INF)

    def sort_top_p(logits, p):
        f = logits.astype(jnp.float32)
        svals = -jnp.sort(-f, axis=-1)                 # descending
        sp = jax.nn.softmax(svals, axis=-1)
        cum = jnp.cumsum(sp, axis=-1)
        n = jnp.maximum(jnp.sum((cum <= p).astype(jnp.int32), axis=-1,
                                keepdims=True), 1)
        tau = jnp.take_along_axis(svals, n - 1, axis=-1)
        keep = jnp.logical_or(f >= tau, f >= svals[..., :1])
        return jnp.where(keep, logits, S.NEG_INF)

    variants = {
        "none": lambda l: l,
        "new_fan": lambda l: S.mask_top_k(l, 25),
        "old_bisect": lambda l: old_top_k(l, 25),
        "fan4_r15_k": lambda l: fan_top_k(l, 25, 4, 15),
        "fan8_r10_k": lambda l: fan_top_k(l, 25, 8, 10),
        "fan16_r8_k": lambda l: fan_top_k(l, 25, 16, 8),
        "lax_top_k": lambda l: sort_top_k(l, 25),
        "new_top_p": lambda l: S.mask_top_p(l, 0.8),
        "fan1_r40_p": lambda l: fan_top_p(l, 0.8, 1, 40),
        "fan8_r14_p": lambda l: fan_top_p(l, 0.8, 8, 14),
        "fan16_r10_p": lambda l: fan_top_p(l, 0.8, 16, 10),
        "sort_top_p": lambda l: sort_top_p(l, 0.8),
        "categorical_only": lambda l: l,
    }

    for name, filt in variants.items():
        @jax.jit
        def run(x0, key, filt=filt, name=name):
            def body(carry, i):
                x, k2 = carry
                k2, sub = jax.random.split(k2)
                lg = filt(x) if name != "none" else x
                tok = (jax.random.categorical(sub, lg)
                       if name != "none" else jnp.argmax(lg, -1))
                # feed the sample back so steps are truly sequential
                x = x0 + 1e-3 * tok[:, None].astype(jnp.float32)
                return (x, k2), ()
            (x, _), _ = jax.lax.scan(body, (x0, key), None, length=steps)
            return x

        t0 = time.perf_counter()
        float(jnp.sum(run(base, jax.random.PRNGKey(0))))
        comp = time.perf_counter() - t0
        walls = []
        for i in range(args.iters):
            xi = base + np.float32(1e-6 * (i + 1))
            t0 = time.perf_counter()
            float(jnp.sum(run(xi, jax.random.PRNGKey(i + 1))))
            walls.append(time.perf_counter() - t0)
        w = float(np.median(walls))
        print(f"{name:18s} {w*1e3:8.1f} ms  {w/steps*1e6:7.1f} us/step"
              f"  (compile {comp:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
