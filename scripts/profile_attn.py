#!/usr/bin/env python
"""Microbench: conformer rel-pos attention fwd / fwd+bwd vs plain attention.

Isolates the ESPnet relative-position term (`bd` + skew) of
models/conformer.py:RelPositionAttention at the stage-1 training shapes
(speech-decoder LM: B=8, T=1596, H=8, dk=128) so the train-step backward
cost can be attributed to it.  Pure-jax replicas of the module math (same
algebra, same dtypes) — no flax, so jax.grad applies directly.

Usage: python scripts/profile_attn.py [--platform cpu] [--b 8] [--t 1596]
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu")

PEAK = float(os.environ.get("TPU_PEAK_FLOPS", 197e12))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--t", type=int, default=1596)
    ap.add_argument("--h", type=int, default=8)
    ap.add_argument("--dk", type=int, default=128)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
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

    B, T, H, DK = args.b, args.t, args.h, args.dk
    D = H * DK
    dtype = jnp.bfloat16
    r = np.random.RandomState(0)

    def mk(*shape, scale=0.02):
        return jnp.asarray(r.randn(*shape) * scale, dtype)

    # weights: q/k/v/out/pos projections + biases u/v
    W = dict(q=mk(D, D), k=mk(D, D), v=mk(D, D), o=mk(D, D), p=mk(D, D),
             bu=mk(H, DK, scale=0.1), bv=mk(H, DK, scale=0.1))
    x = mk(B, T, D, scale=1.0)
    pe = mk(2 * T - 1, D, scale=1.0)   # rel-pos table slice
    causal = jnp.tril(jnp.ones((T, T), bool))[None, None]

    def rel_shift(z):
        b, h, t, _ = z.shape
        z = jnp.pad(z, ((0, 0), (0, 0), (0, 0), (1, 0)))
        z = z.reshape(b, h, 2 * t, t)[:, :, 1:]
        z = z.reshape(b, h, t, 2 * t - 1)
        return z[..., :t]

    def attn(W, x, pe, rel: bool):
        q = (x @ W["q"]).reshape(B, T, H, DK)
        k = (x @ W["k"]).reshape(B, T, H, DK)
        v = (x @ W["v"]).reshape(B, T, H, DK)
        ac = jnp.einsum("bqhd,bkhd->bhqk", q + W["bu"][None, None], k,
                        preferred_element_type=jnp.float32)
        if rel:
            p = (pe @ W["p"]).reshape(2 * T - 1, H, DK)
            bd = jnp.einsum("bqhd,phd->bhqp", q + W["bv"][None, None], p,
                            preferred_element_type=jnp.float32)
            scores = ac + rel_shift(bd)
        else:
            scores = ac
        scores = scores * (1.0 / np.sqrt(DK))
        scores = jnp.where(causal, scores, jnp.float32(-1e30))
        probs = jax.nn.softmax(scores, axis=-1).astype(dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                         preferred_element_type=jnp.float32).astype(dtype)
        return (out.reshape(B, T, D) @ W["o"])

    def loss(W, x, pe, rel):
        return jnp.sum(attn(W, x, pe, rel).astype(jnp.float32) ** 2)

    def force(o):
        return float(jnp.sum(jax.tree_util.tree_leaves(o)[0].astype(jnp.float32)))

    def timed(label, fn, vary_x=True, n=3):
        t0 = time.perf_counter()
        force(fn(W, x, pe))
        comp = time.perf_counter() - t0
        walls = []
        for i in range(1, n + 1):
            xi = x + jnp.asarray(1e-4 * i, dtype) if vary_x else x
            jax.block_until_ready(xi)
            t0 = time.perf_counter()
            force(fn(W, xi, pe))
            walls.append(time.perf_counter() - t0)
        w = min(walls)
        try:
            cost = fn.lower(W, x, pe).compile().cost_analysis()
            if isinstance(cost, list):
                cost = cost[0]
            fl = float(cost["flops"])
            extra = (f"  {fl/1e9:8.1f} GF  mfu={fl/w/PEAK*100:5.1f}%  "
                     f"bytes={float(cost.get('bytes accessed', 0))/2**30:.2f}GiB")
        except Exception:
            extra = ""
        print(f"{label:26s} {w*1e3:8.1f} ms{extra}  (compile {comp:.0f}s)",
              flush=True)
        return w

    for rel in (False, True):
        tag = "rel-pos" if rel else "plain  "
        fwd = jax.jit(functools.partial(lambda W, x, pe, rel: attn(W, x, pe, rel), rel=rel))
        timed(f"{tag} fwd", fwd)
        g = jax.jit(functools.partial(
            lambda W, x, pe, rel: jax.grad(loss)(W, x, pe, rel), rel=rel))
        timed(f"{tag} fwd+bwd", g)


if __name__ == "__main__":
    main()
