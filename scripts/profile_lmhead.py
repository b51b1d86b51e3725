#!/usr/bin/env python
"""Microbench: tied int8 lm_head GEMV — XLA fused-convert vs Pallas kernel.

Times a 64-step scan (mimicking the AR decode loop) of
logits = (h @ table^T) * scale at Llama-1B shapes (V=128256, D=2048),
with the table stored int8.  Roofline: 262 MB int8/step = 0.32 ms @ 819 GB/s.

Usage: python scripts/profile_lmhead.py [--platform cpu --v 1024 --d 128]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--v", type=int, default=128256)
    ap.add_argument("--d", type=int, default=2048)
    ap.add_argument("--m", type=int, default=1)
    ap.add_argument("--steps", type=int, default=64)
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
    from taste_spokenlm_tpu.ops.pallas.int8_matmul import logits_int8
    from taste_spokenlm_tpu.ops.pallas.int4_matmul import (matmul_int4,
                                                           quantize_int4)

    V, D, M, S = args.v, args.d, args.m, args.steps
    r = np.random.RandomState(0)
    table = jnp.asarray(r.randint(-127, 128, (V, D)), jnp.int8)
    scale = jnp.asarray(np.abs(r.randn(V)) * 0.01 + 0.005, jnp.float32)
    h0 = jnp.asarray(r.randn(M, D) * 0.1, jnp.bfloat16)
    # int4 head layout: quantize the BF16-dequantized table transposed
    # ([D, V], contraction-major) with group-wise scales
    table_f = (table.astype(jnp.float32) * scale[:, None]).T  # [D, V]
    q4, s4 = quantize_int4(table_f)
    q4, s4 = jax.block_until_ready((q4, s4))

    def xla_head(h):
        logits = jax.lax.dot_general(
            h, table.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return logits * scale[None, :]

    def pallas_head(h):
        return logits_int8(h, table, scale)

    def int4_head(h):
        return matmul_int4(h, q4, s4)

    def loop(head_fn, h):
        def body(carry, i):
            logits = head_fn(carry)
            # feed a couple of logit-derived values back so steps chain
            nxt = carry + (jnp.max(logits, axis=-1, keepdims=True)
                           * 1e-3).astype(carry.dtype)
            return nxt, jnp.argmax(logits, axis=-1)
        return jax.lax.scan(body, h, jnp.arange(S))

    for name, fn in (("xla fused-convert", xla_head),
                     ("pallas int8", pallas_head),
                     ("pallas int4 head", int4_head)):
        run = jax.jit(lambda h, fn=fn: loop(fn, h))
        t0 = time.perf_counter()
        out = run(h0)
        jax.block_until_ready(out)
        comp = time.perf_counter() - t0
        walls = []
        for i in range(3):
            hi = h0 + jnp.asarray(1e-3 * (i + 1), h0.dtype)
            jax.block_until_ready(hi)
            t0 = time.perf_counter()
            carry, toks = run(hi)
            float(jnp.sum(carry.astype(jnp.float32)))
            walls.append(time.perf_counter() - t0)
        w = min(walls)
        bw = V * D * S / w / 1e9
        print(f"{name:20s} {w*1e3:8.1f} ms  {w/S*1e3:6.3f} ms/step  "
              f"{bw:6.0f} GB/s  (compile {comp:.0f}s)", flush=True)
        # correctness cross-check on first step
    a = xla_head(h0)
    interp = jax.default_backend() not in ("tpu", "axon")
    b = logits_int8(h0, table, scale, interpret=interp)
    c = matmul_int4(h0, q4, s4, interpret=interp)
    err = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-9))
    agree = float(jnp.mean((jnp.argmax(a, -1) == jnp.argmax(b, -1))))
    err4 = float(jnp.max(jnp.abs(a - c)) / (jnp.max(jnp.abs(a)) + 1e-9))
    agree4 = float(jnp.mean((jnp.argmax(a, -1) == jnp.argmax(c, -1))))
    print(f"parity int8: rel err {err:.2e}, argmax agree {agree:.3f}")
    print(f"parity int4: rel err {err4:.2e}, argmax agree {agree4:.3f}")


if __name__ == "__main__":
    main()
