#!/usr/bin/env python
"""Measure whether horizontally fusing the decode GEMVs is worth it.

The B=1 joint-decode backbone step streams ~1.2 GB of int8 weights through
16 x 7 separate GEMVs (q/k/v/o/gate/up/down).  This times synthetic int8
decode loops at Llama-1B shapes in three layouts:

  A. separate        16 x (q,k,v,o,gate,up,down)      112 GEMVs/step
  B. fused qkv+gate  16 x (qkv, o, gateup, down)       64 GEMVs/step
  C. one giant GEMV  all weights as a single [H, sum] read (upper bound
                     on what fusion could ever buy; ignores correctness)

Same bytes in every layout — any wall delta is per-op overhead + scheduling.
Follows the CLAUDE.md tunnel rules: varied inputs per call + host readback.

Usage: python scripts/profile_fusion.py [--platform cpu] [--iters 20]
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
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--steps", type=int, default=64)
    p.add_argument("--layers", type=int, default=16)
    p.add_argument("--h", type=int, default=2048, help="hidden size")
    p.add_argument("--kv", type=int, default=512, help="kv proj out dim")
    p.add_argument("--i", dest="inter", type=int, default=8192,
                   help="mlp intermediate size")
    # --s3: the S3 speech-decoder conformer stack's decode shapes
    # (7 blocks, d=1024, MHA q/k/v/out all [1024,1024], FFN 1024<->2048)
    p.add_argument("--s3", action="store_true")
    p.add_argument("--only", default=None,
                   help="comma-separated layout letters to run, e.g. B,Q")
    args = p.parse_args()
    if args.s3:
        args.h, args.kv, args.inter, args.layers = 1024, 1024, 2048, 7
        args.steps = 512
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

    H, KV, I = args.h, args.kv, args.inter
    L = args.layers
    shapes = [(H, H), (H, KV), (H, KV), (H, H), (H, I), (H, I), (I, H)]
    r = np.random.RandomState(0)

    def mk(d_in, d_out):
        q = r.randint(-127, 128, (d_in, d_out)).astype(np.int8)
        s = (r.rand(d_out).astype(np.float32) + 0.5) / 127.0
        return jnp.asarray(q), jnp.asarray(s)

    def gemv(x, w, s):
        return (x.astype(jnp.bfloat16) @ w.astype(jnp.bfloat16)) \
            * s.astype(jnp.bfloat16)

    # ---- layout A: separate projections -------------------------------
    ws_a = [[mk(*sh) for sh in shapes] for _ in range(L)]

    def step_a(x, ws):
        for lw in ws:
            q = gemv(x, *lw[0])
            k = gemv(x, *lw[1])
            v = gemv(x, *lw[2])
            att = q + jnp.pad(k + v, ((0, 0), (0, H - KV)))
            x = x + gemv(att, *lw[3])
            g = gemv(x, *lw[4])
            u = gemv(x, *lw[5])
            x = x + gemv(jax.nn.silu(g) * u, *lw[6])
        return x

    # ---- layout B: fused qkv + fused gate-up ---------------------------
    def fuse(pairs):
        qs = jnp.concatenate([w for w, _ in pairs], axis=1)
        ss = jnp.concatenate([s for _, s in pairs], axis=0)
        return qs, ss

    ws_b = [[fuse(lw[0:3]), lw[3], fuse(lw[4:6]), lw[6]] for lw in ws_a]

    def step_b(x, ws):
        for lw in ws:
            qkv = gemv(x, *lw[0])
            q, k, v = qkv[:, :H], qkv[:, H:H + KV], qkv[:, H + KV:]
            att = q + jnp.pad(k + v, ((0, 0), (0, H - KV)))
            x = x + gemv(att, *lw[1])
            gu = gemv(x, *lw[2])
            g, u = gu[:, :I], gu[:, I:]
            x = x + gemv(jax.nn.silu(g) * u, *lw[3])
        return x

    # ---- layout C: one giant read (bandwidth upper bound) --------------
    per_layer = sum(a * b for a, b in shapes)
    wc = jnp.asarray(r.randint(-127, 128, (H, per_layer * L // H))
                     .astype(np.int8))
    sc = jnp.asarray((r.rand(wc.shape[1]).astype(np.float32) + 0.5) / 127.0)

    def step_c(x, _):
        y = gemv(x, wc, sc)
        return x + y[:, :H]

    def loop(step, ws):
        def run(x0):
            def body(x, _):
                return step(x, ws), ()
            x, _ = jax.lax.scan(body, x0, None, length=args.steps)
            return x
        return jax.jit(run)

    # ---- layout P: Pallas int8 streaming kernel per fused projection -----
    from taste_spokenlm_tpu.ops.pallas.int8_matmul import matmul_int8

    def step_p(x, ws):
        for lw in ws:   # fused layout weights (qkv, o, gateup, down)
            qkv = matmul_int8(x, *lw[0]).astype(jnp.bfloat16)
            q, k, v = qkv[:, :H], qkv[:, H:H + KV], qkv[:, H + KV:]
            att = q + jnp.pad(k + v, ((0, 0), (0, H - KV)))
            x = x + matmul_int8(att, *lw[1]).astype(jnp.bfloat16)
            gu = matmul_int8(x, *lw[2]).astype(jnp.bfloat16)
            g, u = gu[:, :I], gu[:, I:]
            x = x + matmul_int8(jax.nn.silu(g) * u,
                                *lw[3]).astype(jnp.bfloat16)
        return x

    # ---- layout Q: Pallas int4 kernel per fused projection ---------------
    from taste_spokenlm_tpu.ops.pallas.int4_matmul import (matmul_int4,
                                                           quantize_int4)

    def mk4(d_in, d_out):
        return quantize_int4(jnp.asarray(
            r.randn(d_in, d_out).astype(np.float32) * 0.02))

    fused_shapes = [(H, H + 2 * KV), (H, H), (H, 2 * I), (I, H)]
    ws_q = [[mk4(*sh) for sh in fused_shapes] for _ in range(L)]

    def step_q(x, ws):
        for lw in ws:
            qkv = matmul_int4(x, *lw[0]).astype(jnp.bfloat16)
            q, k, v = qkv[:, :H], qkv[:, H:H + KV], qkv[:, H + KV:]
            att = q + jnp.pad(k + v, ((0, 0), (0, H - KV)))
            x = x + matmul_int4(att, *lw[1]).astype(jnp.bfloat16)
            gu = matmul_int4(x, *lw[2]).astype(jnp.bfloat16)
            g, u = gu[:, :I], gu[:, I:]
            x = x + matmul_int4(jax.nn.silu(g) * u,
                                *lw[3]).astype(jnp.bfloat16)
        return x

    # ---- layout R: fused-MLP int8 kernel (1 call/MLP) + XLA attn GEMVs ---
    from taste_spokenlm_tpu.ops.pallas.fused_mlp import (
        gated_mlp_int4, gated_mlp_int8, quantize_int4_tiled)

    # fused qkv/o (from ws_b) + separate int8 gate/up/down (from ws_a)
    ws_r = [[ws_b[l][0], ws_b[l][1], ws_a[l][4], ws_a[l][5], ws_a[l][6]]
            for l in range(L)]

    def step_r(x, ws):
        for lw in ws:
            qkv = gemv(x, *lw[0])
            q, k, v = qkv[:, :H], qkv[:, H:H + KV], qkv[:, H + KV:]
            att = q + jnp.pad(k + v, ((0, 0), (0, H - KV)))
            x = x + gemv(att, *lw[1])
            x = x + gated_mlp_int8(x.astype(jnp.bfloat16),
                                   lw[2][0], lw[2][1], lw[3][0], lw[3][1],
                                   lw[4][0], lw[4][1]).astype(jnp.bfloat16)
        return x

    # ---- layout S: fused-MLP int4 kernel + pallas-int4 attn GEMVs --------
    def mk4t(d_in, d_out, tile):
        return quantize_int4_tiled(jnp.asarray(
            r.randn(d_in, d_out).astype(np.float32) * 0.02), tile)

    ws_s = [[mk4(H, H + 2 * KV), mk4(H, H),
             mk4(H, I), mk4(H, I), mk4t(I, H, 512)] for _ in range(L)]

    def step_s(x, ws):
        for lw in ws:
            qkv = matmul_int4(x, *lw[0]).astype(jnp.bfloat16)
            q, k, v = qkv[:, :H], qkv[:, H:H + KV], qkv[:, H + KV:]
            att = q + jnp.pad(k + v, ((0, 0), (0, H - KV)))
            x = x + matmul_int4(att, *lw[1]).astype(jnp.bfloat16)
            x = x + gated_mlp_int4(x.astype(jnp.bfloat16),
                                   lw[2][0], lw[2][1], lw[3][0], lw[3][1],
                                   lw[4][0], lw[4][1]).astype(jnp.bfloat16)
        return x

    gb = sum(a * b for a, b in shapes) * L / 1e9
    print(f"weights: {gb:.2f} GB int8; {args.steps} steps/call")
    only = set(args.only.upper().split(",")) if args.only else None
    for name, step, ws in (("A separate", step_a, ws_a),
                           ("B fused", step_b, ws_b),
                           ("P pallas-fused", step_p, ws_b),
                           ("Q pallas-int4", step_q, ws_q),
                           ("R fusedmlp-i8", step_r, ws_r),
                           ("S fusedmlp-i4", step_s, ws_s),
                           ("C giant", step_c, None)):
        if only and name[0] not in only:
            continue
        fn = loop(step, ws)
        x0 = jnp.asarray(r.randn(1, H).astype(np.float32))
        t0 = time.perf_counter()
        _ = float(jnp.sum(fn(x0)))   # compile + warm
        print(f"{name:12s} compile+warm {time.perf_counter()-t0:.1f}s",
              flush=True)
        walls = []
        for i in range(args.iters):
            xi = x0 + (i + 1) * 1e-6  # vary input per call (tunnel memo);
            # i=0 must also differ from the warmup input x0
            t0 = time.perf_counter()
            _ = float(jnp.sum(fn(xi)))  # host readback forces execution
            walls.append(time.perf_counter() - t0)
        w = float(np.median(walls))
        per_step = w / args.steps * 1e3
        print(f"{name:12s} {w*1e3:8.1f} ms/call  {per_step:6.3f} ms/step  "
              f"{gb/ (w/args.steps):6.0f} GB/s")


if __name__ == "__main__":
    main()
