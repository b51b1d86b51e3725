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
import functools
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
    # Weights are generated ON DEVICE (jax.random, jitted): shipping GBs
    # of host-generated weights through the remote-device tunnel takes
    # tens of minutes; the values themselves don't matter for timing.
    _key = [jax.random.PRNGKey(0)]

    def _dev_key():
        _key[0], k = jax.random.split(_key[0])
        return k

    @functools.partial(jax.jit, static_argnums=(1, 2))
    def _mk_dev(k, d_in, d_out):
        kq, ks = jax.random.split(k)
        q = jax.random.randint(kq, (d_in, d_out), -127, 128, jnp.int32)
        s = (jax.random.uniform(ks, (d_out,), jnp.float32) + 0.5) / 127.0
        return q.astype(jnp.int8), s

    def mk(d_in, d_out):
        return _mk_dev(_dev_key(), d_in, d_out)

    def gemv(x, w, s):
        return (x.astype(jnp.bfloat16) @ w.astype(jnp.bfloat16)) \
            * s.astype(jnp.bfloat16)

    # Weight sets are built LAZILY (memoized) so `--only` skips the host
    # randn + tunnel transfer of unselected layouts — building everything
    # eagerly ships multiple GB through the remote-device tunnel and can
    # stall the whole run for >10 min before the first timing.
    _ws_cache = {}

    def _memo(key, build):
        if key not in _ws_cache:
            _ws_cache[key] = build()
        return _ws_cache[key]

    # ---- layout A: separate projections -------------------------------
    def get_ws_a():
        return _memo("a", lambda: [[mk(*sh) for sh in shapes]
                                   for _ in range(L)])

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

    def get_ws_b():
        return _memo("b", lambda: [[fuse(lw[0:3]), lw[3], fuse(lw[4:6]),
                                    lw[6]] for lw in get_ws_a()])

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

    def get_ws_c():
        return _memo("c", lambda: mk(H, per_layer * L // H))

    def step_c(x, ws):
        y = gemv(x, *ws)
        return x + y[:, :H]

    def loop(step):
        # Weights are a jit ARGUMENT, not a closure: closing over ~1 GB of
        # device arrays embeds them as HLO constants, and the remote-compile
        # tunnel then uploads the whole gigabyte per compile (>30 min).
        def run(x0, ws):
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
        # int8 grid stands in for randn (generated on device)
        q, _ = mk(d_in, d_out)
        return quantize_int4(q.astype(jnp.float32) * (0.02 / 64.0))

    fused_shapes = [(H, H + 2 * KV), (H, H), (H, 2 * I), (I, H)]

    def get_ws_q():
        return _memo("q", lambda: [[mk4(*sh) for sh in fused_shapes]
                                   for _ in range(L)])

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
    def get_ws_r():
        def build():
            a, b = get_ws_a(), get_ws_b()
            return [[b[l][0], b[l][1], a[l][4], a[l][5], a[l][6]]
                    for l in range(L)]
        return _memo("r", build)

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
        q, _ = mk(d_in, d_out)
        return quantize_int4_tiled(q.astype(jnp.float32) * (0.02 / 64.0),
                                   tile)

    def get_ws_s():
        return _memo("s", lambda: [[mk4(H, H + 2 * KV), mk4(H, H),
                                    mk4(H, I), mk4(H, I), mk4t(I, H, 512)]
                                   for _ in range(L)])

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
    for name, step, get_ws in (("A separate", step_a, get_ws_a),
                               ("B fused", step_b, get_ws_b),
                               ("P pallas-fused", step_p, get_ws_b),
                               ("Q pallas-int4", step_q, get_ws_q),
                               ("R fusedmlp-i8", step_r, get_ws_r),
                               ("S fusedmlp-i4", step_s, get_ws_s),
                               ("C giant", step_c, get_ws_c)):
        if only and name[0] not in only:
            continue
        fn, ws = loop(step), get_ws()
        x0 = jnp.asarray(r.randn(1, H).astype(np.float32))
        t0 = time.perf_counter()
        _ = float(jnp.sum(fn(x0, ws)))   # compile + warm
        print(f"{name:12s} compile+warm {time.perf_counter()-t0:.1f}s",
              flush=True)
        walls = []
        for i in range(args.iters):
            xi = x0 + (i + 1) * 1e-6  # vary input per call (tunnel memo);
            # i=0 must also differ from the warmup input x0
            t0 = time.perf_counter()
            _ = float(jnp.sum(fn(xi, ws)))  # host readback forces execution
            walls.append(time.perf_counter() - t0)
        w = float(np.median(walls))
        per_step = w / args.steps * 1e3
        print(f"{name:12s} {w*1e3:8.1f} ms/call  {per_step:6.3f} ms/step  "
              f"{gb/ (w/args.steps):6.0f} GB/s")


if __name__ == "__main__":
    main()
