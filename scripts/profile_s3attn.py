#!/usr/bin/env python
"""S3-LM (speech decoder conformer) training-shape attention attribution.

profile_train_parts.py puts the speech-decoder fwd at 255 ms / 5.9% MFU
(fwd+bwd 669 ms / 8.5%) at B=8, T~1640 — the stage-1 MFU sink.  The
rel-pos attention materializes [B, H, T, 2T-1] f32 `bd` plus [T, T]
scores per layer; this script ablates the espnet rel-pos machinery to
price it: full rel-pos vs no-bd (plain dot-product) vs bf16 scores.

Usage: python scripts/profile_s3attn.py [--b 8] [--t 1640]
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
    p.add_argument("--b", type=int, default=8)
    p.add_argument("--t", type=int, default=1640)
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
    from bench import _fill_variables, PEAK_FLOPS
    from taste_spokenlm_tpu.config import TasteConfig
    from taste_spokenlm_tpu.models import conformer as C

    dtype = jnp.bfloat16
    cfg = TasteConfig.full().speech_decoder.llm.replace(
        remat=True, dropout_rate=0.0, positional_dropout_rate=0.0)
    b, t = args.b, args.t
    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(b, t, cfg.input_size) * 0.1, dtype)
    lens = jnp.asarray([t] * b)

    def force(out):
        return float(jnp.sum(jnp.asarray(
            jax.tree_util.tree_leaves(out)[0], jnp.float32)))

    def timed(label, fn, build_args, n=3):
        t0 = time.perf_counter()
        force(fn(*build_args(0)))
        comp = time.perf_counter() - t0
        walls = []
        for i in range(1, n + 1):
            a = build_args(i)
            jax.block_until_ready(a)
            t0 = time.perf_counter()
            force(fn(*a))
            walls.append(time.perf_counter() - t0)
        w = min(walls)
        try:
            cost = fn.lower(*build_args(0)).compile().cost_analysis()
            if isinstance(cost, list):
                cost = cost[0]
            fl = float(cost["flops"])
            mfu = f"  {fl/1e12:6.2f} TF  mfu={fl/w/PEAK_FLOPS*100:5.1f}%"
        except Exception:
            mfu = ""
        print(f"{label:36s} {w*1e3:7.0f} ms{mfu} (compile {comp:.0f}s)",
              flush=True)
        return w

    def build(c):
        enc = C.ConformerEncoder(c, dtype=dtype, remat=True)
        shapes = jax.eval_shape(enc.init, jax.random.PRNGKey(0), x, lens)
        v = _fill_variables(shapes, dtype)
        fwd = jax.jit(lambda vv, xx: jnp.sum(
            enc.apply(vv, xx, lens).astype(jnp.float32)))
        grad = jax.jit(jax.grad(lambda p_, xx: jnp.sum(
            enc.apply({"params": p_}, xx, lens).astype(jnp.float32))))
        return v, fwd, grad

    v, fwd, grad = build(cfg)
    timed("llm-stack fwd (rel-pos)", fwd,
          lambda i: (v, x + jnp.asarray(1e-4 * i, dtype)))
    timed("llm-stack fwd+bwd (rel-pos)", grad,
          lambda i: (v["params"], x + jnp.asarray(1e-4 * i, dtype)))

    # ablation: plain dot-product attention (no bd/rel machinery) — the
    # attention-cost upper bound if rel-pos were free
    orig_call = C.RelPositionAttention.__call__

    def plain_call(self, x_, pos_emb, mask=None, cache=None,
                   cache_index=None, pos_proj=None, causal_scores=False):
        import math
        b_, t_, _ = x_.shape
        h, dk = self.num_heads, self.d_model // self.num_heads
        q, k, vv = self._qkv(x_)
        ac = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
        scores = ac * jnp.asarray(1.0 / math.sqrt(dk), jnp.float32)
        if mask is not None:
            scores = jnp.where(mask, scores,
                               jnp.asarray(jnp.finfo(jnp.float32).min / 2))
        probs = jax.nn.softmax(scores, axis=-1).astype(x_.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, vv,
                         preferred_element_type=jnp.float32).astype(x_.dtype)
        return self.linear_out(out.reshape(b_, t_, self.d_model)), cache

    C.RelPositionAttention.__call__ = plain_call
    try:
        v2, fwd2, grad2 = build(cfg)
        timed("llm-stack fwd (no rel-pos bd)", fwd2,
              lambda i: (v2, x + jnp.asarray(1e-4 * i, dtype)))
        timed("llm-stack fwd+bwd (no rel-pos bd)", grad2,
              lambda i: (v2["params"], x + jnp.asarray(1e-4 * i, dtype)))
    finally:
        C.RelPositionAttention.__call__ = orig_call


if __name__ == "__main__":
    main()
