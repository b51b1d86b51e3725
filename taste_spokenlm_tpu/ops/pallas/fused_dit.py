"""Fused CFM U-Net transformer block (one Pallas call per block).

The flow estimator runs ~68 `BasicTransformerBlock`s per evaluation at tiny
shapes ([2B, T<=904, 256]) — as XLA ops that is ~15 dispatches per block and
the 10-step Euler solve is op-latency-bound, not compute-bound
(scripts/profile_cfm.py: transformer stacks 3.45 ms of 4.88 ms/eval).  This
kernel computes the whole block — LayerNorm -> self-attention (+residual)
-> LayerNorm -> 4x GELU MLP (+residual) — in one Pallas program per batch
row, with every weight and activation resident in VMEM.

Inference-only (no VJP): wired behind `FlowConfig.fused_dit_serving`, the
same serving-only convention as `quantized_serving`.  Numerics match the
XLA path to matmul-tiling tolerance (tests/test_fused_dit.py); the flow
training path keeps the XLA blocks.

Replaces the torch reference's diffusers BasicTransformerBlock stack
(matcha/components + cosyvoice/flow/decoder.py:21-222) with a TPU-fused
equivalent.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from taste_spokenlm_tpu.ops.pallas._precision import pallas_call as _pcall
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# tests force interpret; otherwise auto-interpret when not on real TPU
_INTERPRET = [False]


def _interpret() -> bool:
    return _INTERPRET[0] or jax.default_backend() not in ("tpu", "axon")


def _norm_cdf(x):
    """0.5 * (1 + erf(x / sqrt(2))) — exact-gelu factor.

    Mosaic has no erf/erfc lowering; this is Abramowitz-Stegun 7.1.26
    (max abs erf error 1.5e-7, only needs exp), indistinguishable from the
    XLA exact gelu at bf16 activation precision."""
    z = x * (2.0 ** -0.5)
    a = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    erf_abs = 1.0 - poly * jnp.exp(-a * a)
    return 0.5 * (1.0 + jnp.sign(z) * erf_abs)


def _layer_norm(x, scale, bias, eps=1e-5):
    """flax nn.LayerNorm numerics (f32 stats, fast variance)."""
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(x32 * x32, axis=-1, keepdims=True) - mu * mu, 0.0)
    h = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return h * scale.astype(jnp.float32) + bias.astype(jnp.float32)


def _kernel(len_ref, x_ref,
            g1_ref, b1_ref, wq_ref, wk_ref, wv_ref, wo_ref, bo_ref,
            g3_ref, b3_ref, w1_ref, bf1_ref, w2_ref, bf2_ref,
            o_ref, *, heads: int, head_dim: int, tp: int):
    b = pl.program_id(0)
    length = len_ref[b]
    x = x_ref[0]                                            # [Tp, C]
    dt = x.dtype
    scale = head_dim ** -0.5

    h = _layer_norm(x, g1_ref[0], b1_ref[0]).astype(dt)
    q = jnp.dot(h, wq_ref[:], preferred_element_type=jnp.float32).astype(dt)
    k = jnp.dot(h, wk_ref[:], preferred_element_type=jnp.float32).astype(dt)
    v = jnp.dot(h, wv_ref[:], preferred_element_type=jnp.float32).astype(dt)

    k_pos = jax.lax.broadcasted_iota(jnp.int32, (tp, tp), 1)
    key_ok = k_pos < length
    outs = []
    for hh in range(heads):
        sl = slice(hh * head_dim, (hh + 1) * head_dim)
        s = jnp.dot(q[:, sl], k[:, sl].T,
                    preferred_element_type=jnp.float32) * scale
        s = jnp.where(key_ok, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        l = jnp.sum(e, axis=-1, keepdims=True)
        p = (e / jnp.maximum(l, 1e-30)).astype(dt)
        outs.append(jnp.dot(p, v[:, sl],
                            preferred_element_type=jnp.float32).astype(dt))
    a = jnp.concatenate(outs, axis=1)                       # [Tp, inner]
    a = (jnp.dot(a, wo_ref[:], preferred_element_type=jnp.float32)
         + bo_ref[0].astype(jnp.float32)).astype(dt)
    x = x + a

    h = _layer_norm(x, g3_ref[0], b3_ref[0]).astype(dt)
    f = (jnp.dot(h, w1_ref[:], preferred_element_type=jnp.float32)
         + bf1_ref[0].astype(jnp.float32))
    f = (f * _norm_cdf(f)).astype(dt)
    f = (jnp.dot(f, w2_ref[:], preferred_element_type=jnp.float32)
         + bf2_ref[0].astype(jnp.float32)).astype(dt)
    o_ref[0] = x + f


def fused_dit_block(x, lengths, params, *, heads: int, head_dim: int):
    """One BasicTransformerBlock, fused.

    x: [B, T, C]; lengths: [B] valid key counts (contiguous-prefix mask);
    params: the block's flax param subtree ({"norm1", "attn1": {"to_q",
    "to_k", "to_v", "to_out"}, "norm3", "ff_in", "ff_out"}).
    """
    b, t, c = x.shape
    # sublane-align T only (mult of 16 covers bf16); padding the scores'
    # [tp, tp] elementwise work to 128 lanes costs more than it saves
    tp = ((t + 15) // 16) * 16
    if tp != t:
        x = jnp.pad(x, ((0, 0), (0, tp - t), (0, 0)))
    attn = params["attn1"]

    def row(a):
        return a.reshape(1, -1)

    args = (
        lengths.astype(jnp.int32), x,
        row(params["norm1"]["scale"]), row(params["norm1"]["bias"]),
        attn["to_q"]["kernel"], attn["to_k"]["kernel"],
        attn["to_v"]["kernel"],
        attn["to_out"]["kernel"], row(attn["to_out"]["bias"]),
        row(params["norm3"]["scale"]), row(params["norm3"]["bias"]),
        params["ff_in"]["kernel"], row(params["ff_in"]["bias"]),
        params["ff_out"]["kernel"], row(params["ff_out"]["bias"]),
    )
    inner = heads * head_dim
    full = lambda *shape: pl.BlockSpec(shape, lambda i, *_: (0,) * len(shape))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, tp, c), lambda i, *_: (i, 0, 0)),
            full(1, c), full(1, c),
            full(c, inner), full(c, inner), full(c, inner),
            full(inner, c), full(1, c),
            full(1, c), full(1, c),
            full(c, 4 * c), full(1, 4 * c),
            full(4 * c, c), full(1, c),
        ],
        out_specs=pl.BlockSpec((1, tp, c), lambda i, *_: (i, 0, 0)),
    )
    kern = functools.partial(_kernel, heads=heads, head_dim=head_dim, tp=tp)
    out = _pcall(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, tp, c), x.dtype),
        interpret=_interpret(),
    )(*args)
    return out[:, :t]


def can_use_fused_dit(t: int, c: int, inner: int) -> bool:
    """VMEM-budget + lane-alignment eligibility.

    The kernel keeps per-head [Tp,Tp] f32 score tensors plus a [Tp,Tp] int32
    iota mask resident in a single VMEM program: ~4.2 MB each at T=1024 vs
    ~16 MB at T=2048, which would blow the ~128 MB v5e VMEM budget once the
    x/qkv/mlp operands are added. Serving shapes are T<=904; bound at 1024 so
    eligibility guarantees Mosaic compilability rather than merely admitting
    the shapes we happen to use.
    """
    return t <= 1024 and c % 128 == 0 and inner % 128 == 0
