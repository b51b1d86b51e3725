"""Pallas int4 weight-only matmul (EXPERIMENTAL serving mode).

Motivation: the serving decode loops are weight-read bound, so halving
weight bytes should halve the step floor.  XLA-native S4 arrays cannot
cross this machine's PJRT transfer layer, and an in-graph nibble unpack
materializes the unpacked matrix in HBM — so the unpack has to happen in
VMEM, which is what this kernel does.

MEASURED (v5e, Llama-1B decode, B=1): with the original int32
mask/shift nibble unpack, int4 was SLOWER than the XLA int8 path
(2.61 vs 2.35 ms/step full backbone loop) — at M=1 the per-call kernel
overhead plus the VPU unpack across ~112 calls/step exceeded the
bandwidth saved.  The unpack is now a minimal pure-shift i32
formulation (see unpack_nibbles_bf16; bf16 math is NOT available in
this chip's Mosaic).  Until int4 measures faster on-chip the serving
default remains int8, with int4 opt-in (`quantized_serving="int4"`)
for HBM-capacity-constrained deployments (weights at half the int8
footprint).

Packing: the contraction dim D is split in halves; byte [d, n] of the
packed [D//2, N] uint8 buffer holds w[d, n] in the LOW nibble and
w[d + D//2, n] in the HIGH nibble (both int4, two's complement).  The
kernel streams N tiles, sign-extends the two nibble planes with int8
arithmetic shifts (no sublane/lane interleave needed), and runs one
[M, Dg] @ [Dg, Nc] MXU dot per scale group with f32 accumulation.

Scales are GROUP-WISE along D (`group` rows per scale, AWQ/GPTQ-style):
scale[g, n] covers rows [g*group, (g+1)*group) of the logical weight —
far better int4 fidelity than per-channel at zero extra HBM traffic
(the scale tensor is [D/group, N] f32, negligible).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from taste_spokenlm_tpu.ops.pallas._precision import pallas_call as _pcall
from jax.experimental.pallas import tpu as pltpu

DEFAULT_GROUP = 128


def _group(D: int, group: Optional[int] = None) -> int:
    g = group or DEFAULT_GROUP
    half = D // 2
    g = min(g, half)
    while half % g:
        g -= 1
    return g


def pack_int4(w: jnp.ndarray) -> jnp.ndarray:
    """[D, N] int (values in [-8, 7]) -> packed [D//2, N] uint8."""
    D = w.shape[0]
    assert D % 2 == 0
    lo = w[: D // 2].astype(jnp.int32) & 0xF
    hi = w[D // 2:].astype(jnp.int32) & 0xF
    return (lo | (hi << 4)).astype(jnp.uint8)


def unpack_int4_ref(wp: jnp.ndarray) -> jnp.ndarray:
    """Inverse of pack_int4 (reference/test helper): [D//2, N] -> [D, N] i8."""
    b = wp.astype(jnp.int8)
    lo = jnp.left_shift(b, 4) >> 4          # arithmetic: sign-extends
    hi = b >> 4
    return jnp.concatenate([lo, hi], axis=0)


def unpack_nibbles_bf16(wp):
    """uint8 bytes -> (lo, hi) sign-extended int4 planes as bf16, in-kernel.

    Pure-shift formulation: 1 widening cast + 4 arithmetic shifts + 2
    narrowing casts (~7 VPU ops/byte).  This is the leanest variant this
    chip's Mosaic accepts: bf16 FORMULATIONS ARE NOT AVAILABLE — Mosaic
    here has no u8->bf16/u8->f32 cast, no bf16 compare, no bf16 floor,
    and no i16 shifts (all probed on-chip; only u8->i16/i32->bf16 casts
    and i32 shifts legalize)."""
    b = wp.astype(jnp.int32)
    lo = ((b << 28) >> 28).astype(jnp.bfloat16)
    hi = ((b << 24) >> 28).astype(jnp.bfloat16)
    return lo, hi


def _kernel(x_ref, wp_ref, s_ref, out_ref, *, group: int):
    w_lo, w_hi = unpack_nibbles_bf16(wp_ref[...])
    x = x_ref[...]
    half = x.shape[-1] // 2
    n_g = half // group
    acc = None
    for plane, w_pl in ((0, w_lo), (1, w_hi)):
        for g in range(n_g):
            r0 = g * group
            part = jax.lax.dot_general(
                x[:, plane * half + r0: plane * half + r0 + group],
                w_pl[r0: r0 + group, :],
                (((1,), (0,)), ((), ())),
                # pin DEFAULT precision: a global
                # jax_default_matmul_precision=highest would request an
                # fp32-contract bf16 matmul, which Mosaic rejects
                # ("Bad lhs type") — bf16 inputs with f32 accumulation is
                # already the exact semantics this kernel wants
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)
            part = part * s_ref[plane * n_g + g, :].astype(jnp.float32)
            acc = part if acc is None else acc + part
    out_ref[...] = acc


def matmul_int4(x: jnp.ndarray, w_packed: jnp.ndarray, scale: jnp.ndarray,
                *, block_n: int = 512,
                interpret: Optional[bool] = None) -> jnp.ndarray:
    """x [..., D] bf16/f32, w_packed [D//2, N] uint8,
    scale [D//group, N] f32 -> [..., N] f32."""
    if interpret is None:
        # "axon" is this machine's TPU PJRT plugin name (utils/platform.py)
        interpret = jax.default_backend() not in ("tpu", "axon")
    lead = x.shape[:-1]
    D = x.shape[-1]
    Dh, N = w_packed.shape
    assert Dh * 2 == D, (D, w_packed.shape)
    n_scales = scale.shape[0]
    assert Dh % (n_scales // 2) == 0 and n_scales % 2 == 0, scale.shape
    group = Dh // (n_scales // 2)
    M = 1
    for s in lead:
        M *= s
    xm = x.reshape(M, D).astype(jnp.bfloat16)
    bn = min(block_n, N)
    while N % bn and bn > 128:
        bn //= 2
    if N % bn:
        # N with an odd/small factor (e.g. the 4097-way S3 logits head):
        # halving would collapse bn toward 1 — a lane dimension Mosaic
        # cannot tile.  Zero-pad the N axis to a block multiple instead
        # (zero weights -> zero logits in the pad, sliced off below).
        bn = min(block_n, 1 << (N - 1).bit_length())
        Np = -(-N // bn) * bn
        w_packed = jnp.pad(w_packed, ((0, 0), (0, Np - N)))
        scale = jnp.pad(scale, ((0, 0), (0, Np - N)))
        N_out, N = N, Np
    else:
        N_out = N
    out = _pcall(
        functools.partial(_kernel, group=group),
        grid=(N // bn,),
        in_specs=[
            pl.BlockSpec((M, D), lambda i: (0, 0)),
            pl.BlockSpec((Dh, bn), lambda i: (0, i)),
            pl.BlockSpec((n_scales, bn), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((M, bn), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        interpret=interpret,
    )(xm, w_packed, scale)
    return out[:, :N_out].reshape(*lead, N_out)


def quantize_int4(w: jnp.ndarray, group: Optional[int] = None):
    """f32 [D, N] -> (packed [D//2, N] uint8, scale [D//g, N] f32),
    symmetric group-wise scales aligned to the lo/hi nibble planes."""
    D, N = w.shape
    g = _group(D, group)
    n_g = D // g
    wg = w.reshape(n_g, g, N)
    amax = jnp.max(jnp.abs(wg), axis=1)                  # [n_g, N]
    scale = jnp.maximum(amax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(wg / scale[:, None, :]), -8, 7)
    q = q.reshape(D, N).astype(jnp.int8)
    # scale rows must follow the packed plane order: lo-half groups first
    return pack_int4(q), scale.astype(jnp.float32)


def dequantize_int4(w_packed: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """(packed, group scales) -> [D, N] f32."""
    q = unpack_int4_ref(w_packed).astype(jnp.float32)
    D, N = q.shape
    n_g = scale.shape[0]
    g = D // n_g
    return (q.reshape(n_g, g, N) * scale[:, None, :]).reshape(D, N)
