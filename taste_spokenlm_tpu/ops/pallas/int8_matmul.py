"""Pallas int8 weight-only matmuls for HBM-bound decode steps.

Why a kernel when `QDense` already works: the XLA formulation
(`x @ w_int8.astype(bf16) * scale`) relies on XLA fusing the int8->bf16
convert into the dot's operand load.  That fusion holds for the mid-sized
backbone projections, but for the [V=128k, D=2048] tied lm_head GEMV the
measured step cost is ~3x the 262 MB int8 weight-read bound
(scripts/profile_decode.py: logits head ~0.9 ms/step vs 0.32 ms roofline).
Reading the int8 rows directly in a Pallas kernel and converting
tile-by-tile in VMEM removes the ambiguity: HBM sees int8 bytes only, and
the whole head is ONE kernel call per decode step (per-call overhead is
what sank the int4 path at ~112 calls/step — see ops/pallas/int4_matmul.py).

Two layouts:
* `logits_int8`: w [V, D] (embedding-table layout, per-ROW scales) —
  the tied lm_head `logits = (h @ w^T) * scale` (ops/quantized.QEmbed).
* `matmul_int8`: w [D, N] (Dense kernel layout, per-COLUMN scales) —
  decode-sized QDense calls.

Both keep MXU operands bf16 with f32 accumulation; scales applied to the
f32 accumulator.  Replaces the fused int8 GEMV kernels the reference gets
from liger/TensorRT on CUDA (SURVEY.md §2.4 item 5).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from taste_spokenlm_tpu.ops.pallas._precision import pallas_call as _pcall


def _logits_kernel(x_ref, w_ref, s_ref, out_ref):
    # x: [M, D] bf16; w: [bv, D] int8; s: [1, bv] f32 -> out [M, bv] f32
    w = w_ref[...].astype(jnp.bfloat16)
    acc = jax.lax.dot_general(
        x_ref[...], w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[...] = acc * s_ref[0, :][None, :]


def logits_int8(x: jnp.ndarray, w_q: jnp.ndarray, scale: jnp.ndarray,
                *, block_v: int = 1024,
                interpret: Optional[bool] = None) -> jnp.ndarray:
    """x [..., D] (bf16/f32), w_q [V, D] int8, scale [V] f32 -> [..., V] f32.

    Tied-lm-head projection against an int8 embedding table
    (logits[v] = (x . w_q[v]) * scale[v]) as one Pallas call."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    lead = x.shape[:-1]
    D = x.shape[-1]
    V = w_q.shape[0]
    assert w_q.shape == (V, D), (w_q.shape, x.shape)
    M = 1
    for s in lead:
        M *= s
    xm = x.reshape(M, D).astype(jnp.bfloat16)
    bv = min(block_v, V)
    while V % bv:
        bv //= 2
    out = _pcall(
        _logits_kernel,
        grid=(V // bv,),
        in_specs=[
            pl.BlockSpec((M, D), lambda i: (0, 0)),
            pl.BlockSpec((bv, D), lambda i: (i, 0)),
            pl.BlockSpec((1, bv), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((M, bv), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((M, V), jnp.float32),
        interpret=interpret,
    )(xm, w_q, scale.reshape(1, V).astype(jnp.float32))
    return out.reshape(*lead, V)


def _matmul_kernel(x_ref, w_ref, s_ref, out_ref):
    # x: [M, D] bf16; w: [D, bn] int8; s: [1, bn] f32 -> out [M, bn] f32
    w = w_ref[...].astype(jnp.bfloat16)
    acc = jax.lax.dot_general(
        x_ref[...], w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[...] = acc * s_ref[0, :][None, :]


def matmul_int8(x: jnp.ndarray, w_q: jnp.ndarray, scale: jnp.ndarray,
                *, block_n: int = 1024,
                interpret: Optional[bool] = None) -> jnp.ndarray:
    """x [..., D], w_q [D, N] int8, scale [N] f32 -> [..., N] f32."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    lead = x.shape[:-1]
    D = x.shape[-1]
    N = w_q.shape[1]
    assert w_q.shape[0] == D, (w_q.shape, x.shape)
    M = 1
    for s in lead:
        M *= s
    xm = x.reshape(M, D).astype(jnp.bfloat16)
    bn = min(block_n, N)
    # Keep the weight tile + its in-kernel bf16 convert inside scoped VMEM
    # (16 MB): a [D, bn] tile costs D*bn int8 + 2*D*bn bf16 bytes.  At
    # D=8192, bn=1024 that is 24 MB and Mosaic raises a vmem-stack OOM;
    # 2M elements (6 MB/buffer) leaves room for double buffering.
    while bn > 128 and D * bn > 2 * 1024 * 1024:
        bn //= 2
    while N % bn:
        bn //= 2
    out = _pcall(
        _matmul_kernel,
        grid=(N // bn,),
        in_specs=[
            pl.BlockSpec((M, D), lambda i: (0, 0)),
            pl.BlockSpec((D, bn), lambda i: (0, i)),
            pl.BlockSpec((1, bn), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((M, bn), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        interpret=interpret,
    )(xm, w_q, scale.reshape(1, N).astype(jnp.float32))
    return out.reshape(*lead, N)
