"""Pallas TPU flash attention (streaming softmax, O(T) memory).

The TPU-native replacement for the reference's FlashAttention-2 CUDA kernels
(`flash-attn==2.8.0.post2`, requirements.txt:31 — SURVEY.md §2.4 item 2),
used for the whisper encoder's 1500-position self-attention (the tokenizer
hot path, 32 layers x 20 heads) and other long-sequence attention.

Design:
* grid (batch*heads, q_blocks); the kv loop runs inside the kernel with a
  fori_loop over k blocks, carrying the running max / normalizer / output
  accumulator in VMEM scratch (the standard flash recurrence);
* fp32 accumulation regardless of input dtype; MXU matmuls via jnp.dot with
  preferred_element_type;
* optional causal masking by skipping fully-masked k blocks via the block
  index comparison (branchless @pl.when).

Falls back to the XLA einsum path (ops/attention.py) off-TPU or for shapes
that don't tile (see `flash_attention`).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from taste_spokenlm_tpu.ops.pallas._precision import pallas_call as _pcall
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, causal: bool,
                  block_k: int, seq_len: int, valid_len: int):
    # q_ref: [block_q, d]; k_ref/v_ref: [seq_len, d]; o_ref: [block_q, d]
    block_q, d = q_ref.shape
    qi = pl.program_id(1)
    # keep MXU operands in the INPUT dtype (bf16 on the serving path —
    # fp32xfp32 dots run at a fraction of the bf16 MXU rate); all
    # accumulation stays f32 via preferred_element_type
    q = q_ref[:]

    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, d), jnp.float32)

    num_k_blocks = seq_len // block_k

    def body(ki, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[pl.ds(ki * block_k, block_k), :]
        v = v_ref[pl.ds(ki * block_k, block_k), :]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        if valid_len < seq_len:
            k_pos = ki * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            s = jnp.where(k_pos < valid_len, s, NEG_INF)
        if causal:
            q_pos = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            k_pos = ki * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            s = jnp.where(k_pos <= q_pos, s, NEG_INF)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p.astype(v.dtype), v,
                                    preferred_element_type=jnp.float32)
        return m_new, l_new, acc

    if causal:
        # only k blocks with k_start <= q_end contribute
        last_block = jnp.minimum((qi + 1) * block_q // block_k + 1,
                                 num_k_blocks)
    else:
        last_block = num_k_blocks
    m, l, acc = jax.lax.fori_loop(0, last_block, body, (m0, l0, acc0))
    o_ref[:] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _block_attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                       causal: bool, block_q: int, seq_len: int,
                       valid_len: int):
    """Non-streaming blocked attention: the full K/V for one (batch*head)
    lives in VMEM (fine up to a few thousand keys), so the softmax runs in
    one shot — no running-max/normalizer recurrence, bigger MXU dots,
    far less VPU work than the streaming kernel.  Used whenever the key
    length fits (the whisper encoder's T=1500 hot path)."""
    qi = pl.program_id(1)
    q = q_ref[:]                                   # [block_q, d]
    k = k_ref[:]                                   # [seq_len, d]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    if valid_len < seq_len:
        k_pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(k_pos < valid_len, s, NEG_INF)
    if causal:
        q_pos = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        k_pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(k_pos <= q_pos, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p.astype(v_ref.dtype), v_ref[:],
                preferred_element_type=jnp.float32)
    o_ref[:] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


# key length up to which the one-shot kernel is used (s block [block_q, tk]
# f32 + K/V in VMEM; 4096 keys ≈ 2 MB per 512-row q block)
_ONESHOT_MAX_TK = 4096


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    causal: bool = False,
                    scale: Optional[float] = None,
                    block_q: int = 128, block_k: int = 128,
                    interpret: bool = False) -> jnp.ndarray:
    """q,k,v: [B, T, H, D] -> [B, T, H, D].  T is zero-padded up to the block
    size internally (padded keys masked, padded query rows sliced off);
    D padded to >= 128 lanes."""
    b, tq_in, h, d = q.shape
    tk_in = k.shape[1]
    if scale is None:
        scale = d ** -0.5
    tq = ((tq_in + block_q - 1) // block_q) * block_q
    tk = ((tk_in + block_k - 1) // block_k) * block_k
    if tq != tq_in:
        q = jnp.pad(q, ((0, 0), (0, tq - tq_in), (0, 0), (0, 0)))
    if tk != tk_in:
        k = jnp.pad(k, ((0, 0), (0, tk - tk_in), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, tk - tk_in), (0, 0), (0, 0)))

    d_pad = max(128, int(2 ** math.ceil(math.log2(max(d, 1)))))
    if d_pad != d:
        pad = [(0, 0), (0, 0), (0, 0), (0, d_pad - d)]
        q, k, v = (jnp.pad(x, pad) for x in (q, k, v))

    # [B, T, H, D] -> [B*H, T, D]
    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], d_pad)

    qb, kb, vb = to_bh(q), to_bh(k), to_bh(v)

    if tk <= _ONESHOT_MAX_TK:
        # one-shot softmax (full K/V resident in VMEM): bigger q blocks,
        # no streaming recurrence
        bq1 = min(512, tq)
        while tq % bq1:
            bq1 //= 2
        kernel = functools.partial(
            _block_attn_kernel, scale=scale, causal=causal, block_q=bq1,
            seq_len=tk, valid_len=tk_in)
        out = _pcall(
            kernel,
            grid=(b * h, tq // bq1),
            in_specs=[
                pl.BlockSpec((None, bq1, d_pad), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, tk, d_pad), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, tk, d_pad), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((None, bq1, d_pad),
                                   lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b * h, tq, d_pad), q.dtype),
            interpret=interpret,
        )(qb, kb, vb)
        out = out.reshape(b, h, tq, d_pad).transpose(0, 2, 1, 3)
        return out[:, :tq_in, :, :d]

    kernel = functools.partial(_flash_kernel, scale=scale, causal=causal,
                               block_k=block_k, seq_len=tk, valid_len=tk_in)
    out = _pcall(
        kernel,
        grid=(b * h, tq // block_q),
        in_specs=[
            pl.BlockSpec((None, block_q, d_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, tk, d_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, tk, d_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, block_q, d_pad), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, tq, d_pad), q.dtype),
        interpret=interpret,
    )(qb, kb, vb)

    out = out.reshape(b, h, tq, d_pad).transpose(0, 2, 1, 3)
    return out[:, :tq_in, :, :d]


def can_use_flash(tq: int, tk: int, min_len: int = 256) -> bool:
    """Heuristic: worth the kernel only for long sequences (padding to the
    128-block grid is handled internally)."""
    return tq >= min_len and tk >= min_len
