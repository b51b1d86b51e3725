"""Pallas TPU causal flash attention with the espnet rel-pos (Transformer-XL)
score term, for the conformer training path.

The XLA path (models/conformer.py RelPositionAttention, causal_scores=True)
materializes per layer, per direction, several [B, H, T, T] tensors in HBM
(ac f32, bd + its skew copy, scores f32, probs) — at the S3-LM training shape
(B=8, H=8, T~1640, 7 layers) that is tens of GB of traffic per step and the
stage-1 MFU sink (scripts/profile_s3attn.py).  This kernel computes

    scores[i, j] = (q_u[i]·k[j] + q_v[i]·p[(T-1)-i+j]) / sqrt(dk)
    out = softmax(mask(scores)) @ v        with mask = (j <= i) & (j < len_b)

entirely in VMEM: for each 128-row q block the `bd` term is ONE matmul
`q_v_blk @ p[start:start+W]^T` (W = T + 128) followed by the per-row skew
y[r, c] = x[r, (BQ-1-r) + c], realised as log2(BQ) masked column shifts
(binary decomposition of the row-dependent shift — no gathers).  A custom
VJP recomputes the scores/softmax blockwise in the backward kernel (flash
style, no stored probabilities) and accumulates dk/dv/dp across q blocks in
VMEM-resident output blocks (the q-block grid dimension is minor, so the
accumulator block stays resident; dp is emitted per (b, h) and reduced over
b in XLA).

Replaces the torch reference's einsum rel-pos attention
(reference: CosyVoice cosyvoice/transformer/attention.py:207-245) with a
TPU-native fused kernel; numerics match the XLA path to matmul-tiling
tolerance (tests/test_relpos_flash.py).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from taste_spokenlm_tpu.ops.pallas._precision import pallas_call as _pcall
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
BQ = 128           # q rows per block; also the skew-shift range (power of 2)
_N_SHIFT_BITS = BQ.bit_length() - 1  # log2(BQ); binary-decomposition skew depth
assert (1 << _N_SHIFT_BITS) == BQ, "BQ must be a power of two"

# tests force interpret; otherwise auto-interpret when not on real TPU
_INTERPRET = [False]


def _interpret() -> bool:
    return _INTERPRET[0] or jax.default_backend() not in ("tpu", "axon")


def _skew_left(x: jnp.ndarray, bq: int) -> jnp.ndarray:
    """y[r, c] = x[r, (bq-1-r) + c]  (row r shifted left by bq-1-r).

    Variable per-row shift via binary decomposition: log2(bq) passes of
    `where(bit set, shift-left-by-2^s, identity)`.  Entries shifted in from
    beyond the row are zeros; they only land in positions that the causal
    mask removes."""
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    sh = (bq - 1) - rows
    for bit in range(_N_SHIFT_BITS):
        amt = 1 << bit
        shifted = jnp.concatenate(
            [x[:, amt:], jnp.zeros((x.shape[0], amt), x.dtype)], axis=1)
        x = jnp.where((sh & amt) != 0, shifted, x)
    return x


def _skew_right(x: jnp.ndarray, bq: int) -> jnp.ndarray:
    """Inverse of `_skew_left`: y[r, m] = x[r, m - (bq-1-r)], zero-filled.

    Used in the backward pass to scatter dscores back onto the
    q_v @ p_window layout."""
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    sh = (bq - 1) - rows
    for bit in range(_N_SHIFT_BITS):
        amt = 1 << bit
        shifted = jnp.concatenate(
            [jnp.zeros((x.shape[0], amt), x.dtype), x[:, :-amt]], axis=1)
        x = jnp.where((sh & amt) != 0, shifted, x)
    return x


def _scores_block(q_u, q_v, k, p_win, qi, length, *, scale, tp):
    """[BQ, tp] masked scores for q block qi."""
    ac = jax.lax.dot_general(
        q_u, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [BQ, tp]
    x3 = jax.lax.dot_general(
        q_v, p_win, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [BQ, W]
    y = _skew_left(x3, BQ)[:, :tp]
    s = (ac + y) * scale
    q_pos = qi * BQ + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    k_pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    mask = jnp.logical_and(k_pos <= q_pos, k_pos < length)
    return jnp.where(mask, s, NEG_INF)


def _fwd_kernel(len_ref, q_u_ref, q_v_ref, k_ref, v_ref, p_ref,
                o_ref, *, scale: float, tp: int, num_heads: int):
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    length = len_ref[bh // num_heads]
    w = tp + BQ
    start = pl.multiple_of(tp - (qi + 1) * BQ, BQ)
    p_win = p_ref[0, pl.ds(start, w), :]                    # [W, dk]
    s = _scores_block(q_u_ref[0], q_v_ref[0], k_ref[0], p_win, qi, length,
                      scale=scale, tp=tp)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    l = jnp.sum(e, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        e.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _bwd_kernel(len_ref, q_u_ref, q_v_ref, k_ref, v_ref, p_ref,
                do_ref, o_ref,
                dqu_ref, dqv_ref, dk_ref, dv_ref, dp_ref,
                *, scale: float, tp: int, num_heads: int):
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    length = len_ref[bh // num_heads]
    w = tp + BQ
    start = pl.multiple_of(tp - (qi + 1) * BQ, BQ)

    @pl.when(qi == 0)
    def _init():
        dk_ref[...] = jnp.zeros(dk_ref.shape, dk_ref.dtype)
        dv_ref[...] = jnp.zeros(dv_ref.shape, dv_ref.dtype)
        dp_ref[...] = jnp.zeros(dp_ref.shape, dp_ref.dtype)

    q_u = q_u_ref[0]
    q_v = q_v_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    p_win = p_ref[0, pl.ds(start, w), :]
    do = do_ref[0]                                          # [BQ, dk]
    o = o_ref[0]

    # recompute the fwd softmax blockwise (bitwise-same scores path)
    s = _scores_block(q_u, q_v, k, p_win, qi, length, scale=scale, tp=tp)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    l = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
    prob = e / l                                            # [BQ, tp] f32

    do_f = do.astype(jnp.float32)
    delta = jnp.sum(do_f * o.astype(jnp.float32), axis=-1, keepdims=True)
    # dscores (wrt the pre-scale ac + y): g = P * (dO·v^T - delta) * scale
    dpv = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    g = prob * (dpv - delta) * scale                        # [BQ, tp] f32
    prob_lp = prob.astype(v.dtype)
    g_lp = g.astype(k.dtype)

    dqu_ref[0] = jax.lax.dot_general(
        g_lp, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dqu_ref.dtype)
    dv_ref[0] += jax.lax.dot_general(
        prob_lp, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [tp, dk]
    dk_ref[0] += jax.lax.dot_general(
        g_lp, q_u, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [tp, dk]

    # scatter dscores back to the q_v @ p_window layout and contract
    gw = jnp.concatenate(
        [g, jnp.zeros((BQ, w - tp), jnp.float32)], axis=1)  # [BQ, W]
    dx3 = _skew_right(gw, BQ)
    dx3_lp = dx3.astype(k.dtype)
    dqv_ref[0] = jax.lax.dot_general(
        dx3_lp, p_win, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dqv_ref.dtype)
    dp_ref[0, pl.ds(start, w), :] += jax.lax.dot_general(
        dx3_lp, q_v, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [W, dk]


def _pad_t(x, tp):
    t = x.shape[1]
    if t == tp:
        return x
    pad = [(0, 0)] * x.ndim
    pad[1] = (0, tp - t)
    return jnp.pad(x, pad)


def _prep(q_u, q_v, k, v, p, lengths):
    """[B, T, H, dk] -> padded [B*H, Tp, dk]; p [2T-1, H, dk] -> [H, 2Tp, dk]
    with the table re-centred for the padded length (p'[c + Tp - T] = p[c])."""
    b, t, h, dk = q_u.shape
    tp = ((t + BQ - 1) // BQ) * BQ

    def to_bh(x):
        return _pad_t(x, tp).transpose(0, 2, 1, 3).reshape(b * h, tp, dk)

    p2 = jnp.zeros((h, 2 * tp, dk), p.dtype)
    p2 = p2.at[:, tp - t: tp + t - 1].set(p.transpose(1, 0, 2))
    if lengths is None:
        lengths = jnp.full((b,), t, jnp.int32)
    return (to_bh(q_u), to_bh(q_v), to_bh(k), to_bh(v), p2,
            lengths.astype(jnp.int32), tp)


def _fwd_call(q_u, q_v, k, v, p, lengths):
    b, t, h, dk = q_u.shape
    qb, qvb, kb, vb, p2, lens, tp = _prep(q_u, q_v, k, v, p, lengths)
    bh, nq = b * h, tp // BQ
    scale = 1.0 / math.sqrt(dk)
    kern = functools.partial(_fwd_kernel, scale=scale, tp=tp, num_heads=h)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh, nq),
        in_specs=[
            pl.BlockSpec((1, BQ, dk), lambda i, j, *_: (i, j, 0)),
            pl.BlockSpec((1, BQ, dk), lambda i, j, *_: (i, j, 0)),
            pl.BlockSpec((1, tp, dk), lambda i, j, *_: (i, 0, 0)),
            pl.BlockSpec((1, tp, dk), lambda i, j, *_: (i, 0, 0)),
            pl.BlockSpec((1, 2 * tp, dk),
                         lambda i, j, *_: (i % h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, BQ, dk), lambda i, j, *_: (i, j, 0)),
    )
    out = _pcall(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bh, tp, dk), q_u.dtype),
        interpret=_interpret(),
    )(lens, qb, qvb, kb, vb, p2)
    o = out.reshape(b, h, tp, dk).transpose(0, 2, 1, 3)[:, :t]
    return o, (qb, qvb, kb, vb, p2, lens, out)


def relpos_causal_attention(q_u, q_v, k, v, p, lengths=None):
    """Causal espnet rel-pos attention, flash-style (no [T, T] HBM tensors).

    q_u, q_v: [B, T, H, dk] query + pos_bias_u / pos_bias_v
    k, v:     [B, T, H, dk]
    p:        [2T-1, H, dk] projected rel-pos table (linear_pos output),
              entry c encoding relative offset c - (T-1), read as
              bd[i, j] = q_v[i] · p[(T-1) - i + j]
    lengths:  [B] valid key counts (None = all T valid)

    Returns [B, T, H, dk] in the q dtype.  Strictly causal (j <= i)."""
    if lengths is None:
        lengths = jnp.full((q_u.shape[0],), q_u.shape[1], jnp.int32)
    return _relpos_attn(q_u, q_v, k, v, p, lengths)


@jax.custom_vjp
def _relpos_attn(q_u, q_v, k, v, p, lengths):
    return _fwd_call(q_u, q_v, k, v, p, lengths)[0]


def _vjp_fwd(q_u, q_v, k, v, p, lengths):
    return _fwd_call(q_u, q_v, k, v, p, lengths)


def _vjp_bwd(res, do):
    qb, qvb, kb, vb, p2, lens, ob = res
    h = p2.shape[0]
    b = qb.shape[0] // h
    dk = qb.shape[2]
    t = do.shape[1]
    p_dtype = p2.dtype
    tp = qb.shape[1]
    bh, nq = b * h, tp // BQ
    scale = 1.0 / math.sqrt(dk)

    dob = _pad_t(do.astype(qb.dtype), tp) \
        .transpose(0, 2, 1, 3).reshape(bh, tp, dk)

    kern = functools.partial(_bwd_kernel, scale=scale, tp=tp, num_heads=h)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh, nq),
        in_specs=[
            pl.BlockSpec((1, BQ, dk), lambda i, j, *_: (i, j, 0)),
            pl.BlockSpec((1, BQ, dk), lambda i, j, *_: (i, j, 0)),
            pl.BlockSpec((1, tp, dk), lambda i, j, *_: (i, 0, 0)),
            pl.BlockSpec((1, tp, dk), lambda i, j, *_: (i, 0, 0)),
            pl.BlockSpec((1, 2 * tp, dk), lambda i, j, *_: (i % h, 0, 0)),
            pl.BlockSpec((1, BQ, dk), lambda i, j, *_: (i, j, 0)),
            pl.BlockSpec((1, BQ, dk), lambda i, j, *_: (i, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, BQ, dk), lambda i, j, *_: (i, j, 0)),
            pl.BlockSpec((1, BQ, dk), lambda i, j, *_: (i, j, 0)),
            pl.BlockSpec((1, tp, dk), lambda i, j, *_: (i, 0, 0)),
            pl.BlockSpec((1, tp, dk), lambda i, j, *_: (i, 0, 0)),
            pl.BlockSpec((1, 2 * tp, dk), lambda i, j, *_: (i, 0, 0)),
        ],
    )
    dqu, dqv, dk_, dv_, dp_ = _pcall(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bh, tp, dk), qb.dtype),
            jax.ShapeDtypeStruct((bh, tp, dk), qb.dtype),
            jax.ShapeDtypeStruct((bh, tp, dk), jnp.float32),
            jax.ShapeDtypeStruct((bh, tp, dk), jnp.float32),
            jax.ShapeDtypeStruct((bh, 2 * tp, dk), jnp.float32),
        ],
        interpret=_interpret(),
    )(lens, qb, qvb, kb, vb, p2, dob, ob)

    def from_bh(x, dtype):
        return x.reshape(b, h, tp, dk).transpose(0, 2, 1, 3)[:, :t] \
            .astype(dtype)

    dq_u = from_bh(dqu, qb.dtype)
    dq_v = from_bh(dqv, qb.dtype)
    dk_o = from_bh(dk_, kb.dtype)
    dv_o = from_bh(dv_, vb.dtype)
    # dp: [bh, 2Tp, dk] -> sum over batch -> re-centre to [2T-1, H, dk]
    dp = dp_.reshape(b, h, 2 * tp, dk).sum(0)[:, tp - t: tp + t - 1] \
        .transpose(1, 0, 2).astype(p_dtype)
    dlens = np.zeros((b,), dtype=jax.dtypes.float0)
    return dq_u, dq_v, dk_o, dv_o, dp, dlens


_relpos_attn.defvjp(_vjp_fwd, _vjp_bwd)


def can_use_relpos_flash(t: int, dk: int, min_len: int = 256) -> bool:
    """Kernel eligibility: long sequences, MXU-native head dim."""
    return t >= min_len and dk == 128
