"""Pallas TPU causal flash attention with the espnet rel-pos (Transformer-XL)
score term, for the conformer training path.

The XLA path (models/conformer.py RelPositionAttention, causal_scores=True)
materializes per layer, per direction, several [B, H, T, T] tensors in HBM
(ac f32, bd + its skew copy, scores f32, probs) — at the S3-LM training shape
(B=8, H=8, T~1640, 7 layers) that is tens of GB of traffic per step and the
stage-1 MFU sink (scripts/profile_s3attn.py).  This kernel computes

    scores[i, j] = (q_u[i]·k[j] + q_v[i]·p[(T-1)-i+j]) / sqrt(dk)
    out = softmax(mask(scores)) @ v        with mask = (j <= i) & (j < len_b)

entirely in VMEM, with **block-level causal pruning**: each 128-row q block
qi streams only the kv chunks j <= qi (a dynamic-bound `fori_loop`), so the
strictly-upper causal half of the score rectangle is never computed — half
the MXU score work and half the exp/VPU work of the one-shot rectangle
(docs/TRAIN_PROFILE.md item 3).  Per chunk the `bd` term is one matmul
`q_v_blk @ p[start+c0 : start+c0+2*BQ]^T` followed by the per-row skew
y[r, c] = x[r, (BQ-1-r) + c], realised as log2(BQ) masked column shifts
(binary decomposition of the row-dependent shift — no gathers); the forward
is an online softmax (running max/sum) that also emits the per-row LSE.  A
custom VJP recomputes the chunk scores against the saved LSE in the backward
kernel (flash style, no stored probabilities) and accumulates dk/dv/dp
across q blocks in VMEM-resident output blocks (the q-block grid dimension
is minor, so the accumulator block stays resident; dp is emitted per (b, h)
and reduced over b in XLA).

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
BK = 512           # kv columns per pruning chunk (multiple of BQ)
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


def _chunk_scores(q_u, q_v, k_blk, p_blk, qi, c0, lo, length, *, scale, bk):
    """[BQ, bk] masked scores for q block qi against the kv window at column
    c0 (the window may be clamped left of the chunk's logical range [lo,
    lo+bk); entries with k_pos < lo belong to an earlier chunk and are
    masked out here so nothing double-counts).

    Returns (scores, mask); masked entries hold NEG_INF."""
    ac = jax.lax.dot_general(
        q_u, k_blk, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [BQ, bk]
    x3 = jax.lax.dot_general(
        q_v, p_blk, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [BQ, bk+BQ]
    y = _skew_left(x3, BQ)[:, :bk]
    s = (ac + y) * scale
    q_pos = qi * BQ + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    k_pos = c0 + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    mask = (k_pos >= lo) & (k_pos <= q_pos) & (k_pos < length)
    return jnp.where(mask, s, NEG_INF), mask


def _fwd_kernel(len_ref, q_u_ref, q_v_ref, k_ref, v_ref, p_ref,
                o_ref, lse_ref, *, scale: float, tp: int, num_heads: int):
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    length = len_ref[bh // num_heads]
    start = pl.multiple_of(tp - (qi + 1) * BQ, BQ)
    q_u = q_u_ref[0]
    q_v = q_v_ref[0]
    dk = q_u.shape[-1]
    bk = min(BK, tp)

    def body(j, carry):
        m_run, l_run, acc = carry
        lo = j * bk                       # chunk's logical column range start
        c0 = pl.multiple_of(jnp.minimum(lo, tp - bk), BQ)   # clamped window
        k_blk = k_ref[0, pl.ds(c0, bk), :]
        v_blk = v_ref[0, pl.ds(c0, bk), :]
        p_blk = p_ref[0, pl.ds(start + c0, bk + BQ), :]
        s, mask = _chunk_scores(q_u, q_v, k_blk, p_blk, qi, c0, lo, length,
                                scale=scale, bk=bk)
        m_new = jnp.maximum(m_run, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_run - m_new)
        e = jnp.where(mask, jnp.exp(s - m_new), 0.0)
        l_new = l_run * alpha + jnp.sum(e, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            e.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc * alpha + pv

    m0 = jnp.full((BQ, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((BQ, 1), jnp.float32)
    acc0 = jnp.zeros((BQ, dk), jnp.float32)
    n_chunks = ((qi + 1) * BQ + bk - 1) // bk
    m, l, acc = jax.lax.fori_loop(0, n_chunks, body, (m0, l0, acc0))
    l = jnp.maximum(l, 1e-30)
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    # lse block is sublane-padded to 8 rows (Mosaic min f32 tile); row 0 is
    # the payload, the broadcast keeps the write a full-tile store
    lse_ref[0] = jnp.broadcast_to((m + jnp.log(l)).T, (8, BQ))


def _bwd_kernel(len_ref, q_u_ref, q_v_ref, k_ref, v_ref, p_ref,
                do_ref, o_ref, lse_ref,
                dqu_ref, dqv_ref, dk_ref, dv_ref, dp_ref,
                *, scale: float, tp: int, num_heads: int):
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    length = len_ref[bh // num_heads]
    start = pl.multiple_of(tp - (qi + 1) * BQ, BQ)

    @pl.when(qi == 0)
    def _init():
        dk_ref[...] = jnp.zeros(dk_ref.shape, dk_ref.dtype)
        dv_ref[...] = jnp.zeros(dv_ref.shape, dv_ref.dtype)
        dp_ref[...] = jnp.zeros(dp_ref.shape, dp_ref.dtype)

    q_u = q_u_ref[0]
    q_v = q_v_ref[0]
    do = do_ref[0]                                          # [BQ, dk]
    o = o_ref[0]
    lse = lse_ref[0][0, :][:, None]                         # [BQ, 1]
    dk = q_u.shape[-1]

    do_f = do.astype(jnp.float32)
    delta = jnp.sum(do_f * o.astype(jnp.float32), axis=-1, keepdims=True)

    bk = min(BK, tp)

    def body(j, carry):
        acc_dqu, acc_dqv = carry
        lo = j * bk
        c0 = pl.multiple_of(jnp.minimum(lo, tp - bk), BQ)
        k_blk = k_ref[0, pl.ds(c0, bk), :]
        v_blk = v_ref[0, pl.ds(c0, bk), :]
        p_blk = p_ref[0, pl.ds(start + c0, bk + BQ), :]
        # recompute chunk scores against the saved fwd LSE (same normalizer)
        s, mask = _chunk_scores(q_u, q_v, k_blk, p_blk, qi, c0, lo, length,
                                scale=scale, bk=bk)
        prob = jnp.where(mask, jnp.exp(s - lse), 0.0)       # [BQ, bk] f32
        # dscores (wrt the pre-scale ac + y): g = P * (dO·v^T - delta) * scale
        dpv = jax.lax.dot_general(do, v_blk, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        g = prob * (dpv - delta) * scale                    # [BQ, bk] f32
        prob_lp = prob.astype(v_blk.dtype)
        g_lp = g.astype(k_blk.dtype)

        acc_dqu += jax.lax.dot_general(
            g_lp, k_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dv_ref[0, pl.ds(c0, bk), :] += jax.lax.dot_general(
            prob_lp, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # [bk, dk]
        dk_ref[0, pl.ds(c0, bk), :] += jax.lax.dot_general(
            g_lp, q_u, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # [bk, dk]

        # scatter chunk dscores back to the q_v @ p_window layout and contract
        gw = jnp.concatenate(
            [g, jnp.zeros((BQ, BQ), jnp.float32)], axis=1)  # [BQ, bk+BQ]
        dx3 = _skew_right(gw, BQ)
        dx3_lp = dx3.astype(k_blk.dtype)
        acc_dqv += jax.lax.dot_general(
            dx3_lp, p_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp_ref[0, pl.ds(start + c0, bk + BQ), :] += jax.lax.dot_general(
            dx3_lp, q_v, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # [bk+BQ, dk]
        return acc_dqu, acc_dqv

    z = jnp.zeros((BQ, dk), jnp.float32)
    n_chunks = ((qi + 1) * BQ + bk - 1) // bk
    acc_dqu, acc_dqv = jax.lax.fori_loop(0, n_chunks, body, (z, z))
    dqu_ref[0] = acc_dqu.astype(dqu_ref.dtype)
    dqv_ref[0] = acc_dqv.astype(dqv_ref.dtype)


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
        out_specs=[
            pl.BlockSpec((1, BQ, dk), lambda i, j, *_: (i, j, 0)),
            pl.BlockSpec((1, 8, BQ), lambda i, j, *_: (i, 0, j)),
        ],
    )
    out, lse = _pcall(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bh, tp, dk), q_u.dtype),
            jax.ShapeDtypeStruct((bh, 8, tp), jnp.float32),
        ],
        interpret=_interpret(),
    )(lens, qb, qvb, kb, vb, p2)
    o = out.reshape(b, h, tp, dk).transpose(0, 2, 1, 3)[:, :t]
    return o, (qb, qvb, kb, vb, p2, lens, out, lse)


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
    qb, qvb, kb, vb, p2, lens, ob, lse = res
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
            pl.BlockSpec((1, 8, BQ), lambda i, j, *_: (i, 0, j)),
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
    )(lens, qb, qvb, kb, vb, p2, dob, ob, lse)

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
