"""Ragged word-level ops as dense one-hot matmuls (MXU-friendly).

The reference does subword->word averaging and word-id remapping with
per-sample Python loops over index tuples
(/root/reference/taste_speech/modules_taste/audio_joint_encoder_segmenter.py:418-458,
modeling_taste.py:1438-1473).  Here they are pure batched tensor ops under
fixed padding, so they live inside the jitted graph.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from taste_spokenlm_tpu.ops.masking import length_mask


def consecutive_group_ids(word_ids: jnp.ndarray) -> jnp.ndarray:
    """[B, T] word ids -> [B, T] 0-based consecutive-run ids.

    Equivalent to torch.unique_consecutive group assignment: a new group
    starts whenever the word id changes from the previous position.
    """
    change = word_ids[:, 1:] != word_ids[:, :-1]
    return jnp.concatenate(
        [jnp.zeros_like(word_ids[:, :1]), jnp.cumsum(change, axis=1)], axis=1)


def segment_mean_pool(features: jnp.ndarray, word_ids: jnp.ndarray,
                      lengths: jnp.ndarray) -> jnp.ndarray:
    """Replace each valid position's feature by the mean of its
    consecutive-word-id run (only valid positions contribute to the mean).

    features: [B, T, C]; word_ids: [B, T]; lengths: [B] -> [B, T, C].
    Positions beyond `lengths` are returned unchanged (they are padding and
    masked downstream).  Matches the reference's
    `_averaging_subword_to_word_level` on well-formed inputs (runs never
    straddle the valid-length boundary).
    """
    b, t, c = features.shape
    groups = consecutive_group_ids(word_ids)            # [B, T] in [0, T)
    valid = length_mask(lengths, t)                     # [B, T]
    oh = (groups[:, :, None] == jnp.arange(t)[None, None, :]).astype(features.dtype)
    oh = oh * valid[:, :, None].astype(features.dtype)  # [B, T, G]
    counts = jnp.sum(oh, axis=1)                        # [B, G]
    sums = jnp.einsum("btg,btc->bgc", oh, features, preferred_element_type=jnp.float32)
    means = (sums / jnp.maximum(counts, 1.0)[:, :, None]).astype(features.dtype)
    pooled = jnp.einsum("btg,bgc->btc", oh, means, preferred_element_type=jnp.float32)
    pooled = pooled.astype(features.dtype)
    return jnp.where(valid[:, :, None], pooled, features)


def word_start_mask(word_ids: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """[B, T] -> bool [B, T]: True at the first token of each word run."""
    t = word_ids.shape[1]
    first = jnp.concatenate(
        [jnp.ones_like(word_ids[:, :1], dtype=bool),
         word_ids[:, 1:] != word_ids[:, :-1]], axis=1)
    return jnp.logical_and(first, length_mask(lengths, t))


def word_count(word_ids: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Number of word runs per sequence: [B]."""
    return jnp.sum(word_start_mask(word_ids, lengths), axis=1)


def cross_tokenizer_remap(
    src_word_ids: jnp.ndarray,  # [B, Ts] word ids in source tokenization
    src_lengths: jnp.ndarray,   # [B]
    dst_word_ids: jnp.ndarray,  # [B, Td] word ids in destination tokenization
    dst_lengths: jnp.ndarray,   # [B]
) -> jnp.ndarray:
    """Word-aligned remap matrix M: [B, Td, Ts] such that
    `dst_feats = M @ src_feats` copies, for every destination token, the
    feature of the FIRST source token of the same word run.

    Replaces the reference's bmm-with-one-hot word-start remapping
    (/root/reference/taste_speech/modeling_taste.py:1438-1473) used to carry
    taste units from the ASR (whisper) tokenization onto the LLM (llama)
    tokenization, which share word ids by construction
    (processing_taste.py:173-206).
    """
    ts = src_word_ids.shape[1]
    td = dst_word_ids.shape[1]
    src_groups = consecutive_group_ids(src_word_ids)
    dst_groups = consecutive_group_ids(dst_word_ids)
    src_start = word_start_mask(src_word_ids, src_lengths)         # [B, Ts]
    # [B, G, Ts]: indicator of the first source token of group g
    src_sel = ((src_groups[:, None, :] == jnp.arange(ts)[None, :, None])
               & src_start[:, None, :])
    # [B, Td, G]: destination token t belongs to group g
    dst_sel = (dst_groups[:, :, None] == jnp.arange(ts)[None, None, :])
    dst_valid = length_mask(dst_lengths, td)
    m = jnp.einsum("btg,bgs->bts", dst_sel.astype(jnp.float32),
                   src_sel.astype(jnp.float32))
    return m * dst_valid[:, :, None]


def alignment_mean_pool(feats: jnp.ndarray, feat_lengths: jnp.ndarray,
                        alignments: jnp.ndarray,
                        token_lengths: jnp.ndarray) -> jnp.ndarray:
    """Average encoder frames inside each token's alignment interval.

    The legacy (non-joint) segmenter
    (/root/reference/taste_speech/modules_taste/audio_segmenter.py:15-50):
    alignments [B, Ttok, 2] hold normalized (start, end) in [0, 1]; frames
    with start <= i <= end (scaled by feat length) are mean-pooled per token.

    feats: [B, Tf, C] -> [B, Ttok, C].
    """
    b, tf, c = feats.shape
    bounds = (alignments * feat_lengths[:, None, None]).astype(jnp.int32)
    frame = jnp.arange(tf)[None, None, :]
    sel = (frame >= bounds[:, :, 0:1]) & (frame <= bounds[:, :, 1:2])
    sel = sel & length_mask(token_lengths, alignments.shape[1])[:, :, None]
    self_w = sel.astype(jnp.float32)
    sums = jnp.einsum("btf,bfc->btc", self_w, feats.astype(jnp.float32))
    counts = jnp.maximum(jnp.sum(self_w, axis=-1, keepdims=True), 1.0)
    return (sums / counts).astype(feats.dtype)


def word_start_remap(
    src_word_ids: jnp.ndarray, src_lengths: jnp.ndarray,
    dst_word_ids: jnp.ndarray, dst_lengths: jnp.ndarray,
) -> jnp.ndarray:
    """Word-START to word-START map M: [B, Td, Ts], 1 only at (first dst
    token of word w, first src token of word w).  Reference
    `_get_word_start_mapping_matrix` (modeling_taste.py:1439-1451): rows for
    non-word-start dst tokens are all zero, so `M @ values - (M.sum==0)`
    yields -1 at non-word-start positions (extract_vq, :1878-1880).
    """
    src_start = word_start_mask(src_word_ids, src_lengths)
    dst_start = word_start_mask(dst_word_ids, dst_lengths)
    same_word = (dst_word_ids[:, :, None] == src_word_ids[:, None, :])
    m = same_word & dst_start[:, :, None] & src_start[:, None, :]
    return m.astype(jnp.float32)


def remap_gather(m: jnp.ndarray, values: jnp.ndarray,
                 fill=-1) -> jnp.ndarray:
    """Apply a {0,1} routing matrix m [B, Td, Ts] to integer payloads
    `values` [B, Ts, C] exactly: rows of m with a single 1 copy that source
    row; all-zero rows produce `fill`.

    This is the integer-exact replacement for `m @ values` (the reference's
    bmm, modeling_taste.py:1859-1881): on TPU a default-precision matmul
    feeds bf16 to the MXU, which cannot represent odd integers > 256, so
    codebook ids would be silently rounded.  A gather has no such hazard.
    """
    src = jnp.argmax(m, axis=-1)                          # [B, Td]
    has = jnp.sum(m, axis=-1) > 0
    gathered = jnp.take_along_axis(values, src[:, :, None], axis=1)
    return jnp.where(has[:, :, None], gathered,
                     jnp.asarray(fill, values.dtype))


def compact_valid_rows(x: jnp.ndarray, valid: jnp.ndarray, out_len: int,
                       pad_value=0) -> jnp.ndarray:
    """Gather the valid rows of x [B, T, C] (bool valid [B, T]) into a dense
    left-aligned [B, out_len, C], preserving order.  Replaces the reference's
    per-sample boolean-mask compaction (modeling_taste.py:1014-1020)."""
    b, t = valid.shape
    order = jnp.cumsum(valid.astype(jnp.int32), axis=1) - 1     # [B, T]
    order = jnp.where(valid, order, -1)
    sel = (order[:, :, None] == jnp.arange(out_len)[None, None, :])  # [B,T,W]
    # integer gather, NOT a one-hot matmul: routing int payloads (e.g.
    # codebook ids) through an einsum would feed them to the MXU as bf16 on
    # TPU, silently corrupting odd ids > 256
    src = jnp.argmax(sel, axis=1)                                # [B, W]
    out = jnp.take_along_axis(x, src[:, :, None], axis=1)
    any_row = jnp.any(sel, axis=1)[..., None]
    return jnp.where(any_row, out, pad_value)


def ragged_concat(segments, out_len: int, pad_value=0.0):
    """Pack per-sample variable-length segments contiguously (left-aligned).

    segments: list of (tensor, lengths) where tensor is [B, Ti, C] (or
    [B, Ti] for ids) and lengths is [B] (None => all Ti valid).
    Returns (packed [B, out_len, C], total_lengths [B]).

    This is the fixed-shape replacement for the reference's
    unpad_sequence/concat/pad_sequence packing
    (/root/reference/taste_speech/modeling_taste.py:400-433
    `pad_unpad_sequence`): one gather per output instead of per-sample
    Python loops.
    """
    b = segments[0][0].shape[0]
    is_2d = segments[0][0].ndim == 2
    bufs, lens, starts = [], [], []
    offset = 0
    for tensor, seg_len in segments:
        ti = tensor.shape[1]
        bufs.append(tensor if not is_2d else tensor[..., None])
        if seg_len is None:
            seg_len = jnp.full((b,), ti, jnp.int32)
        lens.append(jnp.asarray(seg_len, jnp.int32))
        starts.append(offset)
        offset += ti
    buf = jnp.concatenate(bufs, axis=1)                  # [B, sumTi, C]
    seg_lens = jnp.stack(lens, axis=1)                   # [B, K]
    cum = jnp.concatenate(
        [jnp.zeros((b, 1), jnp.int32), jnp.cumsum(seg_lens, axis=1)], axis=1)
    total = cum[:, -1]
    pos = jnp.arange(out_len)[None, :]                   # [1, L]
    # segment id of each output position: number of cum[1:] values <= pos
    seg_id = jnp.sum(pos[:, :, None] >= cum[:, None, 1:], axis=-1)  # [B, L]
    seg_id = jnp.minimum(seg_id, len(segments) - 1)
    within = pos - jnp.take_along_axis(cum, seg_id, axis=1)
    src = jnp.asarray(starts, jnp.int32)[seg_id] + within
    src = jnp.clip(src, 0, buf.shape[1] - 1)
    packed = jnp.take_along_axis(buf, src[:, :, None], axis=1)
    valid = pos < total[:, None]
    packed = jnp.where(valid[:, :, None], packed, pad_value)
    if is_2d:
        packed = packed[..., 0]
    return packed, total
