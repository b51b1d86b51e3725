"""Length / causal / chunk mask utilities (all static-shape, jit-friendly).

Replaces the reference's mask helpers (`generate_mask_from_length`,
chunk-causal masks in /root/reference/taste_speech/modules_taste/cosyvoice/
encoder.py and utils).  Masks are boolean with True = attend/valid.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def length_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """[B] -> [B, max_len] bool, True for valid positions."""
    pos = jnp.arange(max_len)[None, :]
    return pos < lengths[:, None]


def causal_mask(t: int, dtype=jnp.bool_) -> jnp.ndarray:
    """[t, t] lower-triangular (True = attend)."""
    return jnp.tril(jnp.ones((t, t), dtype=dtype))


def chunk_causal_mask(t: int, chunk_size: int) -> jnp.ndarray:
    """WeNet-style static-chunk mask: position i attends up to the end of its
    chunk.  chunk_size=1 degenerates to strict causal; chunk_size<=0 means
    full (bidirectional) attention
    (reference cosyvoice/utils mask semantics, encoder static_chunk_size)."""
    if chunk_size <= 0:
        return jnp.ones((t, t), dtype=jnp.bool_)
    pos = np.arange(t)
    chunk_end = (pos // chunk_size + 1) * chunk_size
    mask = np.arange(t)[None, :] < chunk_end[:, None]
    return jnp.asarray(mask)


def combine_masks(*masks) -> jnp.ndarray:
    """AND masks together, broadcasting; None entries skipped."""
    out = None
    for m in masks:
        if m is None:
            continue
        out = m if out is None else jnp.logical_and(out, m)
    return out


def mask_to_bias(mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """bool mask -> additive bias (0 / large-negative, dtype-safe)."""
    neg = jnp.asarray(jnp.finfo(dtype).min / 2, dtype)
    return jnp.where(mask, jnp.zeros((), dtype), neg)
