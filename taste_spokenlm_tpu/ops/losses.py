"""Loss / metric ops.

Label-smoothing CE with IGNORE_ID masking and length normalization
(/root/reference/taste_speech/modules_taste/cosyvoice/label_smoothing_loss.py:1-96),
top-1 accuracy over non-ignored positions (`th_accuracy`,
cosyvoice/utils.py), and KL-to-reference distillation
(modeling_taste.py:864-877).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

IGNORE_ID = -1


def label_smoothing_ce(
    logits: jnp.ndarray,        # [B, T, V]
    targets: jnp.ndarray,       # [B, T] int, IGNORE_ID = masked
    smoothing: float = 0.0,
    normalize_length: bool = True,
    ignore_id: int = IGNORE_ID,
) -> jnp.ndarray:
    """KL(smoothed-onehot || softmax(logits)) summed over valid positions,
    normalized by token count (normalize_length) or batch size."""
    v = logits.shape[-1]
    valid = targets != ignore_id
    tgt = jnp.where(valid, targets, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    confidence = 1.0 - smoothing
    low = smoothing / (v - 1) if v > 1 else 0.0
    # KL(true || pred) = sum_c p_c (log p_c - log q_c), including the (finite)
    # entropy term, matching torch kl_div semantics used by the reference.
    onehot = jax.nn.one_hot(tgt, v, dtype=jnp.float32)
    true_dist = low * (1.0 - onehot) + confidence * onehot
    plogp = jnp.where(true_dist > 0, true_dist * jnp.log(true_dist), 0.0)
    kl = jnp.sum(plogp - true_dist * logp, axis=-1)
    kl = jnp.where(valid, kl, 0.0)
    denom = jnp.maximum(jnp.sum(valid), 1) if normalize_length else logits.shape[0]
    return jnp.sum(kl) / denom


def masked_accuracy(logits: jnp.ndarray, targets: jnp.ndarray,
                    ignore_id: int = IGNORE_ID) -> jnp.ndarray:
    """Top-1 accuracy over non-ignored targets."""
    valid = targets != ignore_id
    pred = jnp.argmax(logits, axis=-1)
    correct = jnp.sum(jnp.where(valid, pred == targets, False))
    return correct / jnp.maximum(jnp.sum(valid), 1)


def kl_to_reference(
    student_logits: jnp.ndarray,  # [B, T, V]
    teacher_logits: jnp.ndarray,  # [B, T, V] (stop-gradient applied inside)
    mask: Optional[jnp.ndarray] = None,  # bool [B, T]
) -> jnp.ndarray:
    """Mean KL(teacher || student) over valid positions — the
    KL-to-frozen-base-model term of the stage-2 text loss."""
    t = jax.nn.softmax(jax.lax.stop_gradient(teacher_logits).astype(jnp.float32), -1)
    logq = jax.nn.log_softmax(student_logits.astype(jnp.float32), -1)
    logt = jnp.log(jnp.maximum(t, 1e-20))
    kl = jnp.sum(t * (logt - logq), axis=-1)
    if mask is not None:
        kl = jnp.where(mask, kl, 0.0)
        return jnp.sum(kl) / jnp.maximum(jnp.sum(mask), 1)
    return jnp.mean(kl)
