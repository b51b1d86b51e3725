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
import numpy as np

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
    # Closed form over the smoothed one-hot (p = low except confidence at
    # the target) — no [B, T, V] one_hot/true_dist temporaries, which at
    # stage-1 training shapes cost ~0.6 GB of HBM traffic per step:
    #   sum_c p_c log p_c   = (v-1) low log(low) + conf log(conf)   (const)
    #   sum_c p_c log q_c   = low sum_c log q_c + (conf - low) log q_tgt
    entropy = 0.0
    if low > 0.0:
        entropy += (v - 1) * low * float(np.log(low))
    if confidence > 0.0:
        entropy += confidence * float(np.log(confidence))
    logp_tgt = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    cross = (confidence - low) * logp_tgt
    if low > 0.0:
        cross = cross + low * jnp.sum(logp, axis=-1)
    kl = jnp.where(valid, entropy - cross, 0.0)
    denom = jnp.maximum(jnp.sum(valid), 1) if normalize_length else logits.shape[0]
    return jnp.sum(kl) / denom


def masked_accuracy(logits: jnp.ndarray, targets: jnp.ndarray,
                    ignore_id: int = IGNORE_ID) -> jnp.ndarray:
    """Top-1 accuracy over non-ignored targets."""
    valid = targets != ignore_id
    pred = jnp.argmax(logits, axis=-1)
    correct = jnp.sum(jnp.where(valid, pred == targets, False))
    return correct / jnp.maximum(jnp.sum(valid), 1)


def masked_log_likelihood(logits: jnp.ndarray, targets: jnp.ndarray,
                          ignore_id: int = IGNORE_ID,
                          head_size: int = 0):
    """(mean log-likelihood, flipped-labels control) over valid targets —
    the per-utterance selection protocol of the reference taslm scorer
    (STAGE1_TRAIN/SpokenLM/taslm/modeling_taslm.py:324-377): score = mean
    log p(label) over non-ignored positions; the control re-scores the SAME
    logits against the valid-label sequence reversed in time, so a model
    that merely matches the label marginals scores equally on both.

    logits [..., T, V], targets [..., T] (leading dims are flattened — the
    reference runs B=1).  head_size > 0 additionally masks labels >= it.
    Fixed-shape jittable: the reverse is a gather through the cumulative
    valid-position index.
    """
    v = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1).reshape(-1, v)
    labels = targets.reshape(-1)
    valid = labels != ignore_id
    if head_size > 0:
        valid = valid & (labels < head_size)
    n = jnp.sum(valid)
    t = labels.shape[0]
    # compact the valid labels to the front (scatter by valid-rank), then
    # read them back reversed: valid position j pairs with compact[n-1-j]
    pos = jnp.cumsum(valid) - 1
    compact = jnp.zeros((t + 1,), labels.dtype).at[
        jnp.where(valid, pos, t)].set(labels)[:t]
    rev_labels = compact[jnp.clip(n - 1 - pos, 0, t - 1)]
    ll_at = jnp.take_along_axis(
        logp, jnp.maximum(labels, 0)[:, None], -1)[:, 0]
    rll_at = jnp.take_along_axis(
        logp, jnp.maximum(rev_labels, 0)[:, None], -1)[:, 0]
    denom = jnp.maximum(n, 1)
    return (jnp.sum(jnp.where(valid, ll_at, 0.0)) / denom,
            jnp.sum(jnp.where(valid, rll_at, 0.0)) / denom)


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


def chunked_ce_kl(
    logits_fn,                       # [B, Tc, H] -> [B, Tc, V]
    hidden: jnp.ndarray,             # [B, T, H] student hidden
    labels: jnp.ndarray,             # [B, T] int, IGNORE_ID = masked
    ref_hidden: Optional[jnp.ndarray] = None,  # [B, T, H] frozen-base hidden
    ref_logits: Optional[jnp.ndarray] = None,  # [B, Tr, V] teacher logits
    chunk_size: int = 64,
):
    """Cross-entropy (+ optional KL(teacher || student)) WITHOUT ever
    materializing the full [B, T, V] student logits.

    The projection + softmax run per time-chunk inside a sequential
    `lax.map` under `jax.checkpoint`, so peak memory is one
    [B, chunk, V] block and the backward recomputes it — the TPU/XLA
    equivalent of the fused/chunked CE kernels the reference gets from
    liger (SURVEY §2.4).  At Llama-1B stage-2 shapes (B=8, T=513,
    V=128256) this replaces ~8 GB of f32 logits temporaries with ~260 MB.

    The teacher comes either as hidden states (`ref_hidden`, projected
    through the same head per chunk) or as PRECOMPUTED logits
    (`ref_logits`, e.g. from the extract_vq pipeline); KL positions are
    limited to the teacher's time span, matching `kl_to_reference` on the
    unchunked path.

    Returns (text_ce, kl) — kl is None when no teacher is given.  Both are
    masked means over labels != IGNORE_ID, bit-matching the unchunked
    formulation up to f32 summation order.
    """
    assert ref_hidden is None or ref_logits is None
    b, t, h = hidden.shape
    pad = (-t) % chunk_size
    total = t + pad
    hidden = jnp.pad(hidden, ((0, 0), (0, pad), (0, 0)))
    labels = jnp.pad(labels, ((0, 0), (0, pad)), constant_values=IGNORE_ID)
    nch = total // chunk_size
    hid_c = hidden.reshape(b, nch, chunk_size, h).transpose(1, 0, 2, 3)
    lab_c = labels.reshape(b, nch, chunk_size).transpose(1, 0, 2)
    valid_all = labels != IGNORE_ID
    kl_valid = valid_all
    if ref_hidden is not None:
        ref_hidden = jax.lax.stop_gradient(
            jnp.pad(ref_hidden, ((0, 0), (0, pad), (0, 0))))
        ref_c = ref_hidden.reshape(b, nch, chunk_size, h).transpose(1, 0, 2, 3)
    else:
        ref_c = jnp.zeros((nch, b, chunk_size, 0), hidden.dtype)
    if ref_logits is not None:
        tr = ref_logits.shape[1]
        kl_valid = valid_all & (jnp.arange(total)[None, :] < tr)
        # pad/reshape in the TEACHER'S dtype (typically bf16 from the
        # extract_vq pipeline) — upcasting here would materialize a full
        # [B, T, V] f32 copy, defeating the chunking; the per-chunk f32
        # cast happens inside `one`
        refl = jax.lax.stop_gradient(jnp.pad(
            ref_logits, ((0, 0), (0, total - tr), (0, 0))))
        refl_c = refl.reshape(b, nch, chunk_size, -1).transpose(1, 0, 2, 3)
    else:
        refl_c = jnp.zeros((nch, b, chunk_size, 0), jnp.float32)
    klv_c = kl_valid.reshape(b, nch, chunk_size).transpose(1, 0, 2)

    @jax.checkpoint
    def one(args):
        h_c, l_c, r_c, rl_c, kv_c = args
        valid = l_c != IGNORE_ID
        logits = logits_fn(h_c).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, -1)
        nll = -jnp.take_along_axis(
            logp, jnp.maximum(l_c, 0)[..., None], axis=-1)[..., 0]
        nll_sum = jnp.sum(jnp.where(valid, nll, 0.0))
        n_valid = jnp.sum(valid)
        if r_c.shape[-1] > 0 or rl_c.shape[-1] > 0:
            tlogits = (logits_fn(r_c) if r_c.shape[-1] > 0
                       else rl_c).astype(jnp.float32)
            tprob = jax.nn.softmax(tlogits, -1)
            logt = jnp.log(jnp.maximum(tprob, 1e-20))
            kl = jnp.sum(tprob * (logt - logp), axis=-1)
            kl_sum = jnp.sum(jnp.where(kv_c, kl, 0.0))
            kl_cnt = jnp.sum(kv_c)
        else:
            kl_sum = jnp.zeros(())
            kl_cnt = jnp.zeros((), jnp.int32)
        return nll_sum, n_valid, kl_sum, kl_cnt

    nll_sums, n_valids, kl_sums, kl_cnts = jax.lax.map(
        one, (hid_c, lab_c, ref_c, refl_c, klv_c))
    text_ce = jnp.sum(nll_sums) / jnp.maximum(jnp.sum(n_valids), 1)
    if ref_hidden is None and ref_logits is None:
        return text_ce, None
    return text_ce, jnp.sum(kl_sums) / jnp.maximum(jnp.sum(kl_cnts), 1)
