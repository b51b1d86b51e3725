"""In-graph sampling ops: top-k / top-p (nucleus), repetition penalty,
temperature — all branchless and jit/scan-friendly.

Replaces the reference's host-side sampling loops
(/root/reference/taste_speech/modeling_taste.py:356-369 `sampling_ids` with
its EOS-rejection while-loop, modules_taste/sampler.py:85-111 top-p with
repetition penalty).  EOS rejection before a minimum length is expressed as
masking the EOS logit before sampling, which is distribution-identical to
rejection re-sampling (renormalization over the non-EOS support).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# numpy (not jnp) scalar: importing this module must not initialize the
# device backend (a jnp constant here would block the whole package import
# on a TPU-tunnel outage and defeat CPU-forcing done after `import jax`).
# A np.float32 scalar promotes exactly like the former jnp.float32 one.
NEG_INF = np.float32(np.finfo(np.float32).min / 2)


def temperature_scale(logits: jnp.ndarray, temperature: float | jnp.ndarray) -> jnp.ndarray:
    return logits / jnp.maximum(jnp.asarray(temperature, logits.dtype), 1e-6)


def apply_repetition_penalty(logits: jnp.ndarray, token_counts: jnp.ndarray,
                             penalty: float | jnp.ndarray) -> jnp.ndarray:
    """CTRL-style repetition penalty over tokens already emitted.

    logits: [..., V]; token_counts: [..., V] (>0 where the token appeared).
    positive logits are divided by `penalty`, negative multiplied.
    """
    seen = token_counts > 0
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, penalized, logits)


def _refine_bracket(f, weights, lo, hi, budget, fan: int, rounds: int,
                    strict: bool = False):
    """Shared wide-fan threshold search for top-k / top-p.

    Finds the boundary tau of the monotone predicate
    `sum_v weights[v] * (f[v] >= tau) >= budget` (weights=1 -> a count;
    weights=probs -> a mass): returns (lo, hi) with predicate true at lo,
    false at hi, and bracket width shrunk by fan^rounds.

    Each round shrinks the bracket by ~(fan+1)x at the cost of one
    [..., V, fan] broadcast-compare-reduce, so `rounds` trades dependent-
    step latency against per-round bytes.  Measured on the v5e chip inside
    a 128-step AR scan at V=128256 (scripts/profile_topk.py, cost over the
    bare jax.random.categorical baseline):

      top-p  fan=8/r=14:  +26 us   fan=1/r=40 (bisection): +76 us
             fan=128/r=6: +822 us  full sort+cumsum:       +1098 us
      top-k  fan=4..16:   ~free    fan=1/r=30: +81 us   lax.top_k: +915 us

    fan=8 is the sweet spot at both V=4097 and V=128256: the [V, fan]
    intermediate stays small enough to fuse, while 11-14 rounds resolve
    the bracket to 9^11..9^14 (2^35..2^44) of the initial width — past
    f32 ulp — in a third of bisection's dependent steps."""
    grid = jnp.arange(1, fan + 1, dtype=jnp.float32) / (fan + 1)
    for _ in range(rounds):
        taus = lo + (hi - lo) * grid                       # [..., fan]
        kept = f[..., :, None] >= taus[..., None, :]       # [..., V, fan]
        if weights is None:
            stat = jnp.sum(kept.astype(jnp.float32), axis=-2)
        else:
            stat = jnp.sum(jnp.where(kept, weights[..., :, None], 0.0),
                           axis=-2)
        ok = (stat > budget) if strict else (stat >= budget)
        # stat is non-increasing in tau -> ok is a True prefix
        idx = jnp.sum(ok.astype(jnp.int32), axis=-1, keepdims=True) - 1
        lo_new = jnp.where(
            idx >= 0,
            jnp.take_along_axis(taus, jnp.maximum(idx, 0), axis=-1), lo)
        hi_new = jnp.where(
            idx + 1 < fan,
            jnp.take_along_axis(taus, jnp.minimum(idx + 1, fan - 1),
                                axis=-1), hi)
        lo, hi = lo_new, hi_new
    return lo, hi


def mask_top_k(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    """Keep the top-k logits, set the rest to -inf.  Static k.

    TPU-first: `lax.top_k` lowers to a sort and measures ~43 us/step inside
    the S3 AR decode at V=4097 (scripts/profile_s3dec.py) — ~15% of the
    whole decode step.  Instead find the threshold tau such that
    count{l >= tau} >= k is maximal (the kth-largest value to within one
    f32 ulp) with the wide-fan search (_refine_bracket): the kept set
    equals the sort-based one whenever the kth and (k+1)th logits differ
    by more than an ulp (always, for real logits; exact ties keep both,
    which draws from the same distribution)."""
    f = logits.astype(jnp.float32)
    hi = jnp.max(f, axis=-1, keepdims=True)      # count{>= hi} >= 1
    # search over the FINITE logit range: entries already masked to
    # NEG_INF (banned / forbid_eos run before top-k in `sample`) would
    # blow the bracket to ~1e38 and the refinement could not resolve the
    # real logit window
    lo = jnp.min(jnp.where(f > NEG_INF * 0.5, f, hi), axis=-1,
                 keepdims=True)                  # count{>= lo} >= k (or all)
    lo, _ = _refine_bracket(f, None, lo, hi, jnp.float32(k),
                            fan=8, rounds=11)
    # invariant: count{l >= lo} >= k at every round, and lo converges to
    # the kth-largest value from below
    return jnp.where(f >= lo, logits, NEG_INF)


def mask_top_p(logits: jnp.ndarray, p: float | jnp.ndarray) -> jnp.ndarray:
    """Nucleus filtering with the reference's semantics
    (modules_taste/sampler.py:60-68): keep the LARGEST set of top tokens
    whose total probability mass is <= p (the boundary token that would
    cross p is dropped), except the top-1 token, which is always kept.

    TPU-first implementation: instead of a full-vocab sort (the reference's
    torch.sort — ~1.2 ms/step at V=128k inside the AR decode loop), find
    the logit threshold tau such that mass{l >= tau} <= p is maximal via
    the wide-fan search (_refine_bracket; 14 rounds of fan 8 pin tau to
    ~9^14 = 2^44 of the initial bracket — past f32 ulp), so the kept set
    is IDENTICAL to the sort-based formulation whenever the two boundary
    logits differ by more than an ulp (always, for real logits)."""
    logits_f = logits.astype(jnp.float32)
    probs = jax.nn.softmax(logits_f, axis=-1)
    mx = jnp.max(logits_f, axis=-1, keepdims=True)
    # bracket over the FINITE logit range only: when callers (e.g. the
    # joint sampler's `banned` table) have already masked entries to
    # NEG_INF, a min() bracket of ~-1.7e38 could not be refined down to
    # the real logit window — the filter silently degenerated to greedy
    # (kept only the top-1 token)
    lo = jnp.min(jnp.where(logits_f > NEG_INF * 0.5, logits_f, mx),
                 axis=-1, keepdims=True)
    hi = mx  # mass{l >= mx} = p(top1); if > p the search never lowers hi
    #          and only the top-1 survives (reference keeps it explicitly)
    # prefix predicate: mass{l >= tau} > p (strict) -> hi converges to the
    # smallest tau with mass <= p, matching the sequential bisection
    _, hi = _refine_bracket(logits_f, probs, lo, hi, jnp.asarray(p),
                            fan=8, rounds=14, strict=True)
    keep = jnp.logical_or(logits_f >= hi, logits_f >= mx)
    return jnp.where(keep, logits, NEG_INF)


def sample(rng: jax.Array, logits: jnp.ndarray,
           temperature: float | jnp.ndarray = 1.0,
           top_k: Optional[int] = None,
           top_p: Optional[float | jnp.ndarray] = None,
           banned: Optional[jnp.ndarray] = None,
           forbid_eos: Optional[jnp.ndarray] = None,
           eos_id: Optional[int] = None) -> jnp.ndarray:
    """Categorical sample with optional filters.  logits [..., V] -> ids [...].

    `banned`: bool [V] or [..., V] mask of never-sample tokens.
    `forbid_eos`: bool [...] — when True, the eos_id logit is masked (the
    min-length EOS-rejection semantics of the reference decoders).
    """
    logits = logits.astype(jnp.float32)
    # Temperature BEFORE the masks: mask_top_k/mask_top_p detect masked
    # entries as `<= NEG_INF * 0.5`, and a temperature > 2 would shrink a
    # pre-scaled NEG_INF above that threshold, blowing the bisection
    # bracket.  Masking after scaling keeps masked entries at exactly
    # NEG_INF and is distribution-identical for the surviving tokens.
    logits = temperature_scale(logits, temperature)
    if banned is not None:
        logits = jnp.where(banned, NEG_INF, logits)
    if forbid_eos is not None and eos_id is not None:
        eos_mask = (jnp.arange(logits.shape[-1]) == eos_id) & forbid_eos[..., None]
        logits = jnp.where(eos_mask, NEG_INF, logits)
    if top_k is not None and top_k > 0:
        logits = mask_top_k(logits, top_k)
    if top_p is not None:
        logits = jax.lax.cond(
            jnp.asarray(top_p) > 0.0,
            lambda l: mask_top_p(l, top_p),
            lambda l: jnp.where(l >= jnp.max(l, axis=-1, keepdims=True), l, NEG_INF),
            logits)
    return jax.random.categorical(rng, logits, axis=-1)
