"""Sampling-op semantics tests (reference top-p behavior)."""

import numpy as np
import jax
import jax.numpy as jnp

from taste_spokenlm_tpu.ops.sampling import (apply_repetition_penalty,
                                             mask_top_k, mask_top_p)


def test_mask_top_p_reference_semantics():
    # probs: [0.5, 0.3, 0.15, 0.05] -> cumsum [0.5, 0.8, 0.95, 1.0]
    probs = np.array([0.5, 0.3, 0.15, 0.05])
    logits = jnp.asarray(np.log(probs), jnp.float32)
    # p=0.7: cumsum<=0.7 keeps only token 0 (reference removes the 0.8
    # boundary token rather than keeping it)
    out = np.asarray(mask_top_p(logits, 0.7))
    assert out[0] > -1e20 and (out[1:] < -1e20).all()
    # p=0.9: keeps tokens 0,1 (cumsum 0.5, 0.8 <= 0.9)
    out = np.asarray(mask_top_p(logits, 0.9))
    assert (out[:2] > -1e20).all() and (out[2:] < -1e20).all()
    # top-1 is always kept even for tiny p
    out = np.asarray(mask_top_p(logits, 0.01))
    assert out[0] > -1e20 and (out[1:] < -1e20).all()


def test_mask_top_k():
    logits = jnp.asarray([1.0, 5.0, 3.0, 2.0])
    out = np.asarray(mask_top_k(logits, 2))
    assert (out[[1, 2]] > -1e20).all() and (out[[0, 3]] < -1e20).all()


def test_repetition_penalty_directions():
    logits = jnp.asarray([2.0, -2.0, 1.0])
    counts = jnp.asarray([1, 1, 0])
    out = np.asarray(apply_repetition_penalty(logits, counts, 2.0))
    assert out[0] == 1.0      # positive seen: divided
    assert out[1] == -4.0     # negative seen: multiplied
    assert out[2] == 1.0      # unseen: untouched


def test_mask_top_p_with_banned_entries():
    """Regression: pre-masked NEG_INF entries (the joint sampler's banned
    table) must not blow the bisection bracket — p=0.9 over the finite
    probs must keep the same set as without any banned entries."""
    from taste_spokenlm_tpu.ops.sampling import NEG_INF
    probs = np.array([0.5, 0.3, 0.15, 0.05])
    logits = np.full(8, float(NEG_INF), np.float32)
    logits[:4] = np.log(probs)
    out = np.asarray(mask_top_p(jnp.asarray(logits), 0.9))
    assert (out[:2] > -1e20).all() and (out[2:] < -1e20).all(), out


def test_mask_top_k_matches_sort_based():
    """Bisected top-k must keep exactly the lax.top_k set, including with
    NEG_INF-masked entries and batch dims."""
    rng = np.random.RandomState(0)
    from taste_spokenlm_tpu.ops.sampling import NEG_INF
    for trial in range(5):
        logits = rng.randn(3, 257).astype(np.float32) * 5
        if trial % 2:
            logits[:, rng.randint(0, 257, 40)] = float(NEG_INF)
        for k in (1, 7, 25):
            out = np.asarray(mask_top_k(jnp.asarray(logits), k))
            kth = jax.lax.top_k(jnp.asarray(logits), k)[0][..., -1:]
            ref = np.asarray(jnp.where(jnp.asarray(logits) >= kth,
                                       jnp.asarray(logits), NEG_INF))
            np.testing.assert_array_equal(out > -1e20, ref > -1e20)


def test_mask_top_k_more_than_vocab():
    logits = jnp.asarray([1.0, 5.0, 3.0])
    out = np.asarray(mask_top_k(logits, 10))
    assert (out > -1e20).all()


def test_sample_high_temperature_keeps_filters():
    """Regression: `sample` must apply temperature BEFORE the ban/EOS
    masks — a temperature > 2 applied after masking shrank NEG_INF above
    the finite-range detection threshold, blowing the top-k/top-p
    bisection bracket (top-p silently degenerated to greedy and top-k was
    disabled)."""
    from taste_spokenlm_tpu.ops.sampling import sample
    V = 32
    logits = jnp.asarray(np.random.RandomState(0).randn(V), jnp.float32)
    banned = jnp.zeros((V,), bool).at[3].set(True)
    f = jax.jit(lambda k: sample(k, logits, temperature=3.0, top_p=0.9,
                                 top_k=8, banned=banned,
                                 forbid_eos=jnp.asarray(True), eos_id=V - 1))
    ids = {int(f(jax.random.PRNGKey(i))) for i in range(40)}
    assert len(ids) > 2, "top-p degenerated to greedy at high temperature"
    assert 3 not in ids and (V - 1) not in ids
    # and the kept set is still bounded by top_k
    assert len(ids) <= 8
