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
