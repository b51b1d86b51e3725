"""label_smoothing_ce golden parity vs the reference LabelSmoothingLoss
(STAGE1_TRAIN/CosyVoice/cosyvoice/transformer/label_smoothing_loss.py) —
the closed-form rewrite (no [B,T,V] one_hot temporaries) must stay exact."""

import sys

import numpy as np
import jax.numpy as jnp
import pytest

from taste_spokenlm_tpu.ops.losses import IGNORE_ID, label_smoothing_ce

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference/STAGE1_TRAIN/CosyVoice")


@pytest.mark.parametrize("smoothing", [0.0, 0.1])
@pytest.mark.parametrize("normalize_length", [True, False])
def test_label_smoothing_ce_matches_reference(smoothing, normalize_length):
    from cosyvoice.transformer.label_smoothing_loss import LabelSmoothingLoss

    rng = np.random.RandomState(0)
    B, T, V = 3, 17, 29
    logits = rng.randn(B, T, V).astype(np.float32) * 2.0
    targets = rng.randint(0, V, (B, T))
    targets[0, -5:] = IGNORE_ID
    targets[2, :3] = IGNORE_ID

    crit = LabelSmoothingLoss(V, IGNORE_ID, smoothing,
                              normalize_length=normalize_length)
    ref = crit(torch.tensor(logits), torch.tensor(targets)).item()
    got = float(label_smoothing_ce(
        jnp.asarray(logits), jnp.asarray(targets), smoothing=smoothing,
        normalize_length=normalize_length))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6)


def test_masked_log_likelihood_matches_reference_protocol():
    """masked_log_likelihood vs a direct numpy statement of the reference
    scorer (modeling_taslm.py:342-352): boolean-mask the valid labels,
    score, then score again with the valid-label sequence flipped."""
    import jax
    rng = np.random.RandomState(0)
    t, v = 17, 11
    logits = rng.randn(1, t, v).astype(np.float32)
    labels = rng.randint(0, v, (1, t)).astype(np.int32)
    labels[0, [2, 5, 11, 16]] = -1
    from taste_spokenlm_tpu.ops.losses import masked_log_likelihood
    ll, rll = jax.jit(masked_log_likelihood)(jnp.asarray(logits),
                                             jnp.asarray(labels))

    logp = np.log(np.exp(logits) /
                  np.exp(logits).sum(-1, keepdims=True))[0]
    valid = labels[0] != -1
    lab = labels[0][valid]
    lp = logp[valid]
    ref_ll = np.mean(lp[np.arange(len(lab)), lab])
    ref_rll = np.mean(lp[np.arange(len(lab)), lab[::-1]])
    np.testing.assert_allclose(float(ll), ref_ll, rtol=1e-5)
    np.testing.assert_allclose(float(rll), ref_rll, rtol=1e-5)

    # head_size masks labels beyond the head (multi-channel speech path)
    labels2 = labels.copy()
    labels2[0, 0] = v + 3
    pad = np.pad(logits, ((0, 0), (0, 0), (0, 4)), constant_values=-30.0)
    ll2, rll2 = masked_log_likelihood(jnp.asarray(pad[..., :v]),
                                      jnp.asarray(labels2), head_size=v)
    valid2 = (labels2[0] != -1) & (labels2[0] < v)
    lab2 = labels2[0][valid2]
    lp2 = logp[valid2]
    np.testing.assert_allclose(
        float(ll2), np.mean(lp2[np.arange(len(lab2)), lab2]), rtol=1e-5)
