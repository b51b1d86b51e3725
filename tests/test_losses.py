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
