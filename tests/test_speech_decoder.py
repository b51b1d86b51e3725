"""Speech decoder tests: packing, loss targets, causal LM, AR generation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from taste_spokenlm_tpu.config import SpeechDecoderConfig
from taste_spokenlm_tpu.models.speech_decoder import TasteSpeechDecoder
from taste_spokenlm_tpu.ops.losses import IGNORE_ID
from taste_spokenlm_tpu.ops.segment import ragged_concat


def test_ragged_concat_floats_and_ids():
    b = 2
    a = jnp.arange(b * 3 * 2, dtype=jnp.float32).reshape(b, 3, 2)
    c = 100 + jnp.arange(b * 2 * 2, dtype=jnp.float32).reshape(b, 2, 2)
    packed, total = ragged_concat([(a, jnp.asarray([3, 1])), (c, None)], 6)
    assert packed.shape == (2, 6, 2)
    assert np.asarray(total).tolist() == [5, 3]
    np.testing.assert_allclose(np.asarray(packed[0, :3]), np.asarray(a[0]))
    np.testing.assert_allclose(np.asarray(packed[0, 3:5]), np.asarray(c[0]))
    np.testing.assert_allclose(np.asarray(packed[0, 5:]), 0.0)
    np.testing.assert_allclose(np.asarray(packed[1, 0]), np.asarray(a[1, 0]))
    np.testing.assert_allclose(np.asarray(packed[1, 1:3]), np.asarray(c[1]))
    np.testing.assert_allclose(np.asarray(packed[1, 3:]), 0.0)

    ids, total2 = ragged_concat(
        [(jnp.asarray([[7, 8, 9], [7, 8, 9]]), jnp.asarray([2, 3])),
         (jnp.asarray([[5], [5]]), None)], 5, pad_value=IGNORE_ID)
    assert np.asarray(ids).tolist() == [[7, 8, 5, -1, -1], [7, 8, 9, 5, -1]]


@pytest.fixture(scope="module")
def setup():
    cfg = SpeechDecoderConfig.tiny()
    model = TasteSpeechDecoder(cfg)
    rng = np.random.RandomState(0)
    b, t, s = 2, 6, 10
    spk = jnp.asarray(rng.randn(b, cfg.spk_embed_dim), jnp.float32)
    audio = jnp.asarray(rng.randn(b, t, cfg.audio_encoder_input_size), jnp.float32)
    asr_ids = jnp.asarray(rng.randint(0, cfg.text_token_size, (b, t)))
    asr_lens = jnp.asarray([6, 4])
    sp_ids = jnp.asarray(rng.randint(0, cfg.speech_token_size, (b, s)))
    sp_lens = jnp.asarray([10, 7])
    args = (spk, audio, asr_lens, asr_ids, asr_lens, sp_ids, sp_lens)
    variables = model.init(jax.random.PRNGKey(0), *args)
    return cfg, model, variables, args


def test_forward_loss_and_targets(setup):
    cfg, model, variables, args = setup
    out = model.apply(variables, *args)
    b, t, s = 2, 6, 10
    assert out["logits"].shape == (b, 3 + t + s, cfg.speech_token_size + 1)
    assert np.isfinite(float(out["loss"]))
    labels = np.asarray(out["labels"])
    # sample 0: ignore 2+6, then 10 speech ids, then eos
    assert (labels[0, :8] == IGNORE_ID).all()
    assert labels[0, 18] == cfg.speech_token_size
    # sample 1: ignore 2+4, 7 speech, eos, rest ignored
    assert (labels[1, :6] == IGNORE_ID).all()
    assert labels[1, 13] == cfg.speech_token_size
    assert (labels[1, 14:] == IGNORE_ID).all()
    assert 0.0 <= float(out["speech_token_accuracy"]) <= 1.0


def test_loss_drops_when_fitting_single_batch(setup):
    """Few Adam steps on one batch must reduce the CE loss (learning sanity)."""
    import optax
    cfg, model, variables, args = setup
    tx = optax.adam(3e-3)
    params = variables["params"]
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            return model.apply({"params": p}, *args)["loss"]
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(8):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9, losses


def test_generate_shapes_and_eos(setup):
    cfg, model, variables, args = setup
    spk, audio, alens, ids, lens, _, _ = args
    out = model.apply(variables, jax.random.PRNGKey(1), spk, audio, alens,
                      ids, lens, 32, method=TasteSpeechDecoder.generate)
    toks = np.asarray(out["speech_token_ids"])
    lengths = np.asarray(out["speech_token_lengths"])
    assert toks.shape == (2, 32)
    for bi in range(2):
        n = lengths[bi]
        assert (toks[bi, :n] >= 0).all() and (toks[bi, :n] < cfg.speech_token_size).all()
        assert (toks[bi, n:] == -1).all()
        # min length: 2x prefix (prefix_len = 3 + asr_len)
        assert n >= min(2 * (3 + int(np.asarray(lens)[bi])), 32) or n == 32


def test_generate_is_deterministic_given_rng(setup):
    cfg, model, variables, args = setup
    spk, audio, alens, ids, lens, _, _ = args
    o1 = model.apply(variables, jax.random.PRNGKey(5), spk, audio, alens, ids,
                     lens, 16, method=TasteSpeechDecoder.generate)
    o2 = model.apply(variables, jax.random.PRNGKey(5), spk, audio, alens, ids,
                     lens, 16, method=TasteSpeechDecoder.generate)
    np.testing.assert_array_equal(np.asarray(o1["speech_token_ids"]),
                                  np.asarray(o2["speech_token_ids"]))
