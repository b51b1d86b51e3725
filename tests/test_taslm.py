"""TASLM (earlier stage-2 SLM) tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from taste_spokenlm_tpu.models.quantizer import Codebook
from taste_spokenlm_tpu.models.taslm import TaslmConfig, TaslmForCausalLM
from taste_spokenlm_tpu.ops.losses import IGNORE_ID


@pytest.fixture(scope="module")
def setup():
    cfg = TaslmConfig.tiny()
    rng = np.random.RandomState(0)
    cb = Codebook(
        embed=jnp.asarray(rng.randn(4, cfg.speech_vocab_size, 16), jnp.float32),
        proj_kernel=jnp.asarray(rng.randn(16, cfg.speech_hidden_size) * 0.1,
                                jnp.float32),
        proj_bias=jnp.zeros((cfg.speech_hidden_size,), jnp.float32))
    b, t = 2, 10
    text = jnp.asarray(rng.randint(2, cfg.llama.vocab_size, (b, t)))
    speech = jnp.asarray(rng.randint(0, cfg.speech_vocab_size, (b, t, 4)))
    speech = speech.at[:, 0, :].set(cfg.speech_bos_id)  # bos row
    model = TaslmForCausalLM(cfg)
    variables = model.init(jax.random.PRNGKey(0), cb, text, speech)
    return cfg, model, variables, cb, text, speech


def test_forward_losses(setup):
    cfg, model, variables, cb, text, speech = setup
    tl = jnp.where(jnp.arange(10)[None, :] < 8, text, IGNORE_ID)
    sl = jnp.where((jnp.arange(10)[None, :, None] < 8), speech, IGNORE_ID)
    out = model.apply(variables, cb, text, speech, tl, sl,
                      jnp.asarray([10, 8]))
    assert np.isfinite(float(out["loss"]))
    assert "speech_layer_0_ce_loss" in out
    assert out["speech_logits"].shape == (2, 10, 4, cfg.speech_vocab_size)
    assert out["text_logits"].shape == (2, 10, cfg.llama.vocab_size)


def test_latent_sampling_variant(setup):
    cfg0, _, _, cb, text, speech = setup
    cfg = cfg0.replace(speech_token_adopt_latent_sampling=True,
                       latent_dim=cfg0.speech_hidden_size)
    model = TaslmForCausalLM(cfg)
    variables = model.init(jax.random.PRNGKey(1), cb, text, speech)
    sl = speech
    out = model.apply(variables, cb, text, speech, text, sl)
    assert np.isfinite(float(out["loss"]))
    assert "speech_latent_reg_loss" in out
    assert out["speech_y_pred"].shape[-1] == cfg.latent_dim


def test_bos_uses_special_embedding(setup):
    cfg, model, variables, cb, text, speech = setup
    emb = model.apply(variables, method=lambda m, cb_, s: m.embed_speech(cb_, s),
                      cb_=cb, s=speech)
    # bos rows (t=0) differ from an RVQ row with clipped ids
    clipped = jnp.clip(speech, 0, cfg.speech_vocab_size - 1)
    emb2 = model.apply(variables, method=lambda m, cb_, s: m.embed_speech(cb_, s),
                       cb_=cb, s=clipped)
    assert np.abs(np.asarray(emb[:, 0]) - np.asarray(emb2[:, 0])).max() > 1e-4
    np.testing.assert_allclose(np.asarray(emb[:, 1:]), np.asarray(emb2[:, 1:]),
                               atol=1e-6)


@pytest.mark.parametrize("method", ["addition", "gated", "weighted_sum"])
def test_fusion_variants(setup, method):
    cfg0, _, _, cb, text, speech = setup
    cfg = cfg0.replace(fusion_method=method)
    model = TaslmForCausalLM(cfg)
    variables = model.init(jax.random.PRNGKey(2), cb, text, speech)
    out = model.apply(variables, cb, text, speech, text, speech)
    assert np.isfinite(float(out["loss"]))


def test_generate_multichannel(setup):
    """Joint (text, speech) KV-cached decode: unconditional + conditional
    speech forcing (modeling_taslm.py:739-990)."""
    cfg, model, variables, cb, text, speech = setup
    out = model.apply(
        variables, jax.random.PRNGKey(0), cb, text[:1], speech[:1],
        jnp.int32(6), jnp.int32(6), max_steps=12,
        method=TaslmForCausalLM.generate)
    n = int(out["num_steps"])
    assert 0 < n <= 12
    toks = np.asarray(out["text_ids"])[:n]
    sp = np.asarray(out["speech_ids"])[:n]
    assert (toks >= 0).all() and (toks < cfg.llama.vocab_size).all()
    assert sp.shape[-1] == 4
    assert (sp >= 0).all() and (sp < cfg.speech_vocab_size).all()

    # conditional: the surplus speech ids (positions 6..9) are forced
    out_c = model.apply(
        variables, jax.random.PRNGKey(1), cb, text[:1], speech[:1],
        jnp.int32(6), jnp.int32(10), max_steps=12,
        method=TaslmForCausalLM.generate)
    sp_c = np.asarray(out_c["speech_ids"])
    np.testing.assert_array_equal(sp_c[:4], np.asarray(speech)[0, 6:10])


def test_generate_tts_single_channel():
    """TTS mode on a single-channel taslm: text forced from the prompt,
    speech head covers eos."""
    import dataclasses
    cfg = dataclasses.replace(TaslmConfig.tiny(), speech_num_channels=1)
    rng = np.random.RandomState(0)
    b, t = 1, 8
    text = jnp.asarray(rng.randint(2, cfg.llama.vocab_size, (b, t)))
    speech = jnp.full((b, 1), cfg.speech_bos_id, jnp.int32)
    model = TaslmForCausalLM(cfg)
    variables = model.init(jax.random.PRNGKey(0), None, text,
                           jnp.pad(speech, ((0, 0), (0, t - 1))))
    out = model.apply(
        variables, jax.random.PRNGKey(2), None, text, speech,
        jnp.int32(t), jnp.int32(1), max_steps=10, is_tts=True,
        method=TaslmForCausalLM.generate)
    n = int(out["num_steps"])
    assert 0 < n <= 10
    toks = np.asarray(out["text_ids"])[:n]
    # tts forces the text stream from the prompt (modeling_taslm.py:806-808)
    np.testing.assert_array_equal(toks[:min(n, t - 1)],
                                  np.asarray(text)[0, 1:1 + min(n, t - 1)])
    sp = np.asarray(out["speech_ids"])[:n]
    assert (sp >= 0).all() and (sp < cfg.speech_vocab_size + 2).all()
