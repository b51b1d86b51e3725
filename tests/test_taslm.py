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


def test_generate_cached_matches_uncached(setup):
    """The KV-cached dual-stream decode must match an uncached replay that
    re-runs the full forward over the growing sequence each step with
    identical rng splits (catches rope/position bookkeeping bugs in the
    cached path)."""
    from taste_spokenlm_tpu.ops.sampling import mask_top_p

    cfg, model, variables, cb, text, speech = setup
    tt = text.shape[1]
    cond_len = 8
    max_steps = 8
    temperature, text_top_p, speech_top_p = 1.0, 0.9, 0.3
    out = model.apply(
        variables, jax.random.PRNGKey(5), cb, text[:1], speech[:1],
        jnp.int32(cond_len), jnp.int32(cond_len), max_steps=max_steps,
        text_top_p=text_top_p, speech_top_p=speech_top_p,
        method=TaslmForCausalLM.generate)

    # ---- uncached replay (unconditional mode: n_forced == 0) ----
    def fuse(m, t_ids, s_ids):
        return m.fusion_layer(
            m.language_model.embed_tokens(t_ids).astype(m.dtype),
            m.embed_speech(cb, s_ids))

    def lm_last(m, e):
        o = m.language_model(inputs_embeds=e)
        h = o["last_hidden"][0, -1]
        tl = m.language_model.logits(h[None, None])[0, 0]
        head = m.speech_head(h[None, None]).reshape(
            cfg.speech_num_channels, m.speech_head_size)
        return tl, head

    fused0 = model.apply(variables, text[:1], speech[:1, :tt], method=fuse)
    embeds = fused0[0, :cond_len]
    key = jax.random.PRNGKey(5)
    terminate_id = cfg.llama.eos_token_id
    forced_text_id = -1
    rep_tok, rep_cnt = -1, 0
    texts, speeches = [], []
    for step in range(max_steps):
        tl, head = model.apply(variables, embeds[None], method=lm_last)
        key, r_text, r_speech = jax.random.split(key, 3)
        filt = mask_top_p(tl.astype(jnp.float32) / temperature, text_top_p)
        text_id = int(jax.random.categorical(r_text, filt))
        if forced_text_id >= 0:
            text_id = forced_text_id
        elif text_id == terminate_id:
            forced_text_id = terminate_id
        filt_sp = mask_top_p(head.astype(jnp.float32) / temperature,
                             speech_top_p)
        sp_ids = np.asarray(
            jax.random.categorical(r_speech, filt_sp, axis=-1), np.int32)
        texts.append(text_id)
        speeches.append(sp_ids)
        sp0 = int(sp_ids[0])
        rep_cnt = rep_cnt + 1 if sp0 == rep_tok else 0
        rep_tok = sp0
        stop = sp0 == cfg.speech_eos_id or rep_cnt > 5
        step_embed = model.apply(
            variables, jnp.asarray([[text_id]]), jnp.asarray(sp_ids)[None, None],
            method=fuse)
        embeds = jnp.concatenate([embeds, step_embed[0]], axis=0)
        if stop:
            break

    n = int(out["num_steps"])
    assert n == len(texts), (n, texts)
    assert np.asarray(out["text_ids"])[:n].tolist() == texts
    np.testing.assert_array_equal(np.asarray(out["speech_ids"])[:n],
                                  np.stack(speeches))


def test_in_graph_ref_kl(setup):
    """compute_ref_kl runs the adapter-disabled backbone over the PURE text
    embeddings in-graph (modeling_taslm.py:599-629) and must equal passing
    the same logits precomputed."""
    import dataclasses
    cfg0, _, _, cb, text, speech = setup
    cfg = dataclasses.replace(cfg0, text_conduct_kl_loss=True)
    model = TaslmForCausalLM(cfg)
    variables = model.init(jax.random.PRNGKey(3), cb, text, speech)
    tl = jnp.where(jnp.arange(10)[None, :] < 8, text, IGNORE_ID)

    def base_fwd(m, ids):
        o = m.language_model(
            inputs_embeds=m.language_model.embed_tokens(ids).astype(m.dtype),
            disable_lora=True)
        return m.language_model.logits(o["last_hidden"])

    ref_logits = model.apply(variables, text, method=base_fwd)
    out_in = model.apply(variables, cb, text, speech, tl, speech,
                         compute_ref_kl=True)
    out_pre = model.apply(variables, cb, text, speech, tl, speech,
                          ref_logits=ref_logits)
    assert np.isfinite(float(out_in["text_kl_loss"]))
    np.testing.assert_allclose(float(out_in["text_kl_loss"]),
                               float(out_pre["text_kl_loss"]), rtol=1e-6)
    np.testing.assert_allclose(float(out_in["loss"]), float(out_pre["loss"]),
                               rtol=1e-6)


def test_calculate_log_likelihood_protocol(setup):
    """calculate_log_likelihood mirrors the reference selection protocol
    (modeling_taslm.py:324-377): text + per-channel speech mean LL with
    flipped-labels controls, cross-checked against numpy on the model's
    own logits."""
    cfg, model, variables, cb, text, speech = setup
    tl = jnp.where(jnp.arange(10)[None, :] < 8, text, IGNORE_ID)
    sl = jnp.where((jnp.arange(10)[None, :, None] < 8), speech, IGNORE_ID)
    res = model.apply(variables, cb, text, speech, tl, sl,
                      jnp.asarray([10, 10]),
                      method=TaslmForCausalLM.calculate_log_likelihood)
    keys = {"text_log_likelihood", "reversed_text_log_likelihood"}
    for c in range(cfg.speech_num_channels):
        keys |= {f"speech_log_likelihood.{c}",
                 f"reversed_speech_log_likelihood.{c}"}
    assert set(res) == keys
    for k, v in res.items():
        assert np.isfinite(float(v)), (k, v)

    # numpy cross-check of the text score from the same forward
    out = model.apply(variables, cb, text, speech,
                      attention_lengths=jnp.asarray([10, 10]))
    logits = np.asarray(out["text_logits"], np.float64)[:, :-1]
    labels = np.asarray(tl)[:, 1:]
    logp = logits - np.log(np.exp(logits - logits.max(-1, keepdims=True)
                                  ).sum(-1, keepdims=True)) \
        - logits.max(-1, keepdims=True)
    flat_lab = labels.reshape(-1)
    flat_lp = logp.reshape(-1, logp.shape[-1])
    valid = flat_lab != IGNORE_ID
    lab = flat_lab[valid]
    lp = flat_lp[valid]
    np.testing.assert_allclose(
        float(res["text_log_likelihood"]),
        np.mean(lp[np.arange(len(lab)), lab]), rtol=2e-4)
    np.testing.assert_allclose(
        float(res["reversed_text_log_likelihood"]),
        np.mean(lp[np.arange(len(lab)), lab[::-1]]), rtol=2e-4)
