"""Composite TasteForCausalLM tests: both training modes, extract_vq,
scoring, and the full reconstruction path (the milestone-B end-to-end slice:
mel -> taste -> S3 tokens -> waveform) at tiny scale."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from taste_spokenlm_tpu.config import TasteConfig
from taste_spokenlm_tpu.models.taste import TasteForCausalLM
from taste_spokenlm_tpu.ops.losses import IGNORE_ID


@pytest.fixture(scope="module")
def setup():
    cfg = TasteConfig.tiny()
    model = TasteForCausalLM(cfg)
    rng = np.random.RandomState(0)
    b, t_tok, t_sp = 2, 8, 12
    t_mel = cfg.audio_tower.whisper.max_source_positions * 2
    data = {
        "speaker_embeds": jnp.asarray(
            rng.randn(b, cfg.speech_decoder.spk_embed_dim), jnp.float32),
        "asr_token_ids": jnp.asarray(
            rng.randint(0, cfg.audio_tower.whisper.vocab_size, (b, t_tok))),
        "asr_token_lengths": jnp.asarray([8, 6]),
        "asr_word_ids": jnp.asarray([[0, 0, 1, 1, 2, 3, 3, 4],
                                     [0, 1, 1, 2, 3, 3, 0, 0]]),
        "audio_features": jnp.asarray(
            rng.randn(b, cfg.audio_tower.whisper.n_mels, t_mel), jnp.float32),
        "speech_token_ids": jnp.asarray(
            rng.randint(0, cfg.speech_decoder.speech_token_size, (b, t_sp))),
        "speech_token_lengths": jnp.asarray([12, 9]),
        "llm_token_ids": jnp.asarray(
            rng.randint(0, cfg.spoken_lm.llama.vocab_size, (b, 7))),
        "llm_token_lengths": jnp.asarray([7, 5]),
        "llm_word_ids": jnp.asarray([[0, 1, 1, 2, 3, 4, 4],
                                     [0, 0, 1, 2, 3, 0, 0]]),
    }
    variables = model.init(
        jax.random.PRNGKey(0), jax.random.PRNGKey(1), data["speaker_embeds"],
        data["asr_token_ids"], data["asr_token_lengths"],
        data["asr_word_ids"], data["audio_features"],
        data["speech_token_ids"], data["speech_token_lengths"],
        data["llm_token_ids"], data["llm_token_lengths"],
        data["llm_word_ids"], method=TasteForCausalLM.init_all)
    return cfg, model, variables, data


def test_stage1_forward(setup):
    cfg, model, variables, d = setup
    out = model.apply(
        variables, d["speaker_embeds"], d["asr_token_ids"],
        d["asr_token_lengths"], d["asr_word_ids"], d["audio_features"],
        d["speech_token_ids"], d["speech_token_lengths"],
        method=TasteForCausalLM.forward_speech_autoencoder)
    assert np.isfinite(float(out["loss"]))
    assert np.isfinite(float(out["commit_loss"]))
    assert out["quantized_indices"].shape == (2, 8, 4)


def test_extract_vq_word_alignment(setup):
    cfg, model, variables, d = setup
    asr_idx, llm_idx = model.apply(
        variables, d["asr_token_ids"], d["asr_token_lengths"],
        d["asr_word_ids"], d["llm_token_ids"], d["llm_token_lengths"],
        d["llm_word_ids"], d["audio_features"],
        method=TasteForCausalLM.extract_vq)
    a, l = np.asarray(asr_idx), np.asarray(llm_idx)
    # llm word starts carry the asr word-start taste; others are -1
    # sample 0: llm word ids [0,1,1,2,3,4,4]; word starts at 0,1,3,4,5
    # asr word starts (word_ids [0,0,1,1,2,3,3,4]) at 0,2,4,5,7
    np.testing.assert_array_equal(l[0, 0], a[0, 0])
    np.testing.assert_array_equal(l[0, 1], a[0, 2])
    assert (l[0, 2] == -1).all()
    np.testing.assert_array_equal(l[0, 3], a[0, 4])
    np.testing.assert_array_equal(l[0, 4], a[0, 5])
    np.testing.assert_array_equal(l[0, 5], a[0, 7])
    assert (l[0, 6] == -1).all()


def test_stage2_forward_with_speech_measurement(setup):
    cfg, model, variables, d = setup
    _, llm_idx = model.apply(
        variables, d["asr_token_ids"], d["asr_token_lengths"],
        d["asr_word_ids"], d["llm_token_ids"], d["llm_token_lengths"],
        d["llm_word_ids"], d["audio_features"],
        method=TasteForCausalLM.extract_vq)
    out = model.apply(
        variables, llm_idx, d["llm_token_ids"], d["llm_token_lengths"],
        d["llm_word_ids"], d["speaker_embeds"], d["asr_token_ids"],
        d["asr_token_lengths"], d["asr_word_ids"], d["speech_token_ids"],
        d["speech_token_lengths"],
        method=TasteForCausalLM.forward_spoken_llm)
    assert np.isfinite(float(out["loss"]))
    assert "speech_logits" in out
    assert 0.0 <= float(out["speech_token_accuracy"]) <= 1.0


def test_scoring(setup):
    cfg, model, variables, d = setup
    loss = model.apply(
        variables, d["asr_token_ids"], d["asr_token_lengths"],
        d["asr_word_ids"], d["llm_token_ids"], d["llm_token_lengths"],
        d["llm_word_ids"], d["audio_features"],
        method=TasteForCausalLM.scoring)
    assert np.isfinite(float(loss))


def test_end_to_end_reconstruction(setup):
    """Milestone B: mel -> tokenizer -> speech decoder -> flow -> vocoder."""
    cfg, model, variables, d = setup
    out = model.apply(
        variables, jax.random.PRNGKey(7), d["speaker_embeds"],
        d["asr_token_ids"], d["asr_token_lengths"], d["asr_word_ids"],
        d["audio_features"], max_speech_steps=8, mel_len_max=16,
        method=TasteForCausalLM.inference_reconstruction)
    wav = np.asarray(out["waveform"])
    assert wav.shape[0] == 2
    assert np.isfinite(wav).all()
    assert (np.asarray(out["speech_token_lengths"]) >= 0).all()
    # waveform is 64 samples per mel frame at tiny scale (4*4*4)
    assert wav.shape[1] == 16 * 64
