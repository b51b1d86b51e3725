"""Bridge zoo tests: every fusion/extract class in
/root/reference/taste_speech/modules_taste/bridge.py:42-490 has a JAX
counterpart with matching semantics."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from taste_spokenlm_tpu.config import SpokenLMConfig
from taste_spokenlm_tpu.models.bridges import (
    BRIDGE_EXTRACT_CLASSES, BRIDGE_FUSION_CLASSES, AdaptedFFN,
    ContinueWeightedLayerExtract, LinearAllConcatExtract, ReferenceMixExtract,
    ReferenceMixFusion, SimpleSumFusion, WeightedSumFusion)
from taste_spokenlm_tpu.models.quantizer import Codebook
from taste_spokenlm_tpu.models.spoken_lm import TasteSpokenLM

B, T, LLM_DIM, AUDIO_DIM = 2, 5, 24, 16
K, D, L = 32, 16, 4


def _codebook(seed=0, audio_dim=AUDIO_DIM):
    rng = np.random.RandomState(seed)
    return Codebook(
        embed=jnp.asarray(rng.randn(L, K, D), jnp.float32),
        proj_kernel=jnp.asarray(rng.randn(D, audio_dim) * 0.1, jnp.float32),
        proj_bias=jnp.zeros((audio_dim,), jnp.float32),
    )


@pytest.fixture(scope="module")
def embeds():
    rng = np.random.RandomState(0)
    text = jnp.asarray(rng.randn(B, T, LLM_DIM), jnp.float32)
    audio = jnp.asarray(rng.randn(B, T, AUDIO_DIM), jnp.float32)
    return text, audio


def test_registry_names_match_reference():
    # bridge.py:474-490
    assert set(BRIDGE_FUSION_CLASSES) == {
        "weighted_sum", "reference_mix", "simple_sum"}
    assert set(BRIDGE_EXTRACT_CLASSES) == {
        "linear_last", "linear_all_concat", "reference_mix",
        "weighted_layer", "continue_weighted_layer",
        "continue_latent_weighted_layer", "continue_latent_linear_last",
        "multi_linear_last"}


def test_weighted_sum_fusion_zero_audio_init(embeds):
    text, audio = embeds
    m = WeightedSumFusion(llm_dim=LLM_DIM)
    variables = m.init(jax.random.PRNGKey(0), text, audio)
    out = m.apply(variables, text, audio)
    assert out.shape == text.shape
    # softmax([-2, 2]) puts ~0.982 on text: output starts close to text.
    w = jax.nn.softmax(jnp.asarray([-2.0, 2.0]))
    proj = np.asarray(m.apply(variables, jnp.zeros_like(text), audio))
    expect = float(w[1]) * np.asarray(text) + proj
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-5)


def test_simple_sum_fusion_starts_as_identity(embeds):
    text, audio = embeds
    m = SimpleSumFusion(llm_dim=LLM_DIM)
    variables = m.init(jax.random.PRNGKey(0), text, audio)
    np.testing.assert_allclose(np.asarray(m.apply(variables, text, audio)),
                               np.asarray(text), atol=1e-6)


def test_adapted_ffn_matches_manual(embeds):
    text, audio = embeds
    m = AdaptedFFN(based_dim=LLM_DIM, num_layers=3)
    variables = m.init(jax.random.PRNGKey(0), text, audio)
    out = np.asarray(m.apply(variables, text, audio))
    p = variables["params"]

    def dense(x, pp):
        return x @ np.asarray(pp["kernel"]) + np.asarray(pp["bias"])

    h = np.concatenate([np.asarray(text), np.asarray(audio)], axis=-1)
    for i in range(3):
        h = dense(h, p[f"mix_layers_{i}"])
    gate = 1.0 / (1.0 + np.exp(-h))
    expect = np.asarray(text) + gate * dense(np.asarray(audio), p["value_linear"])
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-5)


def test_reference_mix_fusion_shape(embeds):
    text, audio = embeds
    m = ReferenceMixFusion(llm_dim=LLM_DIM, num_layers=3)
    variables = m.init(jax.random.PRNGKey(0), text, audio)
    out = m.apply(variables, text, audio)
    assert out.shape == text.shape
    assert np.isfinite(np.asarray(out)).all()
    # 3 stacked AdaptedFFN blocks, torch-style names for the converter
    assert set(variables["params"]) == {"layers_0", "layers_1", "layers_2"}


def test_linear_all_concat_extract(embeds):
    text, _ = embeds
    hidden_states = [text, text * 0.5, text + 1.0]
    m = LinearAllConcatExtract(k=K, l=L)
    variables = m.init(jax.random.PRNGKey(0), text, hidden_states)
    logits, info = m.apply(variables, text, hidden_states)
    assert logits.shape == (B, T, L, K)
    assert info == {}


def test_continue_weighted_layer_extract(embeds):
    text, _ = embeds
    hidden_states = [text, text * 0.5, text + 1.0]
    cb = _codebook()
    m = ContinueWeightedLayerExtract(k=K, d=D, num_layers=3)
    variables = m.init(jax.random.PRNGKey(0), text, hidden_states, cb)
    logits, _ = m.apply(variables, text, hidden_states, cb)
    assert logits.shape == (B, T, L, K)
    arr = np.asarray(logits)
    # scaled one-hot of the nearest-codebook indices (bridge.py:257-258)
    assert set(np.unique(arr)) <= {0.0, 1000.0}
    assert (arr.sum(axis=-1) == 1000.0).all()


def test_reference_mix_extract(embeds):
    text, audio = embeds
    m = ReferenceMixExtract(audio_dim=AUDIO_DIM, num_layers=2)
    variables = m.init(jax.random.PRNGKey(0), text, audio_embeds=audio)
    out, info = m.apply(variables, text, audio_embeds=audio)
    assert out.shape == audio.shape
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("out_mod", ["linear_all_concat",
                                     "continue_weighted_layer",
                                     "weighted_layer"])
def test_spoken_lm_with_alternate_extracts(out_mod):
    cfg = dataclasses.replace(SpokenLMConfig.tiny(), out_llm_module=out_mod)
    model = TasteSpokenLM(cfg, audio_dim=AUDIO_DIM, taste_k=K, taste_d=D,
                          taste_l=L)
    cb = _codebook()
    rng = np.random.RandomState(0)
    b, t = 2, 6
    ids = jnp.asarray(rng.randint(0, cfg.llama.vocab_size, (b, t)))
    word_ids = jnp.asarray([[0, 0, 1, 2, 2, 3], [0, 1, 1, 2, 0, 0]])
    lens = jnp.asarray([6, 4])
    indices = jnp.asarray(rng.randint(0, K, (b, t, L)))
    variables = model.init(jax.random.PRNGKey(0), cb, indices, ids, lens,
                           word_ids)
    out = model.apply(variables, cb, indices, ids, lens, word_ids)
    assert np.isfinite(float(out["loss"]))


def test_spoken_lm_with_reference_mix_fusion():
    cfg = dataclasses.replace(SpokenLMConfig.tiny(),
                              in_llm_module="reference_mix")
    model = TasteSpokenLM(cfg, audio_dim=AUDIO_DIM, taste_k=K, taste_d=D,
                          taste_l=L)
    cb = _codebook()
    rng = np.random.RandomState(0)
    b, t = 2, 6
    ids = jnp.asarray(rng.randint(0, cfg.llama.vocab_size, (b, t)))
    word_ids = jnp.asarray([[0, 0, 1, 2, 2, 3], [0, 1, 1, 2, 0, 0]])
    lens = jnp.asarray([6, 4])
    indices = jnp.asarray(rng.randint(0, K, (b, t, L)))
    variables = model.init(jax.random.PRNGKey(0), cb, indices, ids, lens,
                           word_ids)
    out = model.apply(variables, cb, indices, ids, lens, word_ids)
    assert np.isfinite(float(out["loss"]))
