"""Tests: quantizer zoo, legacy alignment segmenter, whisper greedy ASR."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from taste_spokenlm_tpu.config import QuantizerConfig, WhisperConfig
from taste_spokenlm_tpu.models.quantizer import (KmeansQuantizer, NoQuantizer,
                                                 VectorQuantizer,
                                                 QUANTIZER_CLASSES)
from taste_spokenlm_tpu.models.whisper import WhisperForASR
from taste_spokenlm_tpu.ops.segment import alignment_mean_pool


def test_quantizer_zoo_registry():
    assert set(QUANTIZER_CLASSES) == {"rvq", "vq", "kmeans", "no"}


def test_plain_vq():
    cfg = QuantizerConfig.tiny().replace(dim=32)
    vq = VectorQuantizer(cfg)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 5, 32), jnp.float32)
    variables = vq.init(jax.random.PRNGKey(0), x)
    out = vq.apply(variables, x)
    assert out["quantized_indices"].shape == (2, 5, 1)
    assert out["quantized_feats"].shape == (2, 5, 32)


def test_kmeans_quantizer():
    q = KmeansQuantizer(codebook_size=8, dim=16)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 5, 16), jnp.float32)
    variables = q.init(jax.random.PRNGKey(0), x)
    out = q.apply(variables, x, jnp.ones((2, 5), bool))
    idx = np.asarray(out["quantized_indices"])
    assert idx.shape == (2, 5, 1)
    assert (idx >= 0).all() and (idx < 8).all()
    # quantized rows equal the selected codebook rows
    cb = np.asarray(variables["params"]["codebook"])
    np.testing.assert_allclose(np.asarray(out["quantized_feats"])[0, 0],
                               cb[idx[0, 0, 0]], atol=1e-6)


def test_no_quantizer_bottleneck():
    q = NoQuantizer(dim=16, codebook_dim=4)
    x = jnp.asarray(np.random.RandomState(2).randn(2, 5, 16), jnp.float32)
    variables = q.init(jax.random.PRNGKey(0), x)
    out = q.apply(variables, x)
    assert out["quantized_feats"].shape == (2, 5, 16)
    assert out["intermediate_hiddens"].shape == (2, 5, 4)
    assert "quantized_indices" not in out


def test_alignment_mean_pool():
    feats = jnp.asarray(np.arange(10, dtype=np.float32)[None, :, None]
                        .repeat(1, 0))  # [1, 10, 1] values 0..9
    # token 0 covers frames [0, 0.4] of 10 => 0..4; token 1 [0.5, 0.9] => 5..9
    alignments = jnp.asarray([[[0.0, 0.4], [0.5, 0.9]]])
    out = alignment_mean_pool(feats, jnp.asarray([10]), alignments,
                              jnp.asarray([2]))
    np.testing.assert_allclose(np.asarray(out)[0, :, 0], [2.0, 7.0], atol=1e-5)


def test_whisper_greedy_asr_decode():
    cfg = WhisperConfig.tiny()
    model = WhisperForASR(cfg)
    mel = jnp.asarray(np.random.RandomState(0).randn(2, cfg.n_mels, 192),
                      jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), mel, max_tokens=4)
    tokens, avg_lp = model.apply(variables, mel, max_tokens=8)
    t = np.asarray(tokens)
    assert t.shape == (2, 8)
    assert (t >= 0).all() and (t < cfg.vocab_size).all()
    # HF-pipeline decode semantics: suppress_tokens never sampled,
    # timestamp ids (>= timestamp_begin_id) never sampled
    non_eos = t[t != cfg.eos_token_id]
    for sid in cfg.suppress_ids:
        assert (non_eos != sid).all()
    assert (non_eos < cfg.timestamp_begin_id).all()
    assert np.isfinite(np.asarray(avg_lp)).all() and (np.asarray(avg_lp) <= 0).all()
    # deterministic (greedy)
    tokens2, _ = model.apply(variables, mel, max_tokens=8)
    np.testing.assert_array_equal(t, np.asarray(tokens2))
    # temperature sampling path is rng-driven but shape/vocab safe
    tokens3, _ = model.apply(variables, mel, max_tokens=8, temperature=0.8,
                             rng=jax.random.PRNGKey(4))
    t3 = np.asarray(tokens3)
    assert t3.shape == (2, 8) and (t3 >= 0).all() and (t3 < cfg.vocab_size).all()


def test_concat_fusion_speech_decoder():
    from taste_spokenlm_tpu.config import SpeechDecoderConfig
    from taste_spokenlm_tpu.models.speech_decoder import TasteSpeechDecoder
    import jax, jax.numpy as jnp
    for fuse_type in ("concat", "concat_with_sep"):
        cfg = SpeechDecoderConfig.tiny().replace(fuse_type=fuse_type)
        model = TasteSpeechDecoder(cfg)
        rng = np.random.RandomState(0)
        args = (jnp.asarray(rng.randn(2, cfg.spk_embed_dim), jnp.float32),
                jnp.asarray(rng.randn(2, 4, cfg.audio_encoder_input_size), jnp.float32),
                jnp.asarray([4, 3]),
                jnp.asarray(rng.randint(0, cfg.text_token_size, (2, 4))),
                jnp.asarray([4, 3]),
                jnp.asarray(rng.randint(0, cfg.speech_token_size, (2, 6))),
                jnp.asarray([6, 5]))
        variables = model.init(jax.random.PRNGKey(0), *args)
        out = model.apply(variables, *args)
        assert np.isfinite(float(out["loss"]))
        extra = 1 if fuse_type == "concat_with_sep" else 0
        # lm length = 3 + 2*T(+sep) + S
        assert out["logits"].shape[1] == 3 + 2 * 4 + extra + 6


def test_legacy_tower_alignment_mode():
    from taste_spokenlm_tpu.config import AudioTowerConfig
    from taste_spokenlm_tpu.models.audio_tower import TasteAudioTower
    import jax, jax.numpy as jnp
    cfg = AudioTowerConfig.tiny().replace(is_joint_encoder_segmenter=False,
                                          encoder_input_size=32)
    tower = TasteAudioTower(cfg.replace(
        quantizer=cfg.quantizer.replace(dim=32)))
    rng = np.random.RandomState(0)
    mel = jnp.asarray(rng.randn(1, cfg.whisper.n_mels, 192), jnp.float32)
    ids = jnp.asarray(rng.randint(0, 100, (1, 4)))
    lens = jnp.asarray([4])
    aligns = jnp.asarray([[[0.0, 0.2], [0.25, 0.5], [0.5, 0.7], [0.75, 1.0]]])
    variables = tower.init(jax.random.PRNGKey(0), mel, ids, lens, None,
                           asr_token_alignments=aligns)
    out = tower.apply(variables, mel, ids, lens, None,
                      asr_token_alignments=aligns)
    assert out["audio_unit_embeds"].shape == (1, 4, 32)
    assert bool(jnp.isfinite(out["audio_unit_embeds"]).all())
