"""Parity tests: our flax Whisper vs HF transformers (random tiny weights).

This is the layer-wise golden-test strategy from SURVEY.md §7 step 2: load
converted HF weights and compare activations, since weight conversion from
HF checkpoints is a first-class feature of the framework.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from taste_spokenlm_tpu.config import WhisperConfig
from taste_spokenlm_tpu.models.whisper import WhisperEncoder, WhisperDecoder
from taste_spokenlm_tpu.utils import convert

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def hf_model():
    hf_cfg = transformers.WhisperConfig(
        vocab_size=500, d_model=64, encoder_layers=3, encoder_attention_heads=4,
        decoder_layers=2, decoder_attention_heads=4,
        encoder_ffn_dim=128, decoder_ffn_dim=128, num_mel_bins=80,
        max_source_positions=96, max_target_positions=64,
        attn_implementation="eager", pad_token_id=0,
    )
    torch.manual_seed(0)
    model = transformers.WhisperModel(hf_cfg).eval()
    cfg = WhisperConfig(
        vocab_size=500, d_model=64, encoder_layers=3, encoder_heads=4,
        decoder_layers=2, decoder_heads=4, ffn_dim=128, n_mels=80,
        max_source_positions=96, max_target_positions=64,
    )
    return model, cfg


def test_encoder_parity(hf_model):
    model, cfg = hf_model
    mel = np.random.RandomState(0).randn(2, 80, 192).astype(np.float32)

    with torch.no_grad():
        ref = model.encoder(torch.from_numpy(mel), output_hidden_states=True)

    params = convert.whisper_encoder_params(
        model.encoder.state_dict())
    enc = WhisperEncoder(cfg)
    out = enc.apply({"params": params}, jnp.asarray(mel), collect_layer=1)

    np.testing.assert_allclose(np.asarray(out["last_hidden"]),
                               ref.last_hidden_state.numpy(), atol=2e-4)
    # hidden_states[i] in HF = input to layer i, same convention as ours
    np.testing.assert_allclose(np.asarray(out["target_hidden"]),
                               ref.hidden_states[1].numpy(), atol=2e-4)


def test_decoder_parity_and_split_kv(hf_model):
    model, cfg = hf_model
    rng = np.random.RandomState(1)
    enc_hidden = rng.randn(2, 96, 64).astype(np.float32)
    ids = rng.randint(0, 500, size=(2, 10))

    with torch.no_grad():
        ref = model.decoder(
            input_ids=torch.from_numpy(ids),
            encoder_hidden_states=torch.from_numpy(enc_hidden),
        ).last_hidden_state.numpy()

    params = convert.whisper_decoder_params(model.decoder.state_dict())
    dec = WhisperDecoder(cfg)
    out, _ = dec.apply({"params": params}, jnp.asarray(ids),
                       jnp.asarray(enc_hidden))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)

    # split KV: with value_source == key_source it must equal the joint path
    out2, _ = dec.apply({"params": params}, jnp.asarray(ids),
                        jnp.asarray(enc_hidden), jnp.asarray(enc_hidden))
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out), atol=1e-6)

    # and with a different value source it must differ
    out3, _ = dec.apply({"params": params}, jnp.asarray(ids),
                        jnp.asarray(enc_hidden),
                        jnp.asarray(rng.randn(2, 96, 64).astype(np.float32)))
    assert np.abs(np.asarray(out3) - np.asarray(out)).max() > 1e-3


def test_decoder_kv_cache_decode_matches_full(hf_model):
    model, cfg = hf_model
    rng = np.random.RandomState(2)
    enc_hidden = jnp.asarray(rng.randn(1, 96, 64).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, 500, size=(1, 8)))

    params = convert.whisper_decoder_params(model.decoder.state_dict())
    dec = WhisperDecoder(cfg)
    full, _ = dec.apply({"params": params}, ids, enc_hidden)

    caches = dec.init_cache(1, 16)
    outs = []
    for t in range(8):
        step_out, caches = dec.apply(
            {"params": params}, ids[:, t:t + 1], enc_hidden,
            position_offset=t, caches=caches, cache_index=jnp.int32(t))
        outs.append(step_out)
    stepped = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(stepped), np.asarray(full), atol=2e-4)


def test_decoder_multi_token_cached_prefill_causal(hf_model):
    """Regression: >1-token cached prefill must equal the uncached forward."""
    model, cfg = hf_model
    rng = np.random.RandomState(6)
    enc = jnp.asarray(rng.randn(1, 96, 64).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, 500, size=(1, 5)))
    params = convert.whisper_decoder_params(model.decoder.state_dict())
    dec = WhisperDecoder(cfg)
    full, _ = dec.apply({"params": params}, ids, enc)
    caches = dec.init_cache(1, 8)
    pre, caches = dec.apply({"params": params}, ids, enc,
                            caches=caches, cache_index=jnp.int32(0))
    np.testing.assert_allclose(np.asarray(pre), np.asarray(full), atol=2e-4)
