"""Golden parity: our split-KV WhisperDecoder vs the reference's customized
whisper (dict key/value separation) imported from /root/reference
(taste_speech/modules_taste/cosyvoice/customized_whisper.py:353-372 — the
TASTE modification that lets cross-attention take K and V from DIFFERENT
encoder streams, used by the joint encoder-segmenter's asr_attn_pooling).

Only the reference module's behavior is used, as a golden oracle.
"""

import importlib
import sys
import types

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from taste_spokenlm_tpu.config import WhisperConfig
from taste_spokenlm_tpu.models.whisper import WhisperDecoder
from taste_spokenlm_tpu.utils import convert

REF_COSY = "/root/reference/taste_speech/modules_taste/cosyvoice"


@pytest.fixture(scope="module")
def ref_whisper_mod():
    pkg = types.ModuleType("ref_cosyvoice")
    pkg.__path__ = [REF_COSY]
    sys.modules.setdefault("ref_cosyvoice", pkg)
    return importlib.import_module("ref_cosyvoice.customized_whisper")


@pytest.fixture(scope="module")
def pair(ref_whisper_mod):
    hf_cfg = transformers.WhisperConfig(
        vocab_size=300, d_model=32, encoder_layers=2,
        encoder_attention_heads=2, decoder_layers=2,
        decoder_attention_heads=2, encoder_ffn_dim=64, decoder_ffn_dim=64,
        num_mel_bins=16, max_source_positions=48, max_target_positions=32,
        attn_implementation="eager", pad_token_id=0, dropout=0.0,
    )
    torch.manual_seed(0)
    ref = ref_whisper_mod.WhisperDecoder(hf_cfg).eval()
    cfg = WhisperConfig(
        vocab_size=300, d_model=32, encoder_layers=2, encoder_heads=2,
        decoder_layers=2, decoder_heads=2, ffn_dim=64, n_mels=16,
        max_source_positions=48, max_target_positions=32,
    )
    params = convert.whisper_decoder_params(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()})
    ours = WhisperDecoder(cfg)
    return ref, ours, {"params": params}


def test_dict_kv_cross_attention_matches_reference(pair):
    """K from one stream, V from another — the customized dict path
    (customized_whisper.py:755,804,361-368)."""
    ref, ours, variables = pair
    rng = np.random.RandomState(5)
    b, tk, t = 2, 20, 7
    key_stream = rng.randn(b, tk, 32).astype(np.float32)
    val_stream = rng.randn(b, tk, 32).astype(np.float32)
    ids = rng.randint(0, 300, size=(b, t))

    with torch.no_grad():
        ref_out = ref(
            input_ids=torch.from_numpy(ids),
            encoder_hidden_states={
                "states_for_key": torch.from_numpy(key_stream),
                "states_for_val": torch.from_numpy(val_stream),
            },
        ).last_hidden_state.numpy()

    out, _ = ours.apply(variables, jnp.asarray(ids), jnp.asarray(key_stream),
                        jnp.asarray(val_stream))
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=1e-4)

    # sanity: plain (non-dict) path must also agree
    with torch.no_grad():
        ref_plain = ref(
            input_ids=torch.from_numpy(ids),
            encoder_hidden_states=torch.from_numpy(key_stream),
        ).last_hidden_state.numpy()
    out_plain, _ = ours.apply(variables, jnp.asarray(ids),
                              jnp.asarray(key_stream))
    np.testing.assert_allclose(np.asarray(out_plain), ref_plain, atol=1e-4)
    assert np.abs(ref_out - ref_plain).max() > 1e-3  # split KV actually bites


def test_dict_kv_cached_decode_matches_reference(pair):
    """Our KV-cached one-token decode trajectory == the reference dict-KV
    full forward row by row."""
    ref, ours, variables = pair
    rng = np.random.RandomState(6)
    b, tk, t = 1, 12, 6
    key_stream = rng.randn(b, tk, 32).astype(np.float32)
    val_stream = rng.randn(b, tk, 32).astype(np.float32)
    ids = rng.randint(0, 300, size=(b, t))

    with torch.no_grad():
        ref_out = ref(
            input_ids=torch.from_numpy(ids),
            encoder_hidden_states={
                "states_for_key": torch.from_numpy(key_stream),
                "states_for_val": torch.from_numpy(val_stream),
            },
        ).last_hidden_state.numpy()

    caches = ours.apply(variables, b, t, method=WhisperDecoder.init_cache)
    outs = []
    for i in range(t):
        y, caches = ours.apply(
            variables, jnp.asarray(ids[:, i:i + 1]), jnp.asarray(key_stream),
            jnp.asarray(val_stream), position_offset=i, caches=caches,
            cache_index=jnp.int32(i))
        outs.append(np.asarray(y)[:, 0])
    np.testing.assert_allclose(np.stack(outs, 1), ref_out, atol=1e-4)
