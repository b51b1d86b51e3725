"""Golden parity: our TasteSpeechDecoder (taste -> S3 TTS LM) vs the
reference module imported from /root/reference (torch-CPU), on converted
weights at tiny scale.

Covers the full training forward — text/audio conformer encoding, fusion
(weighted_sum with and without the reference's pre-sum layer norm), the
ragged [sos|spk|fused|task|speech] packing, target construction, and the
length-normalized label-smoothing CE — against
/root/reference/taste_speech/modeling_taste.py:214-543.  The conformer
stacks themselves are covered by test_ref_parity_conformer; what this pins
is the composite packing/loss semantics.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from ref_compat import import_reference
from taste_spokenlm_tpu.config import EncoderStackConfig, SpeechDecoderConfig
from taste_spokenlm_tpu.models.speech_decoder import TasteSpeechDecoder
from taste_spokenlm_tpu.utils.convert import speech_decoder_params

ENC_IN = 16       # encoder_input_size
AUDIO_IN = 24     # audio_encoder_input_size (!= ENC_IN -> affine exists)
LLM_IN = 32
TEXT_VOCAB = 50
SPEECH_VOCAB = 40
SPK = 12


def _ref_enc_kwargs(num_blocks, input_layer="linear"):
    return {
        "attention_heads": 2, "linear_units": 32, "num_blocks": num_blocks,
        "dropout_rate": 0.0, "positional_dropout_rate": 0.0,
        "attention_dropout_rate": 0.0, "normalize_before": True,
        "input_layer": input_layer, "pos_enc_layer_type": "rel_pos_espnet",
        "selfattention_layer_type": "rel_selfattn", "use_cnn_module": False,
        "macaron_style": False, "use_dynamic_chunk": False,
        "use_dynamic_left_chunk": False, "static_chunk_size": 1,
    }


def _our_enc_cfg(num_blocks, input_size, input_layer="linear"):
    return EncoderStackConfig(
        output_size=LLM_IN, attention_heads=2, linear_units=32,
        num_blocks=num_blocks, dropout_rate=0.0, positional_dropout_rate=0.0,
        attention_dropout_rate=0.0, input_layer=input_layer,
        input_size=input_size, static_chunk_size=1)


def _build(normalize: bool):
    mt = import_reference("taste_speech.modeling_taste")
    torch.manual_seed(0)
    ref = mt.TasteSpeechDecoder(
        encoder_input_size=ENC_IN, audio_encoder_input_size=AUDIO_IN,
        llm_input_size=LLM_IN, llm_output_size=LLM_IN,
        text_token_size=TEXT_VOCAB, speech_token_size=SPEECH_VOCAB,
        spk_embed_dim=SPK, lsm_weight=0.0, length_normalized_loss=True,
        kwargs_cosyvoice_encoder=_ref_enc_kwargs(1),
        kwargs_cosyvoice_audio_token_encoder=_ref_enc_kwargs(1),
        kwargs_cosyvoice_llm={k: v for k, v in
                              _ref_enc_kwargs(2, "linear_legacy").items()
                              if not k.startswith(("use_", "normalize",
                                                   "macaron"))},
        fuse_encoded_audio_text_type="weighted_sum",
        fuse_encoded_audio_text_kwargs={
            "normalize": normalize, "use_layer_norm": False,
            "use_trainable_weight": True, "weight_init_type": "balance"},
    ).train()

    cfg = SpeechDecoderConfig(
        text_token_size=TEXT_VOCAB, speech_token_size=SPEECH_VOCAB,
        text_encoder_input_size=ENC_IN, audio_encoder_input_size=AUDIO_IN,
        llm_input_size=LLM_IN, llm_output_size=LLM_IN, spk_embed_dim=SPK,
        lsm_weight=0.0, length_normalized_loss=True,
        fuse_type="weighted_sum", fuse_normalize=normalize,
        text_encoder=_our_enc_cfg(1, ENC_IN),
        audio_encoder=_our_enc_cfg(1, ENC_IN),
        llm=_our_enc_cfg(2, LLM_IN, "linear_legacy"))
    ours = TasteSpeechDecoder(cfg)
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = speech_decoder_params(state, prefix="")
    return ref, ours, {"params": params}


def _batch(seed=1):
    rng = np.random.RandomState(seed)
    b, t, s = 2, 6, 7
    spk = rng.randn(b, SPK).astype(np.float32)
    audio = rng.randn(b, t, AUDIO_IN).astype(np.float32)
    asr = rng.randint(0, TEXT_VOCAB, (b, t))
    asr_len = np.asarray([t, t - 2], np.int32)
    speech = rng.randint(0, SPEECH_VOCAB, (b, s))
    speech_len = np.asarray([s, s - 3], np.int32)
    return spk, audio, asr, asr_len, speech, speech_len


@pytest.mark.parametrize("normalize", [False, True])
def test_forward_matches_reference(normalize):
    ref, ours, variables = _build(normalize)
    spk, audio, asr, asr_len, speech, speech_len = _batch()

    with torch.no_grad():
        out_ref = ref(
            torch.from_numpy(spk), torch.from_numpy(audio),
            torch.from_numpy(asr_len.astype(np.int64)),
            torch.from_numpy(asr.astype(np.int64)),
            torch.from_numpy(asr_len.astype(np.int64)),
            torch.from_numpy(speech.astype(np.int64)),
            torch.from_numpy(speech_len.astype(np.int64)))

    out = ours.apply(
        variables, jnp.asarray(spk), jnp.asarray(audio),
        jnp.asarray(asr_len), jnp.asarray(asr), jnp.asarray(asr_len),
        jnp.asarray(speech), jnp.asarray(speech_len))

    lm_len = 3 + asr_len + speech_len
    logits_ref = out_ref["logits"].numpy()
    labels_ref = out_ref["labels"].numpy()
    logits = np.asarray(out["logits"])
    labels = np.asarray(out["labels"])
    for i in range(len(lm_len)):
        n = lm_len[i]
        np.testing.assert_array_equal(labels[i, :n], labels_ref[i, :n],
                                      err_msg=f"row {i}")
        np.testing.assert_allclose(logits[i, :n], logits_ref[i, :n],
                                   atol=3e-4, err_msg=f"row {i}")
    np.testing.assert_allclose(float(out["loss"]),
                               float(out_ref["loss"]), atol=1e-4)
