"""Golden parity: our TasteAudioTower (the TASTE tokenizer) vs the reference
imported from /root/reference (torch-CPU), end to end on converted weights:

  whisper encoder (all-hidden collect) -> asr_attn_pooling split-KV decoder
  aggregation -> prompt/eos framing -> skip_prefix -> word-level subword
  averaging -> RVQ quantization

against /root/reference/taste_speech/modeling_taste.py:33-211 +
modules_taste/audio_joint_encoder_segmenter.py:25-512, configured like the
shipped TASTE-V0 (forward_type=asr_attn_pooling, is_word_level,
skip_prefix_idx=4, make_v_proj_identity) at tiny scale.

A tiny customized-whisper checkpoint is saved to a tmp dir so the reference
tower can construct itself through its own from_pretrained path; the
HF processor/tokenizer loaders (audio-file frontends only — unused in the
forward) are stubbed.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from ref_compat import import_reference
from taste_spokenlm_tpu.config import (AudioTowerConfig, QuantizerConfig,
                                       WhisperConfig)
from taste_spokenlm_tpu.models.audio_tower import TasteAudioTower
from taste_spokenlm_tpu.utils.convert import audio_tower_params, rvq_state

D = 32            # d_model
MELS = 16
ENC_LAYERS = 3
TARGET_LAYER = 2
SRC_POS = 60      # -> mel frames = 120
VOCAB = 50366     # covers the hard-coded whisper prompt ids
PROMPT = (50258, 50259, 50360, 50364)
EOS = 50257
Q, K, CDIM = 2, 16, 8


class _FeatureExtractorStub:
    hop_length = 160
    nb_max_frames = 3000


class _ProcessorStub:
    feature_extractor = _FeatureExtractorStub()

    @classmethod
    def from_pretrained(cls, *a, **k):
        return cls()


@pytest.fixture(scope="module")
def tower_pair(tmp_path_factory):
    mt = import_reference("taste_speech.modeling_taste")
    ajes = import_reference(
        "taste_speech.modules_taste.audio_joint_encoder_segmenter")
    from transformers import WhisperConfig as HFWhisperConfig

    ajes.WhisperProcessor = _ProcessorStub
    ajes.WhisperTokenizer = _ProcessorStub

    torch.manual_seed(0)
    hf_cfg = HFWhisperConfig(
        vocab_size=VOCAB, num_mel_bins=MELS, d_model=D,
        encoder_layers=ENC_LAYERS, encoder_attention_heads=2,
        decoder_layers=2, decoder_attention_heads=2,
        encoder_ffn_dim=48, decoder_ffn_dim=48,
        max_source_positions=SRC_POS, max_target_positions=32,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0)
    cw = import_reference(
        "taste_speech.modules_taste.cosyvoice.customized_whisper")
    tiny_whisper = cw.WhisperModel(hf_cfg)
    ckpt_dir = tmp_path_factory.mktemp("tiny_whisper")
    tiny_whisper.save_pretrained(ckpt_dir, safe_serialization=True)

    ref = mt.TasteAudioTower(
        audio_embed_dim=D,
        is_joint_encoder_segmenter=True,
        kwargs_for_joint_encoder_segmenter=dict(
            model_name_or_path=str(ckpt_dir), target_hidden_layer=TARGET_LAYER,
            forward_type="asr_attn_pooling", make_v_proj_identity=True,
            is_word_level=True, skip_prefix_idx=4, dtype="float32"),
        kwargs_for_quantizer=dict(
            quantizer_class="rvq", dim=D, num_quantizers=Q, codebook_dim=CDIM,
            codebook_size=K, kmeans_init=False, decay=0.9,
            quantize_dropout=False, threshold_ema_dead_code=0,
            commitment_weight=1.0, sample_codebook_temp=0.0),
    ).eval()

    cfg = AudioTowerConfig(
        whisper=WhisperConfig(
            vocab_size=VOCAB, d_model=D, encoder_layers=ENC_LAYERS,
            encoder_heads=2, decoder_layers=2, decoder_heads=2, ffn_dim=48,
            n_mels=MELS, max_source_positions=SRC_POS,
            max_target_positions=32, decoder_prompt=PROMPT, eos_token_id=EOS),
        quantizer=QuantizerConfig(
            dim=D, codebook_dim=CDIM, codebook_size=K, num_quantizers=Q,
            decay=0.9, kmeans_init=False, threshold_ema_dead_code=0,
            quantize_dropout=False, commitment_weight=1.0),
        quantization_on=True, audio_embed_dim=D, text_token_size=VOCAB,
        encoder_target_hidden_layer=TARGET_LAYER, skip_prefix_idx=4,
        is_word_level=True, fuse_forward_type="asr_attn_pooling",
        make_v_proj_identity=True)
    ours = TasteAudioTower(cfg)

    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = audio_tower_params(state, prefix="")
    vq_params, vq_quant = rvq_state(state, prefix="vq.rvq.")
    if vq_params:
        params["vq"] = vq_params
    variables = {"params": params, "quantizer": {"vq": vq_quant}}
    return ref, ours, variables


def test_audio_tower_matches_reference(tower_pair):
    ref, ours, variables = tower_pair
    rng = np.random.RandomState(1)
    b, t = 2, 6
    mel_frames = SRC_POS * 2
    mel = rng.randn(b, mel_frames, MELS).astype(np.float32)   # ref: (B,T,C)
    asr = rng.randint(10, 40000, (b, t))
    asr_len = np.asarray([t, t - 2], np.int32)
    asr[1, t - 2:] = EOS    # ragged rows padded with eos, as in the data prep
    # subword->word grouping: row0 two multi-subword words, row1 one;
    # eos/pad slots get fresh ids so no group crosses the valid boundary
    word_ids = np.asarray([[0, 0, 1, 1, 1, 2],
                           [0, 1, 1, 2, 3, 4]], np.int32)
    # reference word_ids rows must cover the +eos slot too
    word_ids_ref = np.concatenate(
        [word_ids, np.asarray([[7], [8]], np.int32)], axis=1)
    feat_len = np.asarray([mel_frames, mel_frames], np.int32)

    with torch.no_grad():
        out_ref = ref(
            torch.from_numpy(asr.astype(np.int64)),
            torch.from_numpy(asr_len.astype(np.int64)),
            torch.from_numpy(mel),
            torch.from_numpy(feat_len.astype(np.int64)),
            asr_word_ids=torch.from_numpy(word_ids_ref.astype(np.int64)))

    out = ours.apply(
        variables, jnp.asarray(mel.transpose(0, 2, 1)), jnp.asarray(asr),
        jnp.asarray(asr_len), jnp.asarray(word_ids))

    np.testing.assert_array_equal(np.asarray(out["audio_unit_lengths"]),
                                  out_ref["audio_unit_lengths"].numpy())
    embeds_ref = out_ref["audio_unit_embeds"].numpy()
    idx_ref = out_ref["quantized_indices"].numpy()
    embeds = np.asarray(out["audio_unit_embeds"])
    idx = np.asarray(out["quantized_indices"])
    for i in range(b):
        n = asr_len[i]
        np.testing.assert_array_equal(idx[i, :n], idx_ref[i, :n],
                                      err_msg=f"row {i}")
        np.testing.assert_allclose(embeds[i, :n], embeds_ref[i, :n],
                                   atol=5e-4, err_msg=f"row {i}")


def test_extract_indices_matches_forward(tower_pair):
    _, ours, variables = tower_pair
    rng = np.random.RandomState(2)
    b, t = 1, 5
    mel = rng.randn(b, MELS, SRC_POS * 2).astype(np.float32)
    asr = rng.randint(10, 40000, (b, t))
    asr_len = np.asarray([t], np.int32)
    word_ids = np.asarray([[0, 0, 1, 2, 2]], np.int32)
    out = ours.apply(variables, jnp.asarray(mel), jnp.asarray(asr),
                     jnp.asarray(asr_len), jnp.asarray(word_ids))
    idx = ours.apply(variables, jnp.asarray(mel), jnp.asarray(asr),
                     jnp.asarray(asr_len), jnp.asarray(word_ids),
                     method=ours.extract_indices)
    np.testing.assert_array_equal(np.asarray(idx),
                                  np.asarray(out["quantized_indices"]))
