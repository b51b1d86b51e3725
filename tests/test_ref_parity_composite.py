"""Golden parity: the composite TasteForCausalLM vs the reference imported
from /root/reference (torch-CPU), end to end on converted weights at tiny
scale:

  * SpeechAutoEncoder forward — mel + asr tokens -> TASTE tokenize (whisper
    joint encoder-segmenter + RVQ) -> speech decoder -> S3 speech-token
    logits/labels (modeling_taste.py:1532-1557); this is the path behind
    the BASELINE ">99.9% speech-token agreement" gate
  * extract_vq — asr-level indices + word-start mapping to llm-level
    indices (modeling_taste.py:1859-1881)

The reference composite is built through its real config/from_pretrained
machinery (tiny customized-whisper + llama checkpoints saved to tmp dirs),
weights converted with the same utils/convert functions the checkpoint
CLI uses.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from ref_compat import import_reference
from taste_spokenlm_tpu.config import (AudioTowerConfig, EncoderStackConfig,
                                       FlowConfig, HiFTConfig, LlamaConfig,
                                       QuantizerConfig, SpeechDecoderConfig,
                                       SpokenLMConfig, TasteConfig,
                                       WhisperConfig)
from taste_spokenlm_tpu.models.taste import TasteForCausalLM
from taste_spokenlm_tpu.utils import convert

D = 32            # whisper d_model == tower audio_embed_dim
MELS = 16
ENC_LAYERS = 3
TARGET_LAYER = 2
SRC_POS = 60
VOCAB = 50366
PROMPT = (50258, 50259, 50360, 50364)
EOS = 50257
Q, K, CDIM = 4, 16, 8   # Q=4: the reference spoken-LM hard-codes 4 levels
ENC_IN = 16       # speech decoder encoder_input_size
LLM_IN = 32
SPEECH_VOCAB = 40
SPK = 12


class _ProcessorStub:
    class feature_extractor:  # noqa: N801 - attribute bag
        hop_length = 160
        nb_max_frames = 3000

    @classmethod
    def from_pretrained(cls, *a, **k):
        return cls()


@pytest.fixture(scope="module")
def composite_pair(tmp_path_factory):
    mt = import_reference("taste_speech.modeling_taste")
    cfgmod = import_reference("taste_speech.configuration_taste")
    ajes = import_reference(
        "taste_speech.modules_taste.audio_joint_encoder_segmenter")
    ajes.WhisperProcessor = _ProcessorStub
    ajes.WhisperTokenizer = _ProcessorStub
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM
    from transformers import WhisperConfig as HFWhisperConfig

    torch.manual_seed(0)
    hf_whisper_cfg = HFWhisperConfig(
        vocab_size=VOCAB, num_mel_bins=MELS, d_model=D,
        encoder_layers=ENC_LAYERS, encoder_attention_heads=2,
        decoder_layers=2, decoder_attention_heads=2,
        encoder_ffn_dim=48, decoder_ffn_dim=48,
        max_source_positions=SRC_POS, max_target_positions=32,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0)
    cw = import_reference(
        "taste_speech.modules_taste.cosyvoice.customized_whisper")
    whisper_dir = tmp_path_factory.mktemp("tiny_whisper_comp")
    cw.WhisperModel(hf_whisper_cfg).save_pretrained(whisper_dir)

    hf_llama_cfg = HFLlamaConfig(
        vocab_size=100, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=64, rope_theta=10000.0,
        initializer_range=0.1)
    llama_dir = tmp_path_factory.mktemp("tiny_llama_comp")
    LlamaForCausalLM(hf_llama_cfg).save_pretrained(llama_dir)
    hf_llama_cfg._name_or_path = str(llama_dir)

    ref_cfg = cfgmod.TasteConfig(
        audio_tower_config=cfgmod.TasteAudioTowerConfig(
            text_token_size=VOCAB, audio_embed_dim=D, quantization_on=True,
            is_joint_encoder_segmenter=True,
            encoder__target_hidden_layer=TARGET_LAYER,
            kwargs_for_joint_encoder_segmenter=dict(
                model_name_or_path=str(whisper_dir),
                target_hidden_layer=TARGET_LAYER,
                forward_type="asr_attn_pooling", make_v_proj_identity=True,
                is_word_level=True, skip_prefix_idx=4, dtype="float32"),
            kwargs_for_quantizer=dict(
                quantizer_class="rvq", dim=D, num_quantizers=Q,
                codebook_dim=CDIM, codebook_size=K, kmeans_init=False,
                decay=0.9, quantize_dropout=False, threshold_ema_dead_code=0,
                commitment_weight=1.0, sample_codebook_temp=0.0)),
        speech_decoder_config=cfgmod.TasteSpeechDecoderConfig(
            encoder_input_size=ENC_IN, audio_encoder_input_size=D,
            llm_input_size=LLM_IN, llm_output_size=LLM_IN,
            text_token_size=VOCAB, speech_token_size=SPEECH_VOCAB,
            spk_embed_dim=SPK, skip_prefix_idx=4,
            fuse_encoded_audio_text_type="weighted_sum",
            fuse_encoded_audio_text_kwargs={
                "normalize": False, "use_layer_norm": False,
                "use_trainable_weight": True, "weight_init_type": "balance"},
            encoder__attention_heads=2, encoder__linear_units=32,
            encoder__num_blocks=1, encoder__dropout_rate=0.0,
            encoder__positional_dropout_rate=0.0,
            llm__attention_heads=2, llm__linear_units=32, llm__num_blocks=2,
            llm__dropout_rate=0.0, llm__positional_dropout_rate=0.0),
        spoken_lm_config=cfgmod.TasteSpokenLMConfig(
            sos_id=7, loss_weights="0.5-0.5", delay=1, delay_level="word",
            use_lora=False, out_llm_module="weighted_layer"),
        text_config=hf_llama_cfg,
        asr_config=hf_whisper_cfg,
        _attn_implementation="eager",
    )
    ref = mt.TasteForCausalLM(ref_cfg).eval()
    ref._mode = "SpeechAutoEncoder"
    ref._skip_vq_in_audio_encoder = False
    ref._skip_audio_in_audio_decoder = False

    # our config mirrors the reference settings above; the audio token
    # encoder inside the speech decoder is NOT exposed by the reference
    # config and stays at its defaults (8 heads / 2048 ffn / 2 blocks,
    # modeling_taste.py:267-284)
    def enc(num_blocks, input_size, input_layer="linear", heads=2, ffn=32,
            dropout=0.0):
        return EncoderStackConfig(
            output_size=LLM_IN, attention_heads=heads, linear_units=ffn,
            num_blocks=num_blocks, dropout_rate=dropout,
            positional_dropout_rate=dropout, attention_dropout_rate=0.0,
            input_layer=input_layer, input_size=input_size,
            static_chunk_size=1)

    cfg = TasteConfig(
        audio_tower=AudioTowerConfig(
            whisper=WhisperConfig(
                vocab_size=VOCAB, d_model=D, encoder_layers=ENC_LAYERS,
                encoder_heads=2, decoder_layers=2, decoder_heads=2,
                ffn_dim=48, n_mels=MELS, max_source_positions=SRC_POS,
                max_target_positions=32, decoder_prompt=PROMPT,
                eos_token_id=EOS),
            quantizer=QuantizerConfig(
                dim=D, codebook_dim=CDIM, codebook_size=K, num_quantizers=Q,
                decay=0.9, kmeans_init=False, threshold_ema_dead_code=0,
                quantize_dropout=False, commitment_weight=1.0),
            quantization_on=True, audio_embed_dim=D, text_token_size=VOCAB,
            encoder_target_hidden_layer=TARGET_LAYER, skip_prefix_idx=4,
            is_word_level=True, fuse_forward_type="asr_attn_pooling",
            make_v_proj_identity=True),
        speech_decoder=SpeechDecoderConfig(
            text_token_size=VOCAB, speech_token_size=SPEECH_VOCAB,
            text_encoder_input_size=ENC_IN, audio_encoder_input_size=D,
            llm_input_size=LLM_IN, llm_output_size=LLM_IN,
            spk_embed_dim=SPK, fuse_type="weighted_sum",
            text_encoder=enc(1, ENC_IN),
            audio_encoder=enc(2, ENC_IN, heads=8, ffn=2048, dropout=0.1),
            llm=enc(2, LLM_IN, "linear_legacy")),
        spoken_lm=SpokenLMConfig(
            llama=LlamaConfig(
                vocab_size=100, hidden_size=32, intermediate_size=64,
                num_hidden_layers=2, num_attention_heads=2,
                num_key_value_heads=2, head_dim=16,
                max_position_embeddings=64, rope_theta=10000.0,
                rope_scaling_factor=1.0),
            lora=None, use_lora=False, delay=1, delay_level="word",
            out_llm_module="weighted_layer", loss_weights="0.5-0.5",
            sos_id=7),
        flow=FlowConfig.tiny(), hift=HiFTConfig.tiny())
    ours = TasteForCausalLM(cfg)

    # the spoken_lm backbone is cast to bf16 by its ctor (unused in these
    # paths) — .float() makes every tensor numpy-convertible
    state = {k: v.detach().float().numpy()
             for k, v in ref.state_dict().items()}
    params = {
        "speech_decoder": convert.speech_decoder_params(state),
        "audio_tower": convert.audio_tower_params(state),
    }
    vq_params, vq_state = convert.rvq_state(state, "audio_tower.vq.rvq.")
    if vq_params:
        params["audio_tower"]["vq"] = vq_params
    variables = {"params": params,
                 "quantizer": {"audio_tower": {"vq": vq_state}}}
    return ref, ours, variables


def _batch(seed=1):
    rng = np.random.RandomState(seed)
    b, t, s = 2, 6, 7
    mel = rng.randn(b, SRC_POS * 2, MELS).astype(np.float32)
    spk = rng.randn(b, SPK).astype(np.float32)
    asr = rng.randint(10, 40000, (b, t))
    asr_len = np.asarray([t, t - 2], np.int32)
    asr[1, t - 2:] = EOS
    word_ids = np.asarray([[0, 0, 1, 1, 2, 2],
                           [0, 1, 1, 2, 3, 4]], np.int32)
    word_ids_ref = np.concatenate(
        [word_ids, np.asarray([[7], [8]], np.int32)], axis=1)
    speech = rng.randint(0, SPEECH_VOCAB, (b, s))
    speech_len = np.asarray([s, s - 3], np.int32)
    return (mel, spk, asr, asr_len, word_ids, word_ids_ref, speech,
            speech_len)


def test_speech_autoencoder_matches_reference(composite_pair):
    ref, ours, variables = composite_pair
    (mel, spk, asr, asr_len, word_ids, word_ids_ref, speech,
     speech_len) = _batch()
    feat_len = np.full((2,), SRC_POS * 2, np.int64)

    with torch.no_grad():
        out_ref = ref(
            speaker_embeds=torch.from_numpy(spk),
            asr_token_ids=torch.from_numpy(asr.astype(np.int64)),
            asr_token_lengths=torch.from_numpy(asr_len.astype(np.int64)),
            asr_word_ids=torch.from_numpy(word_ids_ref.astype(np.int64)),
            audio_features=torch.from_numpy(mel),
            audio_feature_lengths=torch.from_numpy(feat_len),
            speech_token_ids=torch.from_numpy(speech.astype(np.int64)),
            speech_token_lengths=torch.from_numpy(
                speech_len.astype(np.int64)))

    out = ours.apply(
        variables, jnp.asarray(spk), jnp.asarray(asr), jnp.asarray(asr_len),
        jnp.asarray(word_ids), jnp.asarray(mel.transpose(0, 2, 1)),
        jnp.asarray(speech), jnp.asarray(speech_len),
        method=ours.forward_speech_autoencoder)

    logits_ref = out_ref.speech_logits.numpy()
    labels_ref = out_ref.speech_labels.numpy()
    logits = np.asarray(out["speech_logits"])
    labels = np.asarray(out["speech_labels"])
    lm_len = 3 + asr_len + speech_len
    for i in range(2):
        n = lm_len[i]
        np.testing.assert_array_equal(labels[i, :n], labels_ref[i, :n],
                                      err_msg=f"labels row {i}")
        np.testing.assert_allclose(logits[i, :n], logits_ref[i, :n],
                                   atol=2e-3, err_msg=f"logits row {i}")
        # >99.9% speech-token agreement gate, at tiny scale: argmax equal
        np.testing.assert_array_equal(
            logits[i, :n].argmax(-1), logits_ref[i, :n].argmax(-1),
            err_msg=f"token agreement row {i}")


def test_extract_vq_matches_reference(composite_pair):
    ref, ours, variables = composite_pair
    (mel, spk, asr, asr_len, word_ids, word_ids_ref, speech,
     speech_len) = _batch(2)
    feat_len = np.full((2,), SRC_POS * 2, np.int64)
    # llm tokenization of the same words: different subword segmentation
    llm_words = np.asarray([[0, 1, 1, 2, 2], [0, 0, 1, 2, 3]], np.int32)
    llm_tokens = np.random.RandomState(5).randint(0, 100, (2, 5))
    llm_len = np.asarray([5, 4], np.int32)
    # rows must cover the same word set as the asr rows (lengths [6, 4]):
    # asr row0 words {0,1,2}; row1 (len 4) words {0,1,2}
    llm_words[0] = [0, 1, 1, 2, 2]
    llm_words[1] = [0, 0, 1, 2, 0]   # tail beyond len ignored

    with torch.no_grad():
        asr_idx_ref, llm_idx_ref = ref.extract_vq(
            torch.from_numpy(asr.astype(np.int64)),
            torch.from_numpy(asr_len.astype(np.int64)),
            torch.from_numpy(word_ids.astype(np.int64)),
            torch.from_numpy(llm_tokens.astype(np.int64)),
            torch.from_numpy(llm_len.astype(np.int64)),
            torch.from_numpy(llm_words.astype(np.int64)),
            torch.from_numpy(mel),
            torch.from_numpy(feat_len))

    asr_idx, llm_idx = ours.apply(
        variables, jnp.asarray(asr), jnp.asarray(asr_len),
        jnp.asarray(word_ids), jnp.asarray(llm_tokens),
        jnp.asarray(llm_len), jnp.asarray(llm_words),
        jnp.asarray(mel.transpose(0, 2, 1)), method=ours.extract_vq)

    for i, n in enumerate(asr_len):
        np.testing.assert_array_equal(
            np.asarray(asr_idx)[i, :n], asr_idx_ref.numpy()[i, :n],
            err_msg=f"asr indices row {i}")
    for i, n in enumerate(llm_len):
        np.testing.assert_array_equal(
            np.asarray(llm_idx)[i, :n], llm_idx_ref.numpy()[i, :n],
            err_msg=f"llm indices row {i}")


def test_s3_decode_loop_matches_reference(composite_pair, monkeypatch):
    """The KV-cached AR S3 decode (speech_decoder.generate) emits the same
    greedy trajectory as the reference's _voice_decoder_generate loop
    (modeling_taste.py:1559-1626), incl. the eos-ban below
    min_token_text_ratio, on the tower's own quantized embeds."""
    ref, ours, variables = composite_pair
    (mel, spk, asr, asr_len, word_ids, word_ids_ref, _s, _sl) = _batch(3)
    b = 1
    mel, spk = mel[:b], spk[:b]
    asr, asr_len = asr[:b], asr_len[:b]
    word_ids, word_ids_ref = word_ids[:b], word_ids_ref[:b]
    feat_len = np.full((b,), SRC_POS * 2, np.int64)

    def greedy_sampling_ids(weighted_scores, sampling, beam_size,
                            ignore_eos=True):
        ws = weighted_scores.clone()
        if ignore_eos:
            ws[ref.speech_decoder.speech_token_size] = -float("inf")
        return ws.argmax().reshape(1)

    monkeypatch.setattr(ref.speech_decoder, "sampling_ids",
                        greedy_sampling_ids)
    with torch.no_grad():
        out_ref = ref.inference_reconstruction(
            speaker_embeds=torch.from_numpy(spk),
            asr_token_ids=torch.from_numpy(asr.astype(np.int64)),
            asr_token_lengths=torch.from_numpy(asr_len.astype(np.int64)),
            asr_word_ids=torch.from_numpy(word_ids_ref.astype(np.int64)),
            audio_features=torch.from_numpy(mel),
            audio_feature_lengths=torch.from_numpy(feat_len))
    ref_tokens = out_ref["speech_token_ids"].numpy()[0]

    max_steps = 48
    enc = ours.apply(
        variables, jnp.asarray(mel.transpose(0, 2, 1)), jnp.asarray(asr),
        jnp.asarray(asr_len), jnp.asarray(word_ids),
        method=lambda m, *a: m.audio_tower(*a))
    gen = ours.apply(
        variables, jax.random.PRNGKey(0), jnp.asarray(spk),
        enc["audio_unit_embeds"], enc["audio_unit_lengths"],
        jnp.asarray(asr), jnp.asarray(asr_len),
        method=lambda m, *a, **k: m.speech_decoder.generate(
            *a, max_steps=max_steps, sampling_k=1))
    n_ours = int(gen["speech_token_lengths"][0])
    our_tokens = np.asarray(gen["speech_token_ids"])[0, :n_ours]

    n = min(len(ref_tokens), max_steps)
    np.testing.assert_array_equal(our_tokens[:n], ref_tokens[:n])
    if len(ref_tokens) < max_steps:
        # reference stopped at eos within our budget: lengths agree too
        assert n_ours == len(ref_tokens), (n_ours, len(ref_tokens))


def test_scoring_matches_reference(composite_pair):
    """Composite scoring (extract_vq -> spoken_lm loss,
    modeling_taste.py:1627-1660).  The reference computes the spoken-LM
    losses in bf16 (its ctor casts the backbone); ours stays f32, so the
    tolerance reflects bf16 rounding, with taste labels exact via the
    shared extract_vq parity above."""
    ref, ours, variables = composite_pair
    (mel, spk, asr, asr_len, word_ids, word_ids_ref, _s, _sl) = _batch(4)
    feat_len = np.full((2,), SRC_POS * 2, np.int64)
    llm_tokens = np.random.RandomState(9).randint(0, 100, (2, 5))
    llm_len = np.asarray([5, 4], np.int32)
    llm_words = np.asarray([[0, 1, 1, 2, 2], [0, 0, 1, 2, 0]], np.int32)

    # the reference hard-codes audio dim 1280 in its spoken-LM fusion and
    # pad embeds (modeling_taste.py:631-639 + bridge.py:46) — at tiny scale
    # they must be rebuilt for the tower's actual embed width (the reference
    # itself cannot run scoring at any other size)
    from taste_speech.modules_taste.bridge import BRIDGE_FUSION_CLASSES
    torch.manual_seed(7)
    ref.spoken_lm.fuse_for_bridge_in_llm = BRIDGE_FUSION_CLASSES[
        "weighted_sum"](audio_dim=D, llm_dim=32)
    with torch.no_grad():
        ref.spoken_lm.pad_audio_unit_embed = torch.nn.Parameter(
            torch.randn(D) * 0.1)
        ref.spoken_lm.pad_text_unit_embed.normal_(0, 0.1)

    # spoken-LM weights were not converted in the shared fixture
    state = {k: v.detach().float().numpy()
             for k, v in ref.state_dict().items()}
    params = dict(variables["params"])
    params["spoken_lm"] = convert.spoken_lm_params(state, "spoken_lm.")
    variables = dict(variables, params=params)

    with torch.no_grad():
        loss_ref = ref.scoring(
            torch.from_numpy(asr.astype(np.int64)),
            torch.from_numpy(asr_len.astype(np.int64)),
            torch.from_numpy(word_ids.astype(np.int64)),
            torch.from_numpy(llm_tokens.astype(np.int64)),
            torch.from_numpy(llm_len.astype(np.int64)),
            torch.from_numpy(llm_words.astype(np.int64)),
            torch.from_numpy(mel),
            torch.from_numpy(feat_len))

    loss = ours.apply(
        variables, jnp.asarray(asr), jnp.asarray(asr_len),
        jnp.asarray(word_ids), jnp.asarray(llm_tokens),
        jnp.asarray(llm_len), jnp.asarray(llm_words),
        jnp.asarray(mel.transpose(0, 2, 1)), method=ours.scoring)
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=0.05)
