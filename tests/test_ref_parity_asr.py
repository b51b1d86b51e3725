"""Golden parity: our WhisperForASR greedy decode (suppress / begin-suppress
masks, KV-cached loop) vs HF WhisperForConditionalGeneration.generate on a
tiny model with the same suppression config.

The reference preprocessing transcribes with the HF whisper pipeline
(processing_taste.py:256-266); this pins our jitted decode loop to the HF
generation semantics it re-implements.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from taste_spokenlm_tpu.config import WhisperConfig
from taste_spokenlm_tpu.models.whisper import WhisperForASR
from taste_spokenlm_tpu.utils.convert import (whisper_decoder_params,
                                              whisper_encoder_params)

D = 32
MELS = 16
SRC_POS = 60
VOCAB = 50366
PROMPT = (50258, 50259, 50360, 50364)
EOS = 50257
SUPPRESS = (1, 2, 7, 8, 93, 359)
BEGIN_SUPPRESS = (220, 50257)


@pytest.fixture(scope="module")
def asr_pair():
    from transformers import WhisperConfig as HFWhisperConfig
    from transformers import WhisperForConditionalGeneration
    torch.manual_seed(0)
    hf_cfg = HFWhisperConfig(
        vocab_size=VOCAB, num_mel_bins=MELS, d_model=D,
        encoder_layers=2, encoder_attention_heads=2,
        decoder_layers=2, decoder_attention_heads=2,
        encoder_ffn_dim=48, decoder_ffn_dim=48,
        max_source_positions=SRC_POS, max_target_positions=64,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        eos_token_id=EOS, pad_token_id=EOS, decoder_start_token_id=PROMPT[0],
        begin_suppress_tokens=None, forced_decoder_ids=None)
    ref = WhisperForConditionalGeneration(hf_cfg).eval()
    ref.generation_config.begin_suppress_tokens = None
    ref.generation_config.forced_decoder_ids = None
    ref.generation_config.suppress_tokens = None

    cfg = WhisperConfig(
        vocab_size=VOCAB, d_model=D, encoder_layers=2, encoder_heads=2,
        decoder_layers=2, decoder_heads=2, ffn_dim=48, n_mels=MELS,
        max_source_positions=SRC_POS, max_target_positions=64,
        decoder_prompt=PROMPT, eos_token_id=EOS,
        suppress_ids=SUPPRESS, begin_suppress_ids=BEGIN_SUPPRESS,
        timestamp_begin_id=-1)
    ours = WhisperForASR(cfg)
    state = {k: v.detach().numpy() for k, v in ref.model.state_dict().items()}
    params = {
        "encoder": whisper_encoder_params(state, prefix="encoder."),
        "decoder": whisper_decoder_params(state, prefix="decoder."),
    }
    return ref, ours, {"params": params}


def test_greedy_decode_matches_hf_generate(asr_pair):
    ref, ours, variables = asr_pair
    from transformers.generation.logits_process import (
        LogitsProcessorList, SuppressTokensAtBeginLogitsProcessor,
        SuppressTokensLogitsProcessor)

    rng = np.random.RandomState(1)
    b = 2
    mel = rng.randn(b, MELS, SRC_POS * 2).astype(np.float32)
    prompt = torch.tensor([list(PROMPT)] * b)
    max_new = 16

    processors = LogitsProcessorList([
        SuppressTokensLogitsProcessor(list(SUPPRESS), device="cpu"),
        SuppressTokensAtBeginLogitsProcessor(
            list(BEGIN_SUPPRESS), begin_index=len(PROMPT), device="cpu"),
    ])
    with torch.no_grad():
        out_ref = ref.generate(
            input_features=torch.from_numpy(mel),
            decoder_input_ids=prompt, logits_processor=processors,
            do_sample=False, max_new_tokens=max_new, num_beams=1)
    gen_ref = out_ref[:, len(PROMPT):].numpy()

    tokens, avg_lp = ours.apply(variables, jnp.asarray(mel),
                                max_tokens=max_new)
    tokens = np.asarray(tokens)
    assert np.isfinite(np.asarray(avg_lp)).all()

    for i in range(b):
        ref_row = gen_ref[i]
        our_row = tokens[i]
        # compare up to and including the first EOS on either side
        n = min(len(ref_row), len(our_row))
        for j in range(n):
            assert our_row[j] == ref_row[j], (
                f"row {i} pos {j}: {our_row[:n]} vs {ref_row[:n]}")
            if ref_row[j] == EOS:
                break
