"""taste_spokenlm_tpu — TPU-native TASTE spoken language modeling framework.

A from-scratch JAX/XLA/Pallas/pjit implementation of the capabilities of the
TASTE-SpokenLM reference stack (text-aligned speech tokenization + joint
text/taste spoken LM + CosyVoice-style voice generation), redesigned for TPU:

- batched, jitted audio frontend (whisper 128-mel, kaldi fbank-80, resampling)
- Whisper-style encoder/decoder with split-KV cross-attention aggregation
- residual vector quantization with EMA codebooks synced via psum
- KV-cached autoregressive decode loops expressed as `lax.scan`/`while_loop`
- flow-matching acoustic model + HiFT vocoder (iSTFT via XLA FFT)
- pjit/mesh data-parallel + ZeRO-style sharded-optimizer training

Public API parity targets the reference `taste_speech` package
(/root/reference/taste_speech/__init__.py:21-23): `TasteConfig`,
`TasteForCausalLM`-equivalent model, `TasteProcessor`, `VoiceGenerator`.
"""

__version__ = "0.1.0"

from taste_spokenlm_tpu.config import (  # noqa: F401
    TasteConfig,
    AudioTowerConfig,
    SpeechDecoderConfig,
    SpokenLMConfig,
    WhisperConfig,
    QuantizerConfig,
    LlamaConfig,
    LoraConfig,
    FlowConfig,
    HiFTConfig,
)


def __getattr__(name):
    """Lazy re-exports of the heavyweight model/frontend classes."""
    lazy = {
        "TasteForCausalLM": ("taste_spokenlm_tpu.models.taste", "TasteForCausalLM"),
        "TasteProcessor": ("taste_spokenlm_tpu.frontend.processor", "TasteProcessor"),
        "VoiceGenerator": ("taste_spokenlm_tpu.models.generator", "VoiceGenerator"),
        "CompletionPipeline": ("taste_spokenlm_tpu.frontend.api", "CompletionPipeline"),
        "TaslmForCausalLM": ("taste_spokenlm_tpu.models.taslm", "TaslmForCausalLM"),
        "from_pretrained": ("taste_spokenlm_tpu.pretrained", "from_pretrained"),
    }
    if name in lazy:
        import importlib
        module, attr = lazy[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(name)
