"""VoiceGenerator: S3 speech tokens -> waveform (flow + HiFT bundle).

Re-design of /root/reference/taste_speech/modules_taste/inference_audio.py:15-107
with the exact CosyVoice-300M hyperparameters; output 22.05 kHz.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from taste_spokenlm_tpu.config import FlowConfig, HiFTConfig
from taste_spokenlm_tpu.models.flow import MaskedDiffWithXvec
from taste_spokenlm_tpu.models.hift import HiFTGenerator


class VoiceGenerator(nn.Module):
    flow_config: FlowConfig
    hift_config: HiFTConfig
    dtype: Any = jnp.float32   # serving compute dtype (flow + HiFT convs)

    def setup(self):
        self.flow = MaskedDiffWithXvec(self.flow_config, dtype=self.dtype,
                                       name="flow")
        self.hift = HiFTGenerator(self.hift_config, dtype=self.dtype,
                                  name="hift")

    @property
    def output_sampling_rate(self) -> int:
        return self.hift_config.sampling_rate

    def __call__(self, rng: jax.Array, speech_token_ids: jnp.ndarray,
                 speech_token_lengths: jnp.ndarray,
                 flow_embedding: jnp.ndarray,
                 mel_len_max: int,
                 n_timesteps: Optional[int] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (waveform [B, mel_len_max*256], sample_lengths [B]).

        mel_len_max must be a static bound >= ceil(max_len/50*22050/256).
        """
        rng_flow, rng_hift = jax.random.split(rng)
        mel, mel_lengths = self.flow.inference(
            rng_flow, speech_token_ids, speech_token_lengths, flow_embedding,
            mel_len_max, n_timesteps)
        wav = self.hift(mel, rng_hift)
        samples_per_frame = wav.shape[1] // mel.shape[1]
        return wav, mel_lengths * samples_per_frame
