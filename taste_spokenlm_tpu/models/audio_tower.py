"""TASTE audio tower: the text-aligned speech tokenizer, as ONE jitted graph.

Composition (re-design of /root/reference/taste_speech/modeling_taste.py:33-211
and modules_taste/audio_joint_encoder_segmenter.py:336-416):

  mel [B,128,3000]
    -> whisper encoder (collects layer-6 hidden + final hidden in one pass)
    -> whisper decoder over [prompt(4) | asr tokens | eos] with SPLIT-KV
       cross-attention: K from the final encoder hidden, V from the layer-6
       hidden ("asr_attn_pooling", audio_joint_encoder_segmenter.py:377-381)
    -> skip the 4 prompt positions, drop the trailing eos column
    -> word-level mean pooling over consecutive word-id runs (segment ops,
       no Python loops)
    -> residual VQ -> taste embeddings + 4 indices per asr token.

Everything is fixed-shape and batched; the whole tower vmaps/jits as a single
XLA program (SURVEY.md §7 step 4, milestone A).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from taste_spokenlm_tpu.config import AudioTowerConfig
from taste_spokenlm_tpu.models.whisper import WhisperDecoder, WhisperEncoder
from taste_spokenlm_tpu.models.quantizer import ResidualVQ
from taste_spokenlm_tpu.ops.masking import length_mask
from taste_spokenlm_tpu.ops.segment import (alignment_mean_pool,
                                             segment_mean_pool)


class TasteAudioTower(nn.Module):
    config: AudioTowerConfig
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        # bf16 serving layout: the ENCODER keeps bf16 (the bulk of tower
        # FLOPs), but the segmenter decoder + pooling + RVQ run in f32 so
        # the emitted taste indices stay on the f32 decision boundaries —
        # the BASELINE >99.9% index-agreement gate binds the tokenizer
        # output, and argmin over 512 codes flips on bf16-scale drift
        # (docs/FULL_ARCH_PARITY.md "tower_bf16").
        self._seg_dtype = (jnp.float32 if cfg.segmenter_f32 else self.dtype)
        self.encoder = WhisperEncoder(cfg.whisper, dtype=self.dtype,
                                      remat=cfg.whisper.remat,
                                      name="encoder")
        self.decoder = WhisperDecoder(
            cfg.whisper, dtype=self._seg_dtype,
            cross_v_identity_init=cfg.make_v_proj_identity, name="decoder")
        if cfg.quantization_on:
            self.vq = ResidualVQ(cfg.quantizer, name="vq")
        if not cfg.is_joint_encoder_segmenter:
            # legacy path: truncated-encoder feats -> alignment pooling ->
            # affine to encoder_input_size (modeling_taste.py:64-74)
            self.audio_affine_layer = nn.Dense(cfg.encoder_input_size,
                                               dtype=self._seg_dtype)

    def _segment(self, mel: jnp.ndarray, asr_token_ids: jnp.ndarray,
                 asr_token_lengths: jnp.ndarray,
                 asr_word_ids: Optional[jnp.ndarray]) -> jnp.ndarray:
        """Run encoder + aggregating decoder -> per-asr-token features."""
        cfg = self.config
        b, t = asr_token_ids.shape
        enc = self.encoder(mel, collect_layer=cfg.encoder_target_hidden_layer)

        prompt = jnp.tile(jnp.asarray(cfg.whisper.decoder_prompt, jnp.int32)[None],
                          (b, 1))
        eos = jnp.full((b, 1), cfg.whisper.eos_token_id, jnp.int32)
        tokens = jnp.concatenate([prompt, asr_token_ids.astype(jnp.int32), eos],
                                 axis=1)

        if cfg.fuse_forward_type == "asr_attn_pooling":
            key_src, val_src = enc["last_hidden"], enc["target_hidden"]
        elif cfg.fuse_forward_type == "add_and_norm":
            fused = enc["last_hidden"] + enc["target_hidden"]
            fused = nn.LayerNorm(epsilon=1e-5, dtype=self._seg_dtype,
                                 name="early_exit_layer_norm")(fused)
            key_src = val_src = fused
        else:
            raise ValueError(cfg.fuse_forward_type)
        key_src = key_src.astype(self._seg_dtype)
        val_src = val_src.astype(self._seg_dtype)

        dec_out, _ = self.decoder(
            tokens, key_src, val_src,
            input_lengths=asr_token_lengths + len(cfg.whisper.decoder_prompt) + 1)
        feats = dec_out[:, len(cfg.whisper.decoder_prompt):-1]  # [B, T, C]

        if cfg.is_word_level and asr_word_ids is not None:
            feats = segment_mean_pool(feats, asr_word_ids, asr_token_lengths)
        return feats

    def __call__(
        self,
        mel: jnp.ndarray,                 # [B, n_mels, 3000]
        asr_token_ids: jnp.ndarray,       # [B, T] whisper-tokenizer ids
        asr_token_lengths: jnp.ndarray,   # [B]
        asr_word_ids: Optional[jnp.ndarray] = None,  # [B, T]
        train: bool = False,
        dropout_rng: Optional[jax.Array] = None,
        skip_vq: bool = False,
        asr_token_alignments: Optional[jnp.ndarray] = None,  # [B, T, 2] legacy
        mel_lengths: Optional[jnp.ndarray] = None,
    ) -> Dict[str, jnp.ndarray]:
        cfg = self.config
        if cfg.is_joint_encoder_segmenter:
            feats = self._segment(mel, asr_token_ids, asr_token_lengths,
                                  asr_word_ids)
        else:
            # legacy: target-layer encoder hidden + alignment-interval pooling
            enc = self.encoder(mel, collect_layer=cfg.encoder_target_hidden_layer)
            if mel_lengths is None:
                mel_lengths = jnp.full((mel.shape[0],), mel.shape[-1], jnp.int32)
            feats = alignment_mean_pool(
                enc["target_hidden"].astype(self._seg_dtype),
                mel_lengths // 2, asr_token_alignments, asr_token_lengths)
            feats = self.audio_affine_layer(feats)

        result: Dict[str, jnp.ndarray] = {
            "audio_unit_lengths": asr_token_lengths,
        }
        if cfg.quantization_on and not skip_vq:
            vq_out = self.vq(
                feats, mask=length_mask(asr_token_lengths, feats.shape[1]),
                train=train, dropout_rng=dropout_rng)
            audio_unit_embeds = vq_out["quantized_feats"]
            result["quantized_indices"] = vq_out["quantized_indices"]
            result["commit_loss"] = vq_out["commit_loss"]
        else:
            audio_unit_embeds = feats

        # batch-level audio-embedding dropout regularization
        # (modeling_taste.py:188-199): with prob p, replace a sample's embeds
        # with gaussian noise at the batch std.
        if train and cfg.audio_dropout_ratio > 0.0 and dropout_rng is not None:
            noise_rng, keep_rng = jax.random.split(
                jax.random.fold_in(dropout_rng, 1))
            keep = jax.random.bernoulli(
                keep_rng, 1.0 - cfg.audio_dropout_ratio,
                (audio_unit_embeds.shape[0], 1, 1))
            std = jnp.std(audio_unit_embeds)
            noise = jax.random.normal(noise_rng, audio_unit_embeds.shape,
                                      audio_unit_embeds.dtype) * std
            audio_unit_embeds = jnp.where(keep, audio_unit_embeds, noise)

        result["audio_unit_embeds"] = audio_unit_embeds
        return result

    def extract_indices(self, mel, asr_token_ids, asr_token_lengths,
                        asr_word_ids=None) -> jnp.ndarray:
        """Tokenize-only fast path: audio -> taste indices [B, T, Q]
        (modeling_taste.py extract_vq, :1859-1881)."""
        out = self(mel, asr_token_ids, asr_token_lengths, asr_word_ids)
        return out["quantized_indices"]
