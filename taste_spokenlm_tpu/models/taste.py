"""TasteForCausalLM: the composite TASTE model (public API surface).

Re-design of /root/reference/taste_speech/modeling_taste.py:1209-1881.
Composes TasteAudioTower + TasteSpeechDecoder + TasteSpokenLM +
VoiceGenerator and exposes the reference's entry points:

  mode 'SpeechAutoEncoder' forward  (:1532-1557)  stage-1 training
  mode 'SpokenLLM'        forward   (:1497-1531)  stage-2 training
  extract_vq                        (:1859-1881)
  scoring                           (:1627-1660)
  inference_reconstruction          (:1793-1857)
  generate_completion (device part of inference_completion, :1663-1791 —
    the tokenizer round-trip glue lives in frontend/api.py)

Everything here is jittable; mode switches are Python-level (static).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from taste_spokenlm_tpu.config import TasteConfig
from taste_spokenlm_tpu.models.audio_tower import TasteAudioTower
from taste_spokenlm_tpu.models.generator import VoiceGenerator
from taste_spokenlm_tpu.models.quantizer import Codebook
from taste_spokenlm_tpu.models.sampler import SamplerConfig
from taste_spokenlm_tpu.models.speech_decoder import TasteSpeechDecoder
from taste_spokenlm_tpu.models.spoken_lm import TasteSpokenLM
from taste_spokenlm_tpu.ops.losses import IGNORE_ID
from taste_spokenlm_tpu.ops.segment import (compact_valid_rows, remap_gather,
                                            word_start_remap)


class TasteForCausalLM(nn.Module):
    config: TasteConfig
    weight_commit_loss: float = 1.0
    dtype: Any = jnp.float32
    # serving layout override for the AUDIO TOWER only (None = `dtype`).
    # The BASELINE >99.9% taste-index agreement gate binds the tokenizer:
    # a bf16 whisper ENCODER alone drifts RVQ argmin decisions ~2.3%
    # (docs/FULL_ARCH_PARITY.md), so production serving keeps the tower
    # f32 (it is ~6% of the serving wall, rtf 0.006) while the AR
    # decoders / flow / vocoder — where the time goes — stay bf16.
    tower_dtype: Any = None

    def setup(self):
        cfg = self.config
        self.audio_tower = TasteAudioTower(
            cfg.audio_tower,
            dtype=self.tower_dtype if self.tower_dtype is not None
            else self.dtype)
        self.speech_decoder = TasteSpeechDecoder(cfg.speech_decoder,
                                                 dtype=self.dtype)
        self.spoken_lm = TasteSpokenLM(
            cfg.spoken_lm,
            audio_dim=cfg.audio_tower.audio_embed_dim,
            taste_k=cfg.audio_tower.quantizer.codebook_size,
            taste_d=cfg.audio_tower.quantizer.codebook_dim,
            taste_l=cfg.audio_tower.quantizer.num_quantizers,
            dtype=self.dtype)
        self.voice_generator = VoiceGenerator(cfg.flow, cfg.hift,
                                              dtype=self.dtype)

    def _cb(self) -> Codebook:
        return self.audio_tower.vq.codebook()

    def init_reconstruction(self, rng, speaker_embeds, asr_token_ids,
                            asr_token_lengths, asr_word_ids, audio_features):
        """Init pass touching only the reconstruction-path params (tower +
        speech decoder + voice generator); decode loops cannot create params."""
        b, t = asr_token_ids.shape
        out1 = self.forward_speech_autoencoder(
            speaker_embeds, asr_token_ids, asr_token_lengths, asr_word_ids,
            audio_features, jnp.zeros((b, 4), jnp.int32),
            jnp.full((b,), 4, jnp.int32))
        wav, _ = self.voice_generator(
            rng, jnp.zeros((b, 4), jnp.int32), jnp.full((b,), 4, jnp.int32),
            speaker_embeds, mel_len_max=8)
        return out1["loss"] + jnp.sum(wav) * 0.0

    def init_all(self, rng, speaker_embeds, asr_token_ids, asr_token_lengths,
                 asr_word_ids, audio_features, speech_token_ids,
                 speech_token_lengths, llm_token_ids, llm_token_lengths,
                 llm_word_ids):
        """Single forward pass touching EVERY parameter, so one `init` call
        materializes the full tree (the decode loops run under lifted
        control flow and cannot create params)."""
        out1 = self.forward_speech_autoencoder(
            speaker_embeds, asr_token_ids, asr_token_lengths, asr_word_ids,
            audio_features, speech_token_ids, speech_token_lengths)
        _, llm_indices = self.extract_vq(
            asr_token_ids, asr_token_lengths, asr_word_ids, llm_token_ids,
            llm_token_lengths, llm_word_ids, audio_features)
        out2 = self.forward_spoken_llm(
            llm_indices, llm_token_ids, llm_token_lengths, llm_word_ids)
        wav, _ = self.voice_generator(
            rng, jnp.maximum(speech_token_ids, 0), speech_token_lengths,
            speaker_embeds, mel_len_max=8)
        return out1["loss"] + out2["loss"] + jnp.sum(wav) * 0.0

    # ------------------------------------------------------------------
    # training forwards
    # ------------------------------------------------------------------

    def forward_speech_autoencoder(
        self, speaker_embeds, asr_token_ids, asr_token_lengths, asr_word_ids,
        audio_features, speech_token_ids, speech_token_lengths,
        train: bool = False, dropout_rng=None,
        skip_vq: bool = False, skip_audio_in_decoder: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        """Stage-1: tokenize audio and reconstruct S3 tokens
        (modeling_taste.py:1532-1557)."""
        encoded = self.audio_tower(
            audio_features, asr_token_ids, asr_token_lengths, asr_word_ids,
            train=train, dropout_rng=dropout_rng, skip_vq=skip_vq)
        decoded = self.speech_decoder(
            speaker_embeds, encoded["audio_unit_embeds"],
            encoded["audio_unit_lengths"], asr_token_ids, asr_token_lengths,
            speech_token_ids, speech_token_lengths,
            skip_audio=skip_audio_in_decoder)
        loss = decoded["loss"]
        out = {
            "speech_logits": decoded["logits"],
            "speech_labels": decoded["labels"],
            "speech_token_accuracy": decoded["speech_token_accuracy"],
        }
        if "commit_loss" in encoded:
            loss = loss + self.weight_commit_loss * encoded["commit_loss"]
            out["commit_loss"] = encoded["commit_loss"]
            out["quantized_indices"] = encoded["quantized_indices"]
        out["loss"] = loss
        return out

    def forward_spoken_llm(
        self, llm_indices, llm_token_ids, llm_token_lengths, llm_word_ids,
        speaker_embeds=None, asr_token_ids=None, asr_token_lengths=None,
        asr_word_ids=None, speech_token_ids=None, speech_token_lengths=None,
        train: bool = False, rng=None, ref_logits=None,
        compute_ref_kl: bool = False,
        return_text_logits: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        """Stage-2 joint LM (modeling_taste.py:1497-1531); optionally runs the
        frozen speech decoder on predicted taste for eval metrics.
        `compute_ref_kl` runs the adapter-disabled backbone on the plain text
        stream in-graph to produce the frozen-base KL target."""
        cb = self._cb()
        out = self.spoken_lm(cb, llm_indices, llm_token_ids, llm_token_lengths,
                             llm_word_ids, train=train, rng=rng,
                             ref_logits=ref_logits,
                             compute_ref_kl=compute_ref_kl,
                             return_text_logits=return_text_logits)
        if speech_token_ids is not None and asr_token_ids is not None:
            audio_unit_embeds = self._taste_to_audio_embeds(
                cb, out["taste_logits"], out["taste_labels"],
                asr_token_lengths, asr_word_ids)
            decoded = self.speech_decoder(
                speaker_embeds, audio_unit_embeds, asr_token_lengths,
                asr_token_ids, asr_token_lengths, speech_token_ids,
                speech_token_lengths)
            out["speech_logits"] = decoded["logits"]
            out["speech_labels"] = decoded["labels"]
            out["speech_token_accuracy"] = decoded["speech_token_accuracy"]
        return out

    def _taste_to_audio_embeds(self, cb, taste_logits, taste_labels,
                               asr_token_lengths, asr_word_ids):
        """Predicted taste (at delayed positions) -> per-asr-token embeddings
        (modeling_taste.py:1006-1028)."""
        preds = jnp.where(taste_labels != IGNORE_ID,
                          jnp.argmax(taste_logits, axis=-1), IGNORE_ID)
        valid = jnp.all(taste_labels != IGNORE_ID, axis=-1)
        dense = compact_valid_rows(preds, valid, asr_word_ids.shape[1],
                                   pad_value=0)
        return self.spoken_lm.get_audio_embeds_from_taste(
            cb, asr_token_lengths, asr_word_ids, dense)

    # ------------------------------------------------------------------
    # tokenization / scoring
    # ------------------------------------------------------------------

    def extract_vq(self, asr_token_ids, asr_token_lengths, asr_word_ids,
                   llm_token_ids, llm_token_lengths, llm_word_ids,
                   audio_features) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """audio -> (asr_indices [B,Ta,L], llm_indices [B,Tl,L]); llm
        positions that are not word starts hold -1 (modeling_taste.py:1859-1881)."""
        encoded = self.audio_tower(audio_features, asr_token_ids,
                                   asr_token_lengths, asr_word_ids)
        asr_indices = encoded["quantized_indices"]
        m = word_start_remap(asr_word_ids, asr_token_lengths,
                             llm_word_ids, llm_token_lengths)
        # integer-exact gather (NOT `m @ indices`, which would round odd
        # codebook ids > 256 through the bf16 MXU); zero rows of m (llm
        # positions that are not word starts) map to -1
        llm_indices = remap_gather(m, asr_indices, fill=-1)
        return asr_indices, llm_indices

    def scoring(self, asr_token_ids, asr_token_lengths, asr_word_ids,
                llm_token_ids, llm_token_lengths, llm_word_ids,
                audio_features) -> jnp.ndarray:
        """Sequence log-likelihood-style loss for ranking
        (modeling_taste.py:1627-1660)."""
        _, llm_indices = self.extract_vq(
            asr_token_ids, asr_token_lengths, asr_word_ids, llm_token_ids,
            llm_token_lengths, llm_word_ids, audio_features)
        out = self.spoken_lm(self._cb(), llm_indices, llm_token_ids,
                             llm_token_lengths, llm_word_ids)
        return out["loss"]

    # ------------------------------------------------------------------
    # inference
    # ------------------------------------------------------------------

    def inference_reconstruction(
        self, rng, speaker_embeds, asr_token_ids, asr_token_lengths,
        asr_word_ids, audio_features,
        llm_token_ids=None, llm_token_lengths=None, llm_word_ids=None,
        mode: str = "SpeechAutoEncoder",
        max_speech_steps: int = 512, mel_len_max: int = 1024,
    ) -> Dict[str, jnp.ndarray]:
        """audio -> taste -> S3 tokens -> waveform (modeling_taste.py:1793-1857
        + _voice_decoder_generate + VoiceGenerator)."""
        if mode == "SpeechAutoEncoder":
            encoded = self.audio_tower(audio_features, asr_token_ids,
                                       asr_token_lengths, asr_word_ids)
            audio_unit_embeds = encoded["audio_unit_embeds"]
            audio_unit_lengths = encoded["audio_unit_lengths"]
        elif mode == "SpokenLLM":
            cb = self._cb()
            _, llm_indices = self.extract_vq(
                asr_token_ids, asr_token_lengths, asr_word_ids, llm_token_ids,
                llm_token_lengths, llm_word_ids, audio_features)
            lm_out = self.spoken_lm(cb, llm_indices, llm_token_ids,
                                    llm_token_lengths, llm_word_ids)
            audio_unit_embeds = self._taste_to_audio_embeds(
                cb, lm_out["taste_logits"], lm_out["taste_labels"],
                asr_token_lengths, asr_word_ids)
            audio_unit_lengths = asr_token_lengths
        else:
            raise ValueError(mode)

        rng_dec, rng_voc = jax.random.split(rng)
        gen = self.speech_decoder.generate(
            rng_dec, speaker_embeds, audio_unit_embeds, audio_unit_lengths,
            asr_token_ids, asr_token_lengths, max_steps=max_speech_steps)
        tokens = jnp.maximum(gen["speech_token_ids"], 0)
        wav, wav_lengths = self.voice_generator(
            rng_voc, tokens, gen["speech_token_lengths"], speaker_embeds,
            mel_len_max)
        return {"speech_token_ids": gen["speech_token_ids"],
                "speech_token_lengths": gen["speech_token_lengths"],
                "waveform": wav, "waveform_lengths": wav_lengths}

    def vocode(self, rng, speech_token_ids, speech_token_lengths,
               speaker_embeds, mel_len_max: int = 1024
               ) -> Dict[str, jnp.ndarray]:
        """S3 tokens -> waveform, bypassing the tower and speech decoder —
        the reference's `--use_target_speech_token` s3-topline ablation
        (STAGE1_TRAIN/CosyVoice/cosyvoice/bin/eval_audio.py; eval_s3.sh):
        reconstruct from GROUND-TRUTH speech tokens to isolate the
        flow+vocoder quality ceiling from tokenizer/decoder errors.

        External dumps may carry EOS/pad markers (>= speech_token_size);
        clamp both ends — an OOB embedding gather NaNs the waveform."""
        tokens = jnp.clip(speech_token_ids, 0,
                          self.config.speech_decoder.speech_token_size - 1)
        wav, wav_lengths = self.voice_generator(
            rng, tokens, speech_token_lengths, speaker_embeds, mel_len_max)
        return {"speech_token_ids": speech_token_ids,
                "speech_token_lengths": speech_token_lengths,
                "waveform": wav, "waveform_lengths": wav_lengths}

    def generate_completion(
        self, rng, sampler_cfg: SamplerConfig, tables,
        llm_indices, llm_token_ids, llm_token_lengths, llm_word_ids,
        conditional_mode: str = "audio", max_steps: int = 256,
        instruct_prefix_ids=None, instruct_suffix_ids=None,
    ) -> Dict[str, jnp.ndarray]:
        """Device part of inference_completion: the joint text+taste decode
        (modeling_taste.py:1663-1741; modes zero/text/audio/instruct per
        :1692).  The host-side tokenizer round trip (decode words,
        re-tokenize with the asr tokenizer) and the subsequent voice
        decoding are composed in frontend/api.py."""
        return self.spoken_lm.generate(
            rng, self._cb(), sampler_cfg, tables, llm_indices, llm_token_ids,
            llm_token_lengths, llm_word_ids, conditional_mode, max_steps,
            instruct_prefix_ids, instruct_suffix_ids)

    def synthesize_from_taste(
        self, rng, speaker_embeds, taste_indices_per_word, asr_token_ids,
        asr_token_lengths, asr_word_ids,
        max_speech_steps: int = 512, mel_len_max: int = 1024,
        sampling_k: int = 25,
    ) -> Dict[str, jnp.ndarray]:
        """Per-word taste indices + asr tokens -> waveform: the tail of
        inference_completion (:1742-1791).  `sampling_k=1` decodes the S3
        stream greedily (deterministic — used by the serving-fidelity gate,
        scripts/full_arch_parity.py --part serving)."""
        cb = self._cb()
        audio_unit_embeds = self.spoken_lm.get_audio_embeds_from_taste(
            cb, asr_token_lengths, asr_word_ids, taste_indices_per_word)
        rng_dec, rng_voc = jax.random.split(rng)
        gen = self.speech_decoder.generate(
            rng_dec, speaker_embeds, audio_unit_embeds, asr_token_lengths,
            asr_token_ids, asr_token_lengths, max_steps=max_speech_steps,
            sampling_k=sampling_k)
        tokens = jnp.maximum(gen["speech_token_ids"], 0)
        wav, wav_lengths = self.voice_generator(
            rng_voc, tokens, gen["speech_token_lengths"], speaker_embeds,
            mel_len_max)
        return {"speech_token_ids": gen["speech_token_ids"],
                "speech_token_lengths": gen["speech_token_lengths"],
                "waveform": wav, "waveform_lengths": wav_lengths}

    # ------------------------------------------------------------------
    # streaming synthesis (chunked decode + windowed vocoding)
    # ------------------------------------------------------------------

    def stream_synth_init(
        self, rng, speaker_embeds, taste_indices_per_word, asr_token_ids,
        asr_token_lengths, asr_word_ids, max_speech_steps: int = 512,
    ):
        """Streaming counterpart of synthesize_from_taste: build the fused
        audio-unit prefix and prefill the S3 decoder; returns the decode
        stream state.  Drive with `stream_decode_chunk` +
        `stream_vocode_window` (frontend.streaming.StreamingSynthesizer
        orchestrates host-side)."""
        cb = self._cb()
        audio_unit_embeds = self.spoken_lm.get_audio_embeds_from_taste(
            cb, asr_token_lengths, asr_word_ids, taste_indices_per_word)
        # rng split mirrors synthesize_from_taste so the decode trajectory
        # matches the non-streaming path bit-for-bit on the same key
        rng_dec, rng_voc = jax.random.split(rng)
        state = self.speech_decoder.generate_stream_init(
            rng_dec, speaker_embeds, audio_unit_embeds, asr_token_lengths,
            asr_token_ids, asr_token_lengths, max_steps=max_speech_steps)
        return state

    def stream_decode_chunk(self, state, chunk_steps: int):
        """(tokens [B, chunk_steps] with -1 after EOS, new stream state)."""
        return self.speech_decoder.generate_stream_chunk(state, chunk_steps)

    def stream_vocode_window(self, rng, window_tokens, window_lengths,
                             speaker_embeds, mel_len_max: int):
        """Flow + HiFT over one token window (left context + new chunk).
        Returns (wav [B, mel_len_max*256], wav_lengths [B])."""
        return self.voice_generator(
            rng, jnp.maximum(window_tokens, 0), window_lengths,
            speaker_embeds, mel_len_max)

    def stream_step(self, state, rng, speaker_embeds, token_hist, hist_len,
                    chunk_steps: int, window: int, mel_window_max: int):
        """Fused streaming step: decode one S3 chunk AND vocode its window
        in a single dispatch.  The token history lives on-device
        ([B, max_steps+chunk] int32, zero-padded), so the host loop costs
        one dispatch per chunk instead of three (the remote-compile tunnel
        charges ~30 ms per dispatch).

        Produces exactly the window the host-orchestrated
        stream_decode_chunk + stream_vocode_window pair would: tokens
        [hist_len, e) appended (post-EOS rows zero-padded), window
        [max(0, e-window), e) vocoded with length e-ws."""
        tokens, state = self.speech_decoder.generate_stream_chunk(
            state, chunk_steps)
        n_new = jnp.max(jnp.sum((tokens >= 0).astype(jnp.int32), axis=1))
        token_hist = jax.lax.dynamic_update_slice(
            token_hist, jnp.maximum(tokens, 0), (0, hist_len))
        e = hist_len + n_new
        # window anchor matches the host math: left_ctx tokens BEFORE this
        # chunk's start (hist_len), regardless of how full the chunk is
        ws = jnp.maximum(hist_len - (window - chunk_steps), 0)
        win = jax.lax.dynamic_slice(
            token_hist, (0, ws), (token_hist.shape[0], window))
        win_len = jnp.full((token_hist.shape[0],), e - ws, jnp.int32)
        wav, _ = self.voice_generator(rng, win, win_len, speaker_embeds,
                                      mel_window_max)
        return {"tokens": tokens, "state": state, "token_hist": token_hist,
                "hist_len": e, "n_new": n_new, "wav": wav,
                "done": state["done"]}

    def completion_stream_start(
        self, rng, sampler_cfg, tables, llm_indices, llm_token_ids,
        llm_token_lengths, llm_word_ids, conditional_mode: str = "audio",
        max_steps: int = 256, first_chunk: int = 16,
    ):
        """Joint-decode prefill + the FIRST decode chunk in one dispatch:
        the pipelined completion stream (frontend.streaming
        .CompletionStreamer) starts synthesizing from these first words
        while the rest of the text is still decoding."""
        st = self.spoken_lm.generate_stream_init(
            rng, self._cb(), llm_indices, llm_token_ids, llm_token_lengths,
            llm_word_ids, conditional_mode, max_steps)
        return self.spoken_lm.generate_stream_chunk(
            st, self._cb(), sampler_cfg, tables, first_chunk)

    def completion_stream_chunk(self, state, sampler_cfg, tables,
                                chunk_steps: int):
        """Continue the joint decode by up to `chunk_steps` steps."""
        return self.spoken_lm.generate_stream_chunk(
            state, self._cb(), sampler_cfg, tables, chunk_steps)

    def completion_first_audio(
        self, rng, sampler_cfg, tables, llm_indices, llm_token_ids,
        llm_token_lengths, llm_word_ids, speaker_embeds, asr_token_ids,
        asr_word_ids, asr_valid, conditional_mode: str = "audio",
        max_steps: int = 256, jd_first_chunk: int = 16,
        max_speech_steps: int = 512, first_chunk_tokens: int = 16,
        mel_window_first: int = 128, hist_pad: int = 0,
    ):
        """completion_stream_start + the first synthesis chunk in ONE
        dispatch: joint-LM prefill, `jd_first_chunk` joint decode steps,
        S3 prefill over the words decoded so far, `first_chunk_tokens` AR
        steps and one small flow/HiFT window — first audio leaves the
        device after a single program launch.  Every host round trip on
        the TTFA path costs ~30 ms over the remote tunnel (CLAUDE.md);
        the unfused path pays four of them before the first sample.

        Key derivation, the word count, the taste clamp and the asr
        lengths mirror frontend.streaming.CompletionStreamer's host math
        bit-for-bit (rng_jd/rng_syn = split(rng); vocoder stream =
        fold_in(fold_in(rng_syn, 7919), 0); complete words only while
        decoding; `asr_valid` masks tokenizer pad positions), so the fused
        stream continues identically from the returned states.

        The caller must check `n_words >= min_start_words OR jd_done` on
        the host; when false the synthesis outputs were computed from too
        little text and must be DISCARDED (fall back to jd chunk polling +
        a separate stream_start_step) — the decode budget `jd_first_chunk`
        simply hadn't produced enough words for first audio yet.
        """
        rng_jd, rng_syn = jax.random.split(rng)
        st = self.spoken_lm.generate_stream_init(
            rng_jd, self._cb(), llm_indices, llm_token_ids,
            llm_token_lengths, llm_word_ids, conditional_mode, max_steps)
        st = self.spoken_lm.generate_stream_chunk(
            st, self._cb(), sampler_cfg, tables, jd_first_chunk)
        words = jnp.minimum(st["n_taste"][0],
                            jnp.maximum(st["word_id_cur"][0], 0))
        jd_done = jnp.all(st["done"]) | (st["step"] >= max_steps)
        n_words = jnp.where(jd_done, st["n_taste"][0], words)
        taste = jnp.maximum(st["out_taste"], 0)
        asr_lens = jnp.sum((asr_word_ids < n_words) & asr_valid,
                           axis=1).astype(jnp.int32)
        rng_voc = jax.random.fold_in(jax.random.fold_in(rng_syn, 7919), 0)
        syn = self.stream_start_step(
            rng_syn, rng_voc, speaker_embeds, taste, asr_token_ids,
            asr_lens, asr_word_ids, max_speech_steps, first_chunk_tokens,
            first_chunk_tokens, mel_window_first, hist_pad)
        return {"jd_state": st, "syn": syn, "n_words": n_words,
                "jd_done": jd_done}

    def stream_extend_step(self, rng, rng_voc, speaker_embeds,
                           taste_indices_per_word, asr_token_ids,
                           asr_token_lengths, asr_word_ids,
                           token_hist, hist_len,
                           max_speech_steps: int, chunk_steps: int,
                           window: int, mel_window_max: int):
        """Fused pipelined-synthesis step: re-prefill the S3 decoder with
        EXTENDED text/taste conditioning, replay the committed speech-token
        history into the KV cache, decode the next chunk and vocode its
        window — ONE dispatch.  rng must be the SAME stream key as the
        initial stream_start_step so the decode rng stream continues
        coherently (split layout mirrors stream_synth_init)."""
        cb = self._cb()
        audio_unit_embeds = self.spoken_lm.get_audio_embeds_from_taste(
            cb, asr_token_lengths, asr_word_ids, taste_indices_per_word)
        rng_dec, _ = jax.random.split(rng)
        state = self.speech_decoder.generate_stream_resume(
            rng_dec, speaker_embeds, audio_unit_embeds, asr_token_lengths,
            asr_token_ids, asr_token_lengths, token_hist, hist_len,
            max_steps=max_speech_steps)
        return self.stream_step(state, rng_voc, speaker_embeds, token_hist,
                                hist_len, chunk_steps, window, mel_window_max)

    def stream_start_step(self, rng, rng_voc, speaker_embeds,
                          taste_indices_per_word, asr_token_ids,
                          asr_token_lengths, asr_word_ids,
                          max_speech_steps: int, chunk_steps: int,
                          window: int, mel_window_max: int,
                          hist_pad: int = 0):
        """stream_synth_init + the first fused stream_step in ONE dispatch:
        first audio leaves the device after a single program launch.

        `hist_pad`: when later chunks are LARGER than this first one (a
        small first chunk cuts TTFA), the on-device token history must
        leave room for their dynamic_update_slice — pass the steady-state
        chunk size."""
        state = self.stream_synth_init(
            rng, speaker_embeds, taste_indices_per_word, asr_token_ids,
            asr_token_lengths, asr_word_ids, max_speech_steps)
        b = speaker_embeds.shape[0]
        hist = jnp.zeros(
            (b, max_speech_steps + max(chunk_steps, hist_pad)), jnp.int32)
        return self.stream_step(state, rng_voc, speaker_embeds, hist,
                                jnp.int32(0), chunk_steps, window,
                                mel_window_max)
