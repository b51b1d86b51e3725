"""TASTE speech decoder: (taste units + text) -> S3 speech tokens.

Re-design of the reference CosyVoice-style TTS LM
(/root/reference/taste_speech/modeling_taste.py:214-543):

  text ids  -> embed(512) -> 3-block causal conformer -> affine -> 1024
  taste emb -> affine(512) -> 2-block causal conformer -> affine -> 1024
  fuse (softmax-weighted sum, init balanced)           -> fused [B,T,1024]
  lm input  = [sos | spk | fused(T) | task | speech-embeds(S)]   (ragged pack)
  7-block causal transformer -> head(4097) ; labels [IGN*(2+T) | s3 | EOS]

TPU-first differences from the reference:
* ragged packing is a fixed-shape gather (ops/segment.ragged_concat), not
  per-sample unpad/concat/pad loops (modeling_taste.py:400-433);
* autoregressive generation runs on a real per-layer KV cache
  (ConformerEncoder.decode_step) in a lax.while_loop — the reference
  re-forwards the full prefix every token (modeling_taste.py:1607-1616);
* EOS-rejection before min length = masking the EOS logit (equivalent
  renormalized distribution), so the sampler is branchless.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from taste_spokenlm_tpu.config import SpeechDecoderConfig
from taste_spokenlm_tpu.models.conformer import ConformerEncoder
from taste_spokenlm_tpu.ops.losses import IGNORE_ID, label_smoothing_ce, masked_accuracy
from taste_spokenlm_tpu.ops.masking import length_mask
from taste_spokenlm_tpu.ops.sampling import sample
from taste_spokenlm_tpu.ops.segment import ragged_concat


class TasteSpeechDecoder(nn.Module):
    config: SpeechDecoderConfig
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        self.text_embedding = nn.Embed(cfg.text_token_size,
                                       cfg.text_encoder_input_size,
                                       dtype=self.dtype)
        self.text_encoder = ConformerEncoder(cfg.text_encoder, dtype=self.dtype,
                                             remat=cfg.text_encoder.remat)
        self.text_encoder_affine_layer = nn.Dense(cfg.llm_input_size,
                                                  dtype=self.dtype)
        self.audio_embed_affine_layer = nn.Dense(cfg.text_encoder_input_size,
                                                 dtype=self.dtype)
        self.audio_token_encoder = ConformerEncoder(cfg.audio_encoder,
                                                    dtype=self.dtype,
                                                    remat=cfg.audio_encoder.remat)
        self.audio_token_encoder_affine_layer = nn.Dense(cfg.llm_input_size,
                                                         dtype=self.dtype)
        # fusion weights (softmax over [audio, text]; init balanced)
        # (/root/reference/taste_speech/modules_taste/fusion.py:95-155)
        init = {"balance": jnp.array([1.0, 1.0]),
                "zero_audio": jnp.array([-2.0, 2.0])}[self.config.fuse_weight_init_type]
        self.fuse_weights = self.param("fuse_weights", lambda key: init)
        if cfg.fuse_type == "concat_with_sep":
            # learned SEP embedding (fusion.py:49-52)
            self.sep_embed = self.param(
                "sep_embed",
                lambda key: jax.random.uniform(key, (cfg.llm_input_size,)) * 1e-5)
        # llm_embedding row 0 = sos/eos, row 1 = task id
        self.llm_embedding = nn.Embed(2, cfg.llm_input_size, dtype=self.dtype)
        self.llm = ConformerEncoder(cfg.llm, dtype=self.dtype,
                                    remat=cfg.llm.remat)
        # logits head rides the llm stack's serving quantization: it is
        # read once per AR step (fixed cost), so int8 halves its bytes
        from taste_spokenlm_tpu.ops.quantized import dense as _q_dense
        self.llm_decoder = _q_dense(cfg.speech_token_size + 1,
                                    cfg.llm.quantized_serving,
                                    dtype=self.dtype, name="llm_decoder")
        self.speech_embedding = nn.Embed(cfg.speech_token_size,
                                         cfg.llm_input_size, dtype=self.dtype)
        self.spk_embed_affine_layer = nn.Dense(cfg.llm_input_size,
                                               dtype=self.dtype)

    # ------------------------------------------------------------------

    def encode_text(self, asr_token_ids, asr_token_lengths):
        emb = self.text_embedding(asr_token_ids)
        enc = self.text_encoder(emb, asr_token_lengths)
        return self.text_encoder_affine_layer(enc)

    def encode_audio(self, audio_unit_embeds, audio_unit_lengths):
        x = self.audio_embed_affine_layer(audio_unit_embeds)
        enc = self.audio_token_encoder(x, audio_unit_lengths)
        return self.audio_token_encoder_affine_layer(enc)

    def fuse(self, audio_encoded, text_encoded, lengths=None):
        """TTS input fusion (fusion.py:12-155).  weighted_sum keeps the
        aligned length; concat variants pack [audio | (sep) | text] raggedly
        and DOUBLE the sequence length (callers then use the returned
        lengths)."""
        cfg = self.config
        if cfg.fuse_type == "weighted_sum":
            w = jax.nn.softmax(self.fuse_weights)
            if cfg.fuse_normalize:
                # parameter-free layer norm on each input (fusion.py:136-143)
                def _ln(x):
                    xf = x.astype(jnp.float32)
                    mu = jnp.mean(xf, axis=-1, keepdims=True)
                    var = jnp.var(xf, axis=-1, keepdims=True)
                    return ((xf - mu) * jax.lax.rsqrt(var + 1e-5)).astype(x.dtype)
                audio_encoded, text_encoded = _ln(audio_encoded), _ln(text_encoded)
            return w[0] * audio_encoded + w[1] * text_encoded, lengths
        if cfg.fuse_type in ("concat", "concat_with_sep"):
            t = audio_encoded.shape[1]
            segments = [(audio_encoded, lengths)]
            if cfg.fuse_type == "concat_with_sep":
                b = audio_encoded.shape[0]
                sep = jnp.tile(self.sep_embed[None, None, :], (b, 1, 1))
                segments.append((sep.astype(audio_encoded.dtype), None))
            segments.append((text_encoded, lengths))
            out_len = 2 * t + (1 if cfg.fuse_type == "concat_with_sep" else 0)
            return ragged_concat(segments, out_len)
        raise NotImplementedError(cfg.fuse_type)

    def prepare_conditional_embeds(
        self, speaker_embeds, audio_unit_embeds, audio_unit_lengths,
        asr_token_ids, asr_token_lengths, skip_audio: bool = False,
    ):
        """Returns (sos [B,1,C], spk [B,1,C], fused [B,Tf,C], task [B,1,C],
        fused_lengths [B])."""
        b = asr_token_ids.shape[0]
        spk = speaker_embeds / jnp.maximum(
            jnp.linalg.norm(speaker_embeds, axis=-1, keepdims=True), 1e-8)
        spk = self.spk_embed_affine_layer(spk.astype(self.dtype))[:, None, :]
        text_enc = self.encode_text(asr_token_ids, asr_token_lengths)
        fused_lengths = asr_token_lengths
        if skip_audio:
            fused = text_enc
        else:
            audio_enc = self.encode_audio(audio_unit_embeds, audio_unit_lengths)
            fused, fused_lengths = self.fuse(audio_enc, text_enc,
                                             asr_token_lengths)
        sos = jnp.tile(self.llm_embedding(jnp.array([0]))[None], (b, 1, 1))
        task = jnp.tile(self.llm_embedding(jnp.array([1]))[None], (b, 1, 1))
        return sos, spk, fused, task, fused_lengths

    # ------------------------------------------------------------------
    # training forward
    # ------------------------------------------------------------------

    def __call__(
        self,
        speaker_embeds: jnp.ndarray,       # [B, spk_dim]
        audio_unit_embeds: jnp.ndarray,    # [B, T, audio_dim]
        audio_unit_lengths: jnp.ndarray,   # [B]
        asr_token_ids: jnp.ndarray,        # [B, T]
        asr_token_lengths: jnp.ndarray,    # [B]
        speech_token_ids: jnp.ndarray,     # [B, S]
        speech_token_lengths: jnp.ndarray, # [B]
        skip_audio: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        cfg = self.config
        b, t = asr_token_ids.shape
        s = speech_token_ids.shape[1]
        sos, spk, fused, task, fused_lengths = self.prepare_conditional_embeds(
            speaker_embeds, audio_unit_embeds, audio_unit_lengths,
            asr_token_ids, asr_token_lengths, skip_audio)
        speech_emb = self.speech_embedding(speech_token_ids)

        tf = fused.shape[1]
        out_len = 3 + tf + s
        lm_input, lm_len = ragged_concat(
            [(sos, None), (spk, None), (fused, fused_lengths),
             (task, None), (speech_emb, speech_token_lengths)], out_len)

        ign = jnp.full((b, 2 + tf), IGNORE_ID, jnp.int32)
        # zero-length rows (epoch-tail padding, scripts/train._pad_batch)
        # carry no targets at all — not even the EOS
        eos = jnp.where((speech_token_lengths > 0)[:, None],
                        cfg.speech_token_size, IGNORE_ID).astype(jnp.int32)
        lm_target, _ = ragged_concat(
            [(ign, fused_lengths + 2),
             (speech_token_ids.astype(jnp.int32), speech_token_lengths),
             (eos, None)], out_len, pad_value=IGNORE_ID)

        lm_out = self.llm(lm_input, lm_len)
        logits = self.llm_decoder(lm_out)
        loss = label_smoothing_ce(
            logits, lm_target, smoothing=cfg.lsm_weight,
            normalize_length=cfg.length_normalized_loss)
        acc = masked_accuracy(logits, lm_target)
        return {"loss": loss, "logits": logits, "labels": lm_target,
                "speech_token_accuracy": acc}

    # ------------------------------------------------------------------
    # autoregressive generation (KV-cached)
    # ------------------------------------------------------------------

    def generate_stream_init(
        self,
        rng: jax.Array,
        speaker_embeds, audio_unit_embeds, audio_unit_lengths,
        asr_token_ids, asr_token_lengths,
        max_steps: int = 512,
        min_token_text_ratio: float = 2.0,
        max_token_text_ratio: float = 20.0,
        skip_audio: bool = False,
    ) -> Dict[str, Any]:
        """Pack + prefill the AR decode and return a functional stream
        state; drive with `generate_stream_chunk`.  Chunked decoding
        reproduces the one-shot `generate` trajectory EXACTLY (same rng
        splits per step) — the streaming-synthesis building block
        (reference counterpart: the chunk machinery in
        cosyvoice/encoder.py:183-271 that the reference never uses
        end-to-end)."""
        cfg = self.config
        b, t = asr_token_ids.shape
        sos, spk, fused, task, fused_lengths = self.prepare_conditional_embeds(
            speaker_embeds, audio_unit_embeds, audio_unit_lengths,
            asr_token_ids, asr_token_lengths, skip_audio)

        prefix_max = 3 + fused.shape[1]
        # right-aligned (left-padded) packing: reverse, pack, reverse
        packed, prefix_len = ragged_concat(
            [(sos, None), (spk, None), (fused, fused_lengths),
             (task, None)], prefix_max)
        shift = prefix_max - prefix_len                      # [B]
        pos = jnp.arange(prefix_max)[None, :]
        src = jnp.clip(pos - shift[:, None], 0, prefix_max - 1)
        prefix = jnp.take_along_axis(packed, src[:, :, None], axis=1)
        prefix_valid = pos >= shift[:, None]                 # [B, P]
        prefix = jnp.where(prefix_valid[:, :, None], prefix, 0.0)

        total = prefix_max + max_steps
        caches = self.llm.init_cache(b, total)
        key_valid = jnp.concatenate(
            [prefix_valid, jnp.ones((b, max_steps), bool)], axis=1)
        # rel-pos projections computed ONCE for the whole decode session
        pos_projs = self.llm.precompute_pos_projs(total)

        # prefill
        lm_out, caches = self.llm.decode_step(
            prefix, caches, jnp.int32(0),
            key_valid=key_valid[:, None, None, :], pos_projs=pos_projs)
        last_hidden = lm_out[:, -1]

        min_len = (prefix_len.astype(jnp.float32)
                   * min_token_text_ratio).astype(jnp.int32)
        max_len = jnp.minimum(
            (prefix_len.astype(jnp.float32)
             * max_token_text_ratio).astype(jnp.int32), max_steps)
        return {
            "step": jnp.int32(0),
            "rng": rng,
            "caches": caches,
            "hidden": last_hidden,
            "done": jnp.zeros((b,), bool),
            "key_valid": key_valid,
            "min_len": min_len,
            "max_len": max_len,
            "prefix_max": jnp.int32(prefix_max),
            "pos_projs": pos_projs,
        }

    def generate_stream_chunk(
        self, state: Dict[str, Any], chunk_steps: int,
        sampling_k: int = 25,
    ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
        """Decode up to `chunk_steps` tokens from a stream state.

        Returns (tokens [B, chunk_steps] with -1 after EOS, new state).
        Exits early when every row is done."""
        cfg = self.config
        b = state["hidden"].shape[0]
        key_valid = state["key_valid"]
        prefix_max = state["prefix_max"]
        min_len, max_len = state["min_len"], state["max_len"]

        class Chunk(NamedTuple):
            i: jnp.ndarray             # local step in this chunk
            step: jnp.ndarray          # global decode step
            rng: jax.Array
            caches: Any
            hidden: jnp.ndarray        # [B, C] last LM hidden
            tokens: jnp.ndarray        # [B, chunk_steps]
            done: jnp.ndarray          # [B]

        init = Chunk(jnp.int32(0), state["step"], state["rng"],
                     state["caches"], state["hidden"],
                     jnp.full((b, chunk_steps), -1, jnp.int32),
                     state["done"])

        def cond(mdl, st: Chunk):
            return jnp.logical_and(st.i < chunk_steps, ~jnp.all(st.done))

        def body(mdl, st: Chunk):
            rng, sub = jax.random.split(st.rng)
            logits = mdl.llm_decoder(st.hidden).astype(jnp.float32)  # [B, V+1]
            forbid = st.step < min_len
            ids = sample(sub, logits, top_k=sampling_k,
                         forbid_eos=forbid, eos_id=cfg.speech_token_size)
            is_eos = ids == cfg.speech_token_size
            over = st.step >= max_len
            emit = jnp.where(st.done | is_eos | over, -1, ids)
            tokens = st.tokens.at[:, st.i].set(emit)
            newly_done = st.done | is_eos | over

            emb = mdl.speech_embedding(jnp.maximum(ids, 0) %
                                       cfg.speech_token_size)[:, None, :]
            lm_out, caches = mdl.llm.decode_step(
                emb, st.caches, prefix_max + st.step,
                key_valid=key_valid[:, None, None, :],
                pos_projs=state["pos_projs"])
            return Chunk(st.i + 1, st.step + 1, rng, caches, lm_out[:, 0],
                         tokens, newly_done)

        final = nn.while_loop(cond, body, self, init)
        new_state = dict(state, step=final.step, rng=final.rng,
                         caches=final.caches, hidden=final.hidden,
                         done=final.done)
        return final.tokens, new_state

    def generate_stream_resume(
        self,
        rng: jax.Array,
        speaker_embeds, audio_unit_embeds, audio_unit_lengths,
        asr_token_ids, asr_token_lengths,
        hist_tokens: jnp.ndarray,          # [B, >=max_steps] committed ids
        hist_len: jnp.ndarray,             # scalar int32 (shared across B)
        max_steps: int = 512,
        min_token_text_ratio: float = 2.0,
        max_token_text_ratio: float = 20.0,
        skip_audio: bool = False,
    ) -> Dict[str, Any]:
        """Re-prefill with (possibly EXTENDED) text/taste conditioning and
        REPLAY a committed speech-token history into the KV cache; returns
        a stream state positioned at step=hist_len, ready for
        `generate_stream_chunk`.

        This is the building block of pipelined completion streaming
        (frontend.streaming.CompletionStreamer): the joint LM is still
        decoding text while the first audio plays, and each time more text
        arrives the S3 decoder re-contextualizes — new prefix prefill + one
        multi-token cached replay of the already-played speech tokens
        (positions are unchanged because the prefix is packed left-padded
        into a fixed `prefix_max` budget).  With the SAME text, resume +
        chunk reproduces the uninterrupted stream trajectory exactly: the
        replayed KV rows equal the step-by-step rows, and the rng is
        fast-forwarded by `hist_len` splits (one split per executed decode
        step; exact for B=1 or any batch where no row finished early —
        a finished row would have stopped contributing steps).

        The reference has no counterpart: its generation loop requires the
        full text upfront (modeling_taste.py:1561-1661)."""
        cfg = self.config
        state = self.generate_stream_init(
            rng, speaker_embeds, audio_unit_embeds, audio_unit_lengths,
            asr_token_ids, asr_token_lengths, max_steps=max_steps,
            min_token_text_ratio=min_token_text_ratio,
            max_token_text_ratio=max_token_text_ratio, skip_audio=skip_audio)
        b = hist_tokens.shape[0]
        hist = hist_tokens[:, :max_steps]
        hist_len = jnp.asarray(hist_len, jnp.int32)
        # ONE causal multi-token cached decode writes the whole history's
        # K/V; rows past hist_len write garbage into their slots, but
        # decode_step masks keys by absolute position (key_pos <= q_pos),
        # and each subsequent AR step overwrites its own slot first
        emb = self.speech_embedding(
            jnp.clip(hist, 0, cfg.speech_token_size - 1))
        lm_out, caches = self.llm.decode_step(
            emb, state["caches"], state["prefix_max"],
            key_valid=state["key_valid"][:, None, None, :],
            pos_projs=state["pos_projs"])
        # hidden after the LAST committed token (the prefill hidden when
        # hist_len == 0)
        idx = jnp.full((b, 1, 1), jnp.maximum(hist_len - 1, 0))
        last = jnp.take_along_axis(lm_out, idx, axis=1)[:, 0]
        hidden = jnp.where(hist_len > 0, last, state["hidden"])
        rng_fwd = jax.lax.fori_loop(
            0, hist_len, lambda i, k: jax.random.split(k)[0], state["rng"])
        return dict(state, caches=caches, hidden=hidden, rng=rng_fwd,
                    step=hist_len)

    def generate(
        self,
        rng: jax.Array,
        speaker_embeds, audio_unit_embeds, audio_unit_lengths,
        asr_token_ids, asr_token_lengths,
        max_steps: int = 512,
        sampling_k: int = 25,
        min_token_text_ratio: float = 2.0,
        max_token_text_ratio: float = 20.0,
        skip_audio: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        """Batched AR decode.  Prefix is packed LEFT-padded so all samples
        share a global position index; per-sample min/max lengths follow the
        reference ratios (modeling_taste.py:1595-1600).

        One-shot wrapper over the stream API (init + one full-budget
        chunk — identical trajectory by construction).  Returns
        speech_token_ids [B, max_steps] (EOS-and-after = -1) and
        speech_token_lengths [B]."""
        state = self.generate_stream_init(
            rng, speaker_embeds, audio_unit_embeds, audio_unit_lengths,
            asr_token_ids, asr_token_lengths, max_steps=max_steps,
            min_token_text_ratio=min_token_text_ratio,
            max_token_text_ratio=max_token_text_ratio, skip_audio=skip_audio)
        tokens, _ = self.generate_stream_chunk(state, max_steps,
                                               sampling_k=sampling_k)
        lengths = jnp.sum(tokens >= 0, axis=1)
        return {"speech_token_ids": tokens,
                "speech_token_lengths": lengths}
