"""TasteSpokenLM: joint text+taste autoregressive LM (Llama + bridges).

Re-design of /root/reference/taste_speech/modeling_taste.py:546-1206 for TPU:

* the per-sample Python word-delay construction (`_prepare_single`,
  :715-857) is replaced by fully batched tensor ops: word-start masks,
  word-start-position tables and a `delay`-word shift, all as gathers under
  fixed shapes (SURVEY.md §7 step 7c);
* generation is a KV-cached `lax.while_loop` over single tokens with the
  TasteSampler state machine expressed as pure state (models/sampler.py) —
  the reference re-runs the full llama forward over the whole prefix per
  token with no cache (:1112-1117);
* losses: text CE (+ optional 0.9KL/0.1CE against a frozen base model,
  :968-975) and, for the default continue-latent bridge, the
  0.5*MSE + 0.5*KL latent regularization (:859-905).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from taste_spokenlm_tpu.config import SpokenLMConfig
from taste_spokenlm_tpu.models.bridges import (BRIDGE_EXTRACT_CLASSES,
                                               BRIDGE_FUSION_CLASSES)
from taste_spokenlm_tpu.models.llama import LlamaModel
from taste_spokenlm_tpu.models.quantizer import (Codebook, codebook_code_from_indices, codebook_output_from_indices)
from taste_spokenlm_tpu.models.sampler import (SamplerConfig, SamplerState,
                                               StepOutput, init_state,
                                               sampler_step)
from taste_spokenlm_tpu.ops.losses import (IGNORE_ID, chunked_ce_kl,
                                           kl_to_reference)
from taste_spokenlm_tpu.ops.masking import length_mask
from taste_spokenlm_tpu.ops.segment import ragged_concat, word_start_mask


def fill_forward_indices(indices: jnp.ndarray) -> jnp.ndarray:
    """[B, T, L]: replace rows that are all -1 by the last previous valid row
    (reference `_fill_indices_forward`, modeling_taste.py:659-669).  Rows
    before the first valid row keep -1."""
    b, t, l = indices.shape
    valid = jnp.all(indices != IGNORE_ID, axis=-1)            # [B, T]
    pos = jnp.where(valid, jnp.arange(t)[None, :], -1)
    cummax = jax.lax.associative_scan(jnp.maximum, pos, axis=1)
    src = jnp.maximum(cummax, 0)
    filled = jnp.take_along_axis(indices, src[:, :, None], axis=1)
    return jnp.where((cummax >= 0)[:, :, None], filled, IGNORE_ID)


def word_start_positions(word_ids: jnp.ndarray, lengths: jnp.ndarray
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[B, T] word ids -> (start_pos [B, T] position of word w's first token
    (0 where w >= word count), word_count [B])."""
    b, t = word_ids.shape
    ws = word_start_mask(word_ids, lengths)                   # [B, T]
    onehot = (word_ids[:, :, None] == jnp.arange(t)[None, None, :])
    onehot = onehot & ws[:, :, None]
    start_pos = jnp.einsum("btw,t->bw", onehot.astype(jnp.int32),
                           jnp.arange(t, dtype=jnp.int32))
    return start_pos, jnp.sum(ws, axis=1)


class TasteSpokenLM(nn.Module):
    config: SpokenLMConfig
    audio_dim: int = 1280
    taste_k: int = 512
    taste_d: int = 256
    taste_l: int = 4
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        self.language_model = LlamaModel(
            cfg.llama, lora=cfg.lora if cfg.use_lora else None,
            dtype=self.dtype, remat=cfg.llama.remat, name="language_model")
        self.fuse_for_bridge_in_llm = BRIDGE_FUSION_CLASSES[cfg.in_llm_module](
            llm_dim=cfg.llama.hidden_size, dtype=self.dtype)
        extract_cls = BRIDGE_EXTRACT_CLASSES[cfg.out_llm_module]
        if cfg.out_llm_module == "reference_mix":
            kwargs = dict(dtype=self.dtype)
        else:
            kwargs = dict(k=self.taste_k, dtype=self.dtype)
            if "continue_latent" in cfg.out_llm_module:
                kwargs.update(d=self.taste_d)
                if "weighted_layer" in cfg.out_llm_module:
                    kwargs.update(num_layers=cfg.llama.num_hidden_layers + 1)
            elif cfg.out_llm_module == "continue_weighted_layer":
                kwargs.update(d=self.taste_d,
                              num_layers=cfg.llama.num_hidden_layers + 1)
            elif cfg.out_llm_module == "weighted_layer":
                kwargs.update(l=self.taste_l,
                              num_layers=cfg.llama.num_hidden_layers + 1)
            else:
                kwargs.update(l=self.taste_l)
                if cfg.out_llm_module == "multi_linear_last":
                    kwargs.update(d=self.taste_d)
        self.extract_for_bridge_out_llm = extract_cls(**kwargs)

        if cfg.delay > 0:
            self.pad_text_unit_embed = self.param(
                "pad_text_unit_embed", nn.initializers.zeros,
                (cfg.llama.hidden_size,))
        # the audio pad embed also fills pre-first-valid rows in fill_forward
        self.pad_audio_unit_embed = self.param(
            "pad_audio_unit_embed", nn.initializers.zeros, (self.audio_dim,))
        mode = cfg.audio_embed_conv_mode
        if mode in ("pad", "embed_a0_only", "get_codes_from_indices"):
            self.empty_audio_unit_embed = self.param(
                "empty_audio_unit_embed", nn.initializers.zeros,
                (self.audio_dim,))
        if mode == "embed_a0_only":
            self.a0_embedding = nn.Embed(self.taste_k, self.audio_dim,
                                         dtype=self.dtype, name="a0_embedding")
        if mode == "get_codes_from_indices":
            self.code_linear = nn.Dense(self.audio_dim, dtype=self.dtype,
                                        name="code_linear")

        # latent heads only: plain `continue_weighted_layer` emits hard
        # one-hot logits with no (z, mu, logvar), so it takes the CE branch
        # (the reference keys on 'continue_' and crashes there,
        # modeling_taste.py:609,977-980)
        self.do_continue = "continue_latent" in cfg.out_llm_module
        self.do_multihead = "multi_" in cfg.out_llm_module

    # ------------------------------------------------------------------
    # audio-index -> embedding conversion (modeling_taste.py:671-713)
    # ------------------------------------------------------------------

    def encode_audio(self, llm_indices: jnp.ndarray, cb: Codebook) -> jnp.ndarray:
        mode = self.config.audio_embed_conv_mode
        if mode == "fill_forward":
            filled = fill_forward_indices(llm_indices)
            emb = codebook_output_from_indices(cb, jnp.maximum(filled, 0))
            has_valid = filled[..., 0] >= 0
            return jnp.where(has_valid[..., None], emb,
                             self.pad_audio_unit_embed[None, None, :])
        valid = jnp.all(llm_indices >= 0, axis=-1)        # [B, T]
        zeroed = jnp.maximum(llm_indices, 0)
        if mode == "pad":
            emb = codebook_output_from_indices(cb, zeroed)
        elif mode == "embed_a0_only":
            valid = llm_indices[..., 0] >= 0
            emb = self.a0_embedding(jnp.maximum(llm_indices[..., 0], 0))
        elif mode == "get_codes_from_indices":
            # sum the per-level codebook-space codes, then a learned
            # projection (modeling_taste.py:700-706)
            code = codebook_code_from_indices(cb, zeroed)
            emb = self.code_linear(code.astype(self.dtype))
        else:
            raise NotImplementedError(mode)
        return jnp.where(valid[..., None], emb,
                         self.empty_audio_unit_embed[None, None, :])

    # ------------------------------------------------------------------
    # batched word-delay construction (modeling_taste.py:715-857)
    # ------------------------------------------------------------------

    def prepare_conditional_embeds(
        self,
        cb: Codebook,
        llm_indices: jnp.ndarray,      # [B, T, L]
        llm_token_ids: jnp.ndarray,    # [B, T]
        llm_token_lengths: jnp.ndarray,# [B]
        llm_word_ids: jnp.ndarray,     # [B, T]
    ):
        """Returns (inputs_embeds [B, 1+T+D, H], output_lengths [B],
        taste_labels [B, 1+T+D, L], delayed_audio_embeds [B, T+D, Adim])."""
        cfg = self.config
        d = cfg.delay
        b, t = llm_token_ids.shape
        l = llm_indices.shape[-1]
        embed_tokens = self.language_model.embed_tokens

        if d == 0:
            # no delay (modeling_taste.py:722-738): inputs = sos + fused
            # (tokens[:-1], taste[:-1]); labels = the unshifted indices
            text_emb = embed_tokens(llm_token_ids[:, :-1]).astype(self.dtype)
            audio_emb = self.encode_audio(llm_indices[:, :-1], cb)
            fused = self.fuse_for_bridge_in_llm(text_emb,
                                                audio_emb.astype(self.dtype))
            sos = embed_tokens(jnp.full((b, 1), cfg.sos_id)).astype(self.dtype)
            inputs_embeds = jnp.concatenate([sos, fused], axis=1)   # [B, T]
            valid_t = length_mask(llm_token_lengths, t)
            taste_labels = jnp.where(valid_t[:, :, None],
                                     llm_indices.astype(jnp.int32), IGNORE_ID)
            return inputs_embeds, llm_token_lengths, taste_labels, audio_emb

        if cfg.delay_level == "token":
            # token delay (modeling_taste.py:740-748): text gets d pad rows
            # appended, audio gets d pad rows prepended; labels are the
            # indices shifted right by d
            text_emb = embed_tokens(llm_token_ids).astype(self.dtype)
            pad_text = jnp.tile(
                self.pad_text_unit_embed[None, None, :].astype(self.dtype),
                (b, d, 1))
            text_stream, _ = ragged_concat(
                [(text_emb, llm_token_lengths), (pad_text, None)], t + d)
            audio_emb = self.encode_audio(llm_indices, cb)
            pad_audio = jnp.tile(
                self.pad_audio_unit_embed[None, None, :].astype(audio_emb.dtype),
                (b, d, 1))
            audio_stream, _ = ragged_concat(
                [(pad_audio, None), (audio_emb, llm_token_lengths)], t + d)
            fused = self.fuse_for_bridge_in_llm(text_stream,
                                                audio_stream.astype(self.dtype))
            sos = embed_tokens(jnp.full((b, 1), cfg.sos_id)).astype(self.dtype)
            inputs_embeds = jnp.concatenate([sos, fused], axis=1)
            output_lengths = llm_token_lengths + d + 1
            ign_d = jnp.full((b, d, l), IGNORE_ID, jnp.int32)
            ign_1 = jnp.full((b, 1, l), IGNORE_ID, jnp.int32)
            taste_labels, _ = ragged_concat(
                [(ign_d, None), (llm_indices.astype(jnp.int32),
                                 llm_token_lengths), (ign_1, None)],
                1 + t + d, pad_value=IGNORE_ID)
            return inputs_embeds, output_lengths, taste_labels, audio_stream

        assert cfg.delay_level == "word", cfg.delay_level

        ws = word_start_mask(llm_word_ids, llm_token_lengths)   # [B, T]
        start_pos, word_count = word_start_positions(llm_word_ids,
                                                     llm_token_lengths)

        # delayed_pre[b, p] = indices of word (word_id[p] - d) if p is a
        # word start of a word >= d, else IGNORE
        wp = llm_word_ids.astype(jnp.int32)
        src_word = wp - d
        src_ok = jnp.logical_and(ws, src_word >= 0)
        src_tok = jnp.take_along_axis(start_pos, jnp.maximum(src_word, 0), axis=1)
        gathered = jnp.take_along_axis(llm_indices, src_tok[:, :, None], axis=1)
        delayed_pre = jnp.where(src_ok[:, :, None], gathered, IGNORE_ID)
        # mask positions beyond valid length
        valid_t = length_mask(llm_token_lengths, t)
        delayed_pre = jnp.where(valid_t[:, :, None], delayed_pre, IGNORE_ID)

        # post rows: words W-d .. W-1 appended after position T_i
        wi = word_count[:, None] - d + jnp.arange(d)[None, :]   # [B, D]
        post_ok = wi >= 0
        post_tok = jnp.take_along_axis(start_pos, jnp.maximum(wi, 0), axis=1)
        post = jnp.take_along_axis(llm_indices, post_tok[:, :, None], axis=1)
        post = jnp.where(post_ok[:, :, None], post, IGNORE_ID)

        # audio embeds: fill-forward over the delayed stream, pad embed
        # before the first valid row; post rows likewise
        emb_pre = self.encode_audio(delayed_pre, cb)            # [B, T, A]
        emb_post = self.encode_audio(post, cb)                  # [B, D, A]
        # positions before the first delayed word-start take the PAD embed
        # in every conversion mode (the reference prepends
        # pad_audio_unit_embed rows up to start_x, modeling_taste.py:800-806,
        # so its encode_audio never sees this region; fill_forward already
        # does this inside encode_audio)
        if cfg.audio_embed_conv_mode != "fill_forward":
            before_start = jnp.cumsum(src_ok.astype(jnp.int32), axis=1) == 0
            emb_pre = jnp.where(
                before_start[:, :, None],
                self.pad_audio_unit_embed[None, None, :].astype(emb_pre.dtype),
                emb_pre)

        audio_stream, _ = ragged_concat(
            [(emb_pre, llm_token_lengths), (emb_post, None)], t + d)
        text_emb = embed_tokens(llm_token_ids).astype(self.dtype)
        pad_text = jnp.tile(
            self.pad_text_unit_embed[None, None, :].astype(self.dtype),
            (b, d, 1))
        text_stream, _ = ragged_concat(
            [(text_emb, llm_token_lengths), (pad_text, None)], t + d)

        fused = self.fuse_for_bridge_in_llm(text_stream,
                                            audio_stream.astype(self.dtype))
        sos = embed_tokens(jnp.full((b, 1), cfg.sos_id)).astype(self.dtype)
        inputs_embeds = jnp.concatenate([sos, fused], axis=1)   # [B, 1+T+D, H]
        output_lengths = llm_token_lengths + d + 1

        ign_tail = jnp.full((b, 1, l), IGNORE_ID, jnp.int32)
        taste_labels_flat, _ = ragged_concat(
            [(delayed_pre.astype(jnp.int32), llm_token_lengths),
             (post.astype(jnp.int32), None),
             (ign_tail.reshape(b, 1, l), None)], 1 + t + d,
            pad_value=IGNORE_ID)
        taste_labels = taste_labels_flat
        return inputs_embeds, output_lengths, taste_labels, audio_stream

    # ------------------------------------------------------------------
    # training forward (modeling_taste.py:922-1004)
    # ------------------------------------------------------------------

    def __call__(
        self,
        cb: Codebook,
        llm_indices: jnp.ndarray,
        llm_token_ids: jnp.ndarray,
        llm_token_lengths: jnp.ndarray,
        llm_word_ids: jnp.ndarray,
        train: bool = False,
        rng: Optional[jax.Array] = None,
        ref_logits: Optional[jnp.ndarray] = None,  # frozen-base logits for KL
        compute_ref_kl: bool = False,  # compute ref_logits in-graph
        return_text_logits: bool = True,
        ce_chunk_size: int = 64,
    ) -> Dict[str, jnp.ndarray]:
        """`return_text_logits=False` is the memory-lean TRAINING path: the
        full-vocab [B, T, V] text logits (and the frozen-base KL logits)
        are never materialized — CE+KL run per time-chunk
        (ops/losses.chunked_ce_kl); eval keeps the default and gets
        logits for accuracy metrics."""
        cfg = self.config
        b, t = llm_token_ids.shape
        inputs_embeds, output_lengths, taste_labels, _ = \
            self.prepare_conditional_embeds(
                cb, llm_indices, llm_token_ids, llm_token_lengths, llm_word_ids)

        ref_hidden = None
        if compute_ref_kl and ref_logits is None:
            # frozen-base forward: the plain text stream [sos|tokens] through
            # the backbone with adapters disabled (the reference runs a frozen
            # ref model on exactly these ids, modeling_taste.py:864-871).
            # Requires use_lora — with LoRA the base weights are frozen by the
            # optimizer mask, so disabling the adapters recovers the original
            # model at zero memory cost.
            ref_ids = jnp.concatenate(
                [jnp.full((b, 1), cfg.sos_id, llm_token_ids.dtype),
                 llm_token_ids], axis=1)
            ref_out = self.language_model(
                input_ids=ref_ids, attention_lengths=llm_token_lengths + 1,
                disable_lora=True)
            if return_text_logits:
                ref_logits = jax.lax.stop_gradient(
                    self.language_model.logits(ref_out["last_hidden"]))
            else:
                ref_hidden = jax.lax.stop_gradient(ref_out["last_hidden"])

        out = self.language_model(
            inputs_embeds=inputs_embeds, attention_lengths=output_lengths,
            output_hidden_states=True)
        taste_logits, info = self.extract_for_bridge_out_llm(
            out["last_hidden"], out["hidden_states"], cb, train=train, rng=rng)

        # text labels: next-token targets (sos-shifted), IGNORE beyond T_i
        total = inputs_embeds.shape[1]
        pos = jnp.arange(total)[None, :]
        padded_ids = jnp.pad(llm_token_ids, ((0, 0), (0, total - t)),
                             constant_values=0)
        text_labels = jnp.where(
            pos < llm_token_lengths[:, None], padded_ids, IGNORE_ID)

        result = {"text_labels": text_labels,
                  "taste_logits": taste_logits, "taste_labels": taste_labels,
                  "output_lengths": output_lengths}

        # ---- losses ----
        w = [float(x) for x in cfg.loss_weights.split("-")]
        valid = text_labels != IGNORE_ID
        if not return_text_logits:
            # chunked CE (+KL): every text label position sits inside the
            # ref's [sos|tokens] span, so padding ref_hidden to `total`
            # only touches masked positions.  A precomputed batch
            # ref_logits (extract_vq pipeline) feeds the KL directly.
            if ref_hidden is not None:
                ref_hidden = jnp.pad(
                    ref_hidden, ((0, 0), (0, total - ref_hidden.shape[1]),
                                 (0, 0)))
            text_ce, kl = chunked_ce_kl(
                self.language_model.logits, out["last_hidden"], text_labels,
                ref_hidden=ref_hidden, ref_logits=ref_logits,
                chunk_size=ce_chunk_size)
            if kl is not None:
                text_loss = (cfg.text_kl_weight * kl
                             + (1.0 - cfg.text_kl_weight) * text_ce)
                result["text_kl"] = kl
            else:
                text_loss = text_ce
        else:
            text_logits = self.language_model.logits(out["last_hidden"])
            result["text_logits"] = text_logits
            logp = jax.nn.log_softmax(text_logits.astype(jnp.float32), -1)
            nll = -jnp.take_along_axis(
                logp, jnp.maximum(text_labels, 0)[..., None], axis=-1)[..., 0]
            text_ce = jnp.sum(jnp.where(valid, nll, 0.0)) / jnp.maximum(
                jnp.sum(valid), 1)
            if ref_logits is not None:
                kl = kl_to_reference(text_logits[:, :ref_logits.shape[1]],
                                     ref_logits, valid[:, :ref_logits.shape[1]])
                text_loss = (cfg.text_kl_weight * kl
                             + (1.0 - cfg.text_kl_weight) * text_ce)
                result["text_kl"] = kl
            else:
                text_loss = text_ce

        taste_valid = jnp.all(taste_labels != IGNORE_ID, axis=-1)
        if self.do_continue:
            z, mu, logvar = info["z"], info["mu"], info["logvar"]
            target_code = codebook_code_from_indices(
                cb, jnp.maximum(taste_labels, 0))
            maskf = taste_valid[..., None].astype(jnp.float32)
            denom = jnp.maximum(jnp.sum(maskf) * self.taste_d, 1.0)
            l_reg = jnp.sum((z - target_code) ** 2 * maskf) / denom
            l_kl = 0.5 * (jnp.sum(
                jnp.mean(jnp.exp(logvar) + (mu - target_code) ** 2 - 1 - logvar,
                         axis=-1) * taste_valid) /
                jnp.maximum(jnp.sum(taste_valid), 1.0))
            taste_loss = 0.5 * l_reg + 0.5 * l_kl
        else:
            # per-level CE averaged (modeling_taste.py:908-919)
            logp_t = jax.nn.log_softmax(taste_logits.astype(jnp.float32), -1)
            tl = jnp.maximum(taste_labels, 0)
            nll_t = -jnp.take_along_axis(logp_t, tl[..., None], axis=-1)[..., 0]
            per_level_valid = taste_labels != IGNORE_ID
            taste_loss = jnp.sum(jnp.where(per_level_valid, nll_t, 0.0)) / \
                jnp.maximum(jnp.sum(per_level_valid), 1)

        result["text_loss"] = text_loss
        result["taste_loss"] = taste_loss
        result["loss"] = w[0] * text_loss + w[1] * taste_loss
        return result

    # ------------------------------------------------------------------
    # joint AR generation (modeling_taste.py:1030-1206)
    # ------------------------------------------------------------------

    def generate_stream_init(
        self,
        rng: jax.Array,
        cb: Codebook,
        llm_indices: Optional[jnp.ndarray] = None,      # [B, T, L]
        llm_token_ids: Optional[jnp.ndarray] = None,    # [B, T]
        llm_token_lengths: Optional[jnp.ndarray] = None,
        llm_word_ids: Optional[jnp.ndarray] = None,
        conditional_mode: str = "audio",
        max_steps: int = 256,
        instruct_prefix_ids: Optional[jnp.ndarray] = None,   # [P]
        instruct_suffix_ids: Optional[jnp.ndarray] = None,   # [S]
        batch_size: int = 1,   # used by 'zero' mode only (no input arrays)
    ) -> Dict[str, Any]:
        """Build the conditional prefix, prefill the KV cache and return a
        functional joint-decode stream state; drive with
        `generate_stream_chunk`.  Chunked decoding reproduces the one-shot
        `generate` trajectory EXACTLY (the chunk loop carries the same
        per-step rng splits and sampler state) — the building block of the
        pipelined completion stream (frontend.streaming.CompletionStreamer),
        where synthesis starts from the first decoded words instead of
        after the full decode."""
        cfg = self.config
        embed_tokens = self.language_model.embed_tokens
        d = cfg.delay
        t = llm_token_ids.shape[1] if llm_token_ids is not None else 0
        b = llm_token_ids.shape[0] if llm_token_ids is not None else batch_size

        # ---- build the conditional prefix (all [B, ...]) ----
        if conditional_mode == "audio":
            inputs_embeds, _, _, audio_stream = self.prepare_conditional_embeds(
                cb, llm_indices, llm_token_ids, llm_token_lengths, llm_word_ids)
            text_len = llm_token_lengths + 1                    # [B]
            # prefix embeds: positions [0, text_len_i) of [sos|fused]
            prefix_embeds = inputs_embeds                       # [B, 1+T+D, H]
            # pending audio embeds consumed at future word starts
            # (modeling_taste.py:1086: single_audio_embed[text_len-1:])
            pending = audio_stream                              # [B, T+D, A]
            pending_start = text_len - 1
            prefix_len = text_len
        elif conditional_mode == "text":
            prefix_embeds = embed_tokens(llm_token_ids).astype(self.dtype)
            pending = jnp.zeros((b, t + d, self.audio_dim), self.dtype)
            pending_start = jnp.zeros((b,), jnp.int32)
            prefix_len = llm_token_lengths
        elif conditional_mode == "zero":
            prefix_embeds = jnp.tile(
                embed_tokens(jnp.asarray([[cfg.sos_id]])).astype(self.dtype),
                (b, 1, 1))                                      # [B, 1, H]
            pending = jnp.zeros((b, 1 + d, self.audio_dim), self.dtype)
            pending_start = jnp.zeros((b,), jnp.int32)
            prefix_len = jnp.full((b,), 1, jnp.int32)
        elif conditional_mode == "instruct":
            # [instruct prefix | fused audio+text (sans sos) | suffix]
            # (modeling_taste.py:1089-1107); no pending audio, has_prefix
            # False, termination via SamplerConfig.stop_id
            inputs_embeds, _, _, _ = self.prepare_conditional_embeds(
                cb, llm_indices, llm_token_ids, llm_token_lengths, llm_word_ids)
            text_len = llm_token_lengths + 1
            pre = embed_tokens(instruct_prefix_ids).astype(self.dtype)
            suf = embed_tokens(instruct_suffix_ids).astype(self.dtype)
            fused = inputs_embeds[:, 1:1 + t]                   # drop sos
            prefix_embeds, _ = ragged_concat(
                [(jnp.tile(pre[None], (b, 1, 1)), None),
                 (fused, text_len - 1),
                 (jnp.tile(suf[None], (b, 1, 1)), None)],
                pre.shape[0] + t + suf.shape[0])
            prefix_len = pre.shape[0] + (text_len - 1) + suf.shape[0]
            pending = jnp.zeros((b, t + d, self.audio_dim), self.dtype)
            pending_start = jnp.zeros((b,), jnp.int32)
        else:
            raise NotImplementedError(conditional_mode)

        # Uniform cache layout: prefix rows live in slots [0, max_prefix)
        # (left-aligned, per-row valid length), generated token i in slot
        # max_prefix + i for EVERY row.  RoPE positions stay logical
        # (prefix_len_i + i) via per-row position offsets.
        max_prefix = prefix_embeds.shape[1]
        total = max_prefix + max_steps
        caches = self.language_model.init_cache(b, total)
        slot = jnp.arange(total)
        key_valid0 = slot[None, :] < prefix_len[:, None]        # [B, total]

        out0 = self.language_model(
            inputs_embeds=prefix_embeds, caches=caches,
            cache_index=jnp.int32(0), output_hidden_states=True,
            key_valid=key_valid0)

        def at_last_valid(h):   # [B, T, H] -> [B, H] at prefix_len-1
            idx = (prefix_len - 1)[:, None, None]
            return jnp.take_along_axis(h, idx, axis=1)[:, 0]

        last_h = at_last_valid(out0["last_hidden"])
        hs = tuple(at_last_valid(h) for h in out0["hidden_states"])
        caches = out0["caches"]

        sampler0 = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (b,) + x.shape),
            init_state(cfg.llama.vocab_size, d))
        if conditional_mode in ("text", "audio", "instruct"):
            # count prefix tokens for repetition penalty (the reference seeds
            # input_ids with the full prompt — in instruct mode that includes
            # the instruct prefix/suffix wrappers, modeling_taste.py:1101-1124)
            onehot = jax.nn.one_hot(llm_token_ids, cfg.llama.vocab_size,
                                    dtype=jnp.int32)              # [B, T, V]
            counts = jnp.sum(
                onehot * (jnp.arange(t)[None, :, None]
                          < llm_token_lengths[:, None, None]), axis=1)
            if conditional_mode == "instruct":
                for extra in (instruct_prefix_ids, instruct_suffix_ids):
                    counts = counts + jnp.sum(
                        jax.nn.one_hot(extra, cfg.llama.vocab_size,
                                       dtype=jnp.int32), axis=0)[None]
            sampler0 = sampler0._replace(token_counts=counts)

        return {
            "step": jnp.int32(0),
            "rng": rng,
            "caches": caches,
            "hidden": last_h,
            "all_hidden": hs,
            "sampler": sampler0,
            "last_audio_embed": jnp.zeros((b, self.audio_dim), jnp.float32),
            "pending_ptr": jnp.asarray(pending_start, jnp.int32),
            "out_tokens": jnp.full((b, max_steps), IGNORE_ID, jnp.int32),
            "out_taste": jnp.full((b, max_steps, self.taste_l), IGNORE_ID,
                                  jnp.int32),
            "out_words": jnp.full((b, max_steps), IGNORE_ID, jnp.int32),
            "n_out": jnp.zeros((b,), jnp.int32),
            "n_taste": jnp.zeros((b,), jnp.int32),
            "word_id_cur": jnp.full((b,), -1, jnp.int32),
            "done": jnp.zeros((b,), bool),
            # static decode context (carried as arrays so the state is one
            # jit-friendly pytree)
            "key_valid0": key_valid0,
            "prefix_len": prefix_len,
            "pending": pending,
            "max_prefix": jnp.int32(max_prefix),
        }

    def generate_stream_chunk(
        self,
        state: Dict[str, Any],
        cb: Codebook,
        sampler_cfg: SamplerConfig,
        tables: Dict[str, jnp.ndarray],
        chunk_steps: int,
    ) -> Dict[str, Any]:
        """Decode up to `chunk_steps` joint text+taste steps from a stream
        state; returns the updated state (out_tokens/out_taste/out_words
        accumulate across chunks, n_out/n_taste are the per-row totals so
        far).  Exits early when every row is done."""
        cfg = self.config
        embed_tokens = self.language_model.embed_tokens
        b = state["hidden"].shape[0]
        max_steps = state["out_tokens"].shape[1]
        key_valid0 = state["key_valid0"]
        prefix_len = state["prefix_len"]
        pending = state["pending"]
        max_prefix = state["max_prefix"]
        slot = jnp.arange(key_valid0.shape[1])

        class GenState(NamedTuple):
            i: jnp.ndarray                # local step within this chunk
            step: jnp.ndarray             # global decode step
            rng: jax.Array
            caches: Any
            hidden: jnp.ndarray           # [B, H] last hidden
            all_hidden: Any               # tuple of [B, H] per layer (bridge)
            sampler: SamplerState         # batched [B, ...]
            last_audio_embed: jnp.ndarray # [B, A] fill-forward audio embed
            pending_ptr: jnp.ndarray      # [B]
            out_tokens: jnp.ndarray       # [B, max_steps]
            out_taste: jnp.ndarray        # [B, max_steps, L] one row per WORD
            out_words: jnp.ndarray        # [B, max_steps] word id per token
            n_out: jnp.ndarray            # [B] emitted token count
            n_taste: jnp.ndarray          # [B] sampled taste-word count
            word_id_cur: jnp.ndarray      # [B]
            done: jnp.ndarray             # [B]

        gen0 = GenState(jnp.int32(0), state["step"], state["rng"],
                        state["caches"], state["hidden"], state["all_hidden"],
                        state["sampler"], state["last_audio_embed"],
                        state["pending_ptr"], state["out_tokens"],
                        state["out_taste"], state["out_words"],
                        state["n_out"], state["n_taste"],
                        state["word_id_cur"], state["done"])

        bi = jnp.arange(b)
        per_row_keys = jnp.ndim(state["rng"]) == 2  # [B, 2] key batch

        def cond(mdl, st):
            return jnp.logical_and(
                st.i < chunk_steps,
                jnp.logical_and(st.step < max_steps, ~jnp.all(st.done)))

        def body(mdl, st: GenState):
            if per_row_keys:
                # row i's stream = fold_in(its own key, step): independent of
                # cohort composition (per-request seed reproducibility)
                rng = st.rng
                subs = jax.vmap(
                    lambda k: jax.random.fold_in(k, st.step))(st.rng)
            else:
                rng, sub = jax.random.split(st.rng)
                # per-row streams independent of batch size (row i == fold_in i)
                subs = jax.vmap(lambda i: jax.random.fold_in(sub, i))(bi)
            text_logits = mdl.language_model.logits(st.hidden[:, None])[:, 0]
            taste_logits, _ = mdl.extract_for_bridge_out_llm(
                st.hidden[:, None].astype(jnp.float32),
                tuple(h[:, None] for h in st.all_hidden), cb)
            taste_logits = taste_logits[:, 0]                    # [B, L, K]

            sampler, step_out = jax.vmap(
                lambda r, s, tl, tsl: sampler_step(r, s, tl, tsl,
                                                   sampler_cfg, tables)
            )(subs, st.sampler, text_logits, taste_logits)

            # ---- record text/word outputs (per-row write cursors) ----
            emit = jnp.logical_and(step_out.emit_text, ~st.done)
            out_tokens = st.out_tokens.at[bi, st.n_out].set(
                jnp.where(emit, step_out.text_id,
                          st.out_tokens[bi, st.n_out]))
            word_id_cur = jnp.where(
                jnp.logical_and(emit, step_out.is_word_start),
                st.word_id_cur + 1, st.word_id_cur)
            out_words = st.out_words.at[bi, st.n_out].set(
                jnp.where(emit, word_id_cur, st.out_words[bi, st.n_out]))
            n_out = st.n_out + emit.astype(jnp.int32)

            # ---- record taste (one dense row per word, in order) ----
            do_taste = jnp.logical_and(step_out.taste_sample, ~st.done)
            out_taste = st.out_taste.at[bi, st.n_taste].set(
                jnp.where(do_taste[:, None], step_out.taste_ids,
                          st.out_taste[bi, st.n_taste]))
            n_taste = st.n_taste + do_taste.astype(jnp.int32)

            # ---- next-step audio embed (fill-forward semantics,
            #      modeling_taste.py:1158-1194) ----
            taste_embed = codebook_output_from_indices(
                cb, jnp.maximum(step_out.taste_ids, 0)[:, None])[:, 0]
            prefix_audio = pending[bi, jnp.minimum(st.pending_ptr,
                                                   pending.shape[1] - 1)]
            pending_ptr = st.pending_ptr + step_out.use_prefix.astype(jnp.int32)
            last_audio = jnp.where(
                do_taste[:, None], taste_embed.astype(jnp.float32),
                jnp.where(step_out.use_prefix[:, None],
                          prefix_audio.astype(jnp.float32),
                          st.last_audio_embed))
            # before taste sampling starts and with no prefix: pad embedding
            # (reference taste_action == 'wait'; `taste_started` carries the
            # delay-level-appropriate start condition — step-based for token
            # delay, word-start-count for word delay)
            started_or_prefix = jnp.logical_or(
                step_out.taste_started, jnp.asarray(sampler_cfg.has_prefix))
            audio_embed = jnp.where(
                started_or_prefix[:, None], last_audio,
                mdl.pad_audio_unit_embed.astype(jnp.float32)[None])

            text_embed = embed_tokens(step_out.text_id[:, None])  # [B, 1, H]
            fused = mdl.fuse_for_bridge_in_llm(
                text_embed.astype(mdl.dtype),
                audio_embed[:, None].astype(mdl.dtype))

            gen_valid = jnp.logical_and(slot >= max_prefix,
                                        slot < max_prefix + st.step + 1)
            out_step = mdl.language_model(
                inputs_embeds=fused, caches=st.caches,
                cache_index=max_prefix + st.step,
                position_offset=prefix_len + st.step,
                output_hidden_states=True,
                key_valid=jnp.logical_or(key_valid0, gen_valid[None]))
            return GenState(
                st.i + 1, st.step + 1, rng, out_step["caches"],
                out_step["last_hidden"][:, 0],
                tuple(h[:, 0] for h in out_step["hidden_states"]),
                sampler, last_audio, pending_ptr, out_tokens, out_taste,
                out_words, n_out, n_taste, word_id_cur,
                jnp.logical_or(st.done, step_out.terminate))

        final = nn.while_loop(cond, body, self, gen0)
        return dict(
            state, step=final.step, rng=final.rng, caches=final.caches,
            hidden=final.hidden, all_hidden=final.all_hidden,
            sampler=final.sampler, last_audio_embed=final.last_audio_embed,
            pending_ptr=final.pending_ptr, out_tokens=final.out_tokens,
            out_taste=final.out_taste, out_words=final.out_words,
            n_out=final.n_out, n_taste=final.n_taste,
            word_id_cur=final.word_id_cur, done=final.done)

    def generate(
        self,
        rng: jax.Array,
        cb: Codebook,
        sampler_cfg: SamplerConfig,
        tables: Dict[str, jnp.ndarray],
        llm_indices: Optional[jnp.ndarray] = None,      # [B, T, L]
        llm_token_ids: Optional[jnp.ndarray] = None,    # [B, T]
        llm_token_lengths: Optional[jnp.ndarray] = None,
        llm_word_ids: Optional[jnp.ndarray] = None,
        conditional_mode: str = "audio",
        max_steps: int = 256,
        instruct_prefix_ids: Optional[jnp.ndarray] = None,   # [P]
        instruct_suffix_ids: Optional[jnp.ndarray] = None,   # [S]
        batch_size: int = 1,   # used by 'zero' mode only (no input arrays)
    ) -> Dict[str, jnp.ndarray]:
        """Batched joint decode with KV cache (the reference's generation
        loop, modeling_taste.py:1030-1206, is B=1 and cache-less; this is a
        TPU-first batched redesign — per-row sampler states, per-row done
        flags, uniform cache layout with per-row RoPE offsets).

        Modes (modeling_taste.py:1071-1107): 'zero' (sos only), 'text'
        (text-token prefix), 'audio' (fused text+taste prefix with pending
        audio embeds), 'instruct' (audio prefix wrapped in instruct
        prefix/suffix tokens; pair with `SamplerConfig.stop_id`).

        Row i derives its sampling stream as fold_in(step_key, i), so a
        row's trajectory depends only on (rng, its inputs, its row index),
        not on the batch size.  Alternatively `rng` may be a BATCH of keys
        [B, 2]: row i's step-t stream is then fold_in(rng[i], t) — fully
        independent of cohort composition and row position, which is what
        the serving micro-batcher uses to keep per-request `seed`
        reproducibility under concurrent load.

        One-shot wrapper over the stream API (init + one full-budget
        chunk — identical trajectory by construction).  Returns generated
        llm token ids [B, max_steps], taste indices [B, max_steps, L]
        (dense, one row per word), word ids [B, max_steps], and per-row
        counts.
        """
        st = self.generate_stream_init(
            rng, cb, llm_indices, llm_token_ids, llm_token_lengths,
            llm_word_ids, conditional_mode, max_steps, instruct_prefix_ids,
            instruct_suffix_ids, batch_size)
        st = self.generate_stream_chunk(st, cb, sampler_cfg, tables,
                                        max_steps)
        return {
            "llm_token_ids": st["out_tokens"],
            "llm_word_ids": st["out_words"],
            "taste_indices": st["out_taste"],
            "num_tokens": st["n_out"],
            "num_taste_words": st["n_taste"],
        }

    # ------------------------------------------------------------------

    def get_audio_embeds_from_taste(
        self, cb: Codebook,
        asr_token_lengths: jnp.ndarray,   # [B]
        asr_word_ids: jnp.ndarray,        # [B, Ta]
        taste_preds: jnp.ndarray,         # [B, Tw, L] per-WORD taste (dense)
    ) -> jnp.ndarray:
        """Map per-word taste indices onto asr tokens by word id and decode to
        embeddings (modeling_taste.py:1006-1028).  `taste_preds` here is
        already compacted to one row per word (IGNORE rows removed)."""
        gathered = jnp.take_along_axis(
            taste_preds, asr_word_ids[:, :, None].astype(jnp.int32), axis=1)
        emb = codebook_output_from_indices(cb, jnp.maximum(gathered, 0))
        mask = length_mask(asr_token_lengths, asr_word_ids.shape[1])
        return emb * mask[:, :, None]
