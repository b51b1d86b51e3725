"""Whisper-style encoder/decoder in flax.linen, TPU-first.

Re-designs the reference's customized HF Whisper
(/root/reference/taste_speech/modules_taste/cosyvoice/customized_whisper.py)
for XLA: one attention implementation (fp32-softmax einsum MHA), the TASTE
split-KV cross-attention expressed simply as separate key/value source
tensors (customized_whisper.py:360-366), and decoder self-attn KV caching as
explicit functional state for `lax.scan` decode loops.

Parameter tree mirrors HF module names (q_proj/k_proj/v_proj/out_proj,
fc1/fc2, *_layer_norm) so conversion from HF checkpoints is a rename-free
tree map (see utils/convert.py).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from taste_spokenlm_tpu.config import WhisperConfig
from taste_spokenlm_tpu.ops.remat import remat_policy as _remat_policy
from taste_spokenlm_tpu.ops.attention import multi_head_attention
from taste_spokenlm_tpu.ops.masking import causal_mask, length_mask, combine_masks


class WhisperAttention(nn.Module):
    """MHA with optional split key/value source (TASTE asr_attn_pooling)."""

    d_model: int
    num_heads: int
    dtype: Any = jnp.float32
    v_proj_identity_init: bool = False  # make_v_proj_identity (TASTE)

    def setup(self):
        dense = lambda name, bias: nn.Dense(  # noqa: E731
            self.d_model, use_bias=bias, dtype=self.dtype, name=name)
        self.q_proj = dense("q_proj", True)
        self.k_proj = dense("k_proj", False)  # whisper: no bias on k
        if self.v_proj_identity_init:
            # asr_attn_pooling: V starts as the raw layer-6 hidden
            # (audio_joint_encoder_segmenter.py:146-150 identity init)
            self.v_proj = nn.Dense(
                self.d_model, use_bias=True, dtype=self.dtype, name="v_proj",
                kernel_init=lambda key, shape, dtype=jnp.float32: jnp.eye(
                    shape[0], shape[1], dtype=dtype))
        else:
            self.v_proj = dense("v_proj", True)
        self.out_proj = dense("out_proj", True)

    def __call__(
        self,
        hidden: jnp.ndarray,                       # [B, Tq, C]
        key_source: Optional[jnp.ndarray] = None,  # [B, Tk, C] (cross-attn)
        value_source: Optional[jnp.ndarray] = None,
        mask: Optional[jnp.ndarray] = None,        # bool [B, 1, Tq, Tk]
        cache: Optional[Dict[str, jnp.ndarray]] = None,
        cache_index: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, Optional[Dict[str, jnp.ndarray]]]:
        b, tq, _ = hidden.shape
        h, d = self.num_heads, self.d_model // self.num_heads
        if key_source is None:
            key_source = hidden
        if value_source is None:
            value_source = key_source

        q = self.q_proj(hidden).reshape(b, tq, h, d)
        k = self.k_proj(key_source).reshape(b, key_source.shape[1], h, d)
        v = self.v_proj(value_source).reshape(b, value_source.shape[1], h, d)

        if cache is not None:
            # functional KV cache: write new keys at cache_index
            k_cache = jax.lax.dynamic_update_slice_in_dim(cache["k"], k, cache_index, 1)
            v_cache = jax.lax.dynamic_update_slice_in_dim(cache["v"], v, cache_index, 1)
            k, v = k_cache, v_cache
            cache = {"k": k_cache, "v": v_cache}

        # Pallas flash attention on TPU for long unmasked self-attention
        # (the whisper encoder's 1500-position hot path).  Measured at
        # whisper-large shapes (T=1500, 20 heads, 32L): flash wins at the
        # training batch (B=8, full forward 446 ms vs 527) AND at B=1
        # serving (59.7 ms vs 63.6, scripts/profile_tower.py 2026-08-19 —
        # an earlier one-shot-kernel-less measurement had B=1 flash losing
        # 2.09 vs 1.50 ms/layer, hence the historical b>=2 gate).
        from taste_spokenlm_tpu.ops.pallas.flash_attention import (
            can_use_flash, flash_attention)
        import os
        if (mask is None and cache is None
                and can_use_flash(tq, k.shape[1])
                and os.environ.get("TASTE_DISABLE_FLASH") != "1"
                and jax.default_backend() in ("tpu", "axon")):
            out = flash_attention(q, k, v)
        else:
            out = multi_head_attention(q, k, v, mask=mask)
        return self.out_proj(out.reshape(b, tq, self.d_model)), cache


class WhisperEncoderLayer(nn.Module):
    d_model: int
    num_heads: int
    ffn_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        residual = x
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="self_attn_layer_norm")(x)
        h, _ = WhisperAttention(self.d_model, self.num_heads, self.dtype,
                                name="self_attn")(h, mask=mask)
        x = residual + h
        residual = x
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="final_layer_norm")(x)
        h = nn.Dense(self.ffn_dim, dtype=self.dtype, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="fc2")(h)
        return residual + h


def sinusoidal_positions(length: int, channels: int) -> jnp.ndarray:
    """Whisper sinusoid table (interleaved sin|cos halves, log-space freqs)."""
    import numpy as np
    log_timescale_increment = np.log(10000) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_timescale_increment * np.arange(channels // 2))
    scaled_time = np.arange(length)[:, None] * inv_timescales[None, :]
    return jnp.asarray(
        np.concatenate([np.sin(scaled_time), np.cos(scaled_time)], axis=1),
        dtype=jnp.float32)


class WhisperEncoder(nn.Module):
    """Mel [B, n_mels, 3000] -> hidden [B, 1500, d]; can emit an intermediate
    layer's hidden (TASTE target layer 6) alongside the final one."""

    config: WhisperConfig
    dtype: Any = jnp.float32
    remat: bool = False  # gradient checkpointing per layer

    @nn.compact
    def __call__(self, mel: jnp.ndarray,
                 collect_layer: Optional[int] = None
                 ) -> Dict[str, jnp.ndarray]:
        cfg = self.config
        x = mel.astype(self.dtype).transpose(0, 2, 1)  # [B, T, n_mels]
        x = nn.Conv(cfg.d_model, kernel_size=(3,), padding=1, dtype=self.dtype,
                    name="conv1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Conv(cfg.d_model, kernel_size=(3,), strides=(2,), padding=1,
                    dtype=self.dtype, name="conv2")(x)
        x = nn.gelu(x, approximate=False)

        # HF stores the sinusoidal table as a weight; keep it a param for
        # checkpoint compatibility.
        pos = self.param(
            "embed_positions",
            lambda key, shape: sinusoidal_positions(*shape),
            (cfg.max_source_positions, cfg.d_model))
        x = x + pos[None, : x.shape[1]].astype(self.dtype)

        collected = None
        layer_cls = (nn.remat(WhisperEncoderLayer,
                              policy=_remat_policy(self.remat))
                     if self.remat else WhisperEncoderLayer)
        for i in range(cfg.encoder_layers):
            if collect_layer is not None and i == collect_layer:
                collected = x
            x = layer_cls(cfg.d_model, cfg.encoder_heads, cfg.ffn_dim,
                          self.dtype, name=f"layers_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm")(x)
        out = {"last_hidden": x}
        if collected is not None:
            out["target_hidden"] = collected
        return out


class WhisperDecoderLayer(nn.Module):
    d_model: int
    num_heads: int
    ffn_dim: int
    dtype: Any = jnp.float32
    cross_v_identity_init: bool = False

    def setup(self):
        self.self_attn = WhisperAttention(self.d_model, self.num_heads,
                                          self.dtype, name="self_attn")
        self.self_attn_layer_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.encoder_attn = WhisperAttention(
            self.d_model, self.num_heads, self.dtype,
            v_proj_identity_init=self.cross_v_identity_init,
            name="encoder_attn")
        self.encoder_attn_layer_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.fc1 = nn.Dense(self.ffn_dim, dtype=self.dtype)
        self.fc2 = nn.Dense(self.d_model, dtype=self.dtype)
        self.final_layer_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)

    def __call__(self, x, enc_key, enc_value, self_mask=None, cross_mask=None,
                 cache=None, cache_index=None):
        residual = x
        h = self.self_attn_layer_norm(x)
        h, new_cache = self.self_attn(h, mask=self_mask, cache=cache,
                                      cache_index=cache_index)
        x = residual + h

        residual = x
        h = self.encoder_attn_layer_norm(x)
        h, _ = self.encoder_attn(h, key_source=enc_key, value_source=enc_value,
                                 mask=cross_mask)
        x = residual + h

        residual = x
        h = self.final_layer_norm(x)
        h = self.fc2(nn.gelu(self.fc1(h), approximate=False))
        return residual + h, new_cache


class WhisperDecoder(nn.Module):
    """Text decoder cross-attending encoder states, with optional split K/V
    sources (asr_attn_pooling: K=final hidden, V=layer-6 hidden)."""

    config: WhisperConfig
    dtype: Any = jnp.float32
    cross_v_identity_init: bool = False  # make_v_proj_identity

    def setup(self):
        cfg = self.config
        self.embed_tokens = nn.Embed(cfg.vocab_size, cfg.d_model,
                                     dtype=self.dtype)
        self.embed_positions = nn.Embed(cfg.max_target_positions, cfg.d_model,
                                        dtype=self.dtype)
        self.layers = [
            WhisperDecoderLayer(cfg.d_model, cfg.decoder_heads, cfg.ffn_dim,
                                self.dtype,
                                cross_v_identity_init=self.cross_v_identity_init,
                                name=f"layers_{i}")
            for i in range(cfg.decoder_layers)
        ]
        self.layer_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)

    def __call__(
        self,
        input_ids: jnp.ndarray,                 # [B, T]
        enc_key: jnp.ndarray,                   # [B, Tk, C]
        enc_value: Optional[jnp.ndarray] = None,  # [B, Tk, C] (split-KV) or None
        input_lengths: Optional[jnp.ndarray] = None,
        position_offset: int | jnp.ndarray = 0,
        caches: Optional[Tuple[Dict[str, jnp.ndarray], ...]] = None,
        cache_index: Optional[jnp.ndarray] = None,
    ):
        b, t = input_ids.shape
        positions = jnp.arange(t) + position_offset
        x = self.embed_tokens(input_ids) + self.embed_positions(positions)[None]
        x = x.astype(self.dtype)

        if caches is None:
            self_mask = causal_mask(t)[None, None]
            if input_lengths is not None:
                self_mask = combine_masks(
                    self_mask, length_mask(input_lengths, t)[:, None, None, :])
        else:
            # cached decode/prefill: per-query causal over the cache buffer
            tk = caches[0]["k"].shape[1]
            q_pos = cache_index + jnp.arange(t)[None, None, :, None]
            self_mask = jnp.arange(tk)[None, None, None, :] <= q_pos

        new_caches = []
        for i, layer in enumerate(self.layers):
            x, c = layer(x, enc_key,
                         enc_value if enc_value is not None else enc_key,
                         self_mask=self_mask,
                         cache=None if caches is None else caches[i],
                         cache_index=cache_index)
            new_caches.append(c)
        x = self.layer_norm(x)
        return x, (tuple(new_caches) if caches is not None else None)

    def init_cache(self, batch: int, max_len: int) -> Tuple[Dict[str, jnp.ndarray], ...]:
        cfg = self.config
        h, d = cfg.decoder_heads, cfg.d_model // cfg.decoder_heads
        return tuple(
            {"k": jnp.zeros((batch, max_len, h, d), self.dtype),
             "v": jnp.zeros((batch, max_len, h, d), self.dtype)}
            for _ in range(cfg.decoder_layers))


class WhisperForASR(nn.Module):
    """Whisper encoder + decoder transcription with the HF pipeline's decode
    semantics.

    The TPU-side replacement for the reference's HF ASR pipeline used in
    preprocessing (/root/reference/taste_speech/processing_taste.py:256-266,
    return_timestamps=None): mel -> encoder -> KV-cached decode from the
    task prompt until EOS, with `suppress_tokens` / `begin_suppress_tokens`
    masking, timestamp suppression, and optional temperature sampling (the
    building block for the whisper temperature-fallback recipe — see
    frontend.processor.transcribe_with_fallback).  Plugs into
    frontend.TasteProcessor as the `transcriber` hook (token ids out; text
    decoding happens with the host tokenizer).
    """

    config: WhisperConfig
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        self.encoder = WhisperEncoder(cfg, dtype=self.dtype, name="encoder")
        self.decoder = WhisperDecoder(cfg, dtype=self.dtype, name="decoder")
        sup = np.zeros((cfg.vocab_size,), np.float32)
        sup[list(cfg.suppress_ids)] = -np.inf
        if cfg.timestamp_begin_id >= 0:
            sup[cfg.timestamp_begin_id:] = -np.inf
        begin = np.zeros((cfg.vocab_size,), np.float32)
        begin[list(cfg.begin_suppress_ids)] = -np.inf
        self._suppress_mask = jnp.asarray(sup)
        self._begin_mask = jnp.asarray(begin)

    def __call__(self, mel: jnp.ndarray, max_tokens: int = 224,
                 temperature: float | jnp.ndarray = 0.0,
                 rng: Optional[jax.Array] = None):
        """mel [B, n_mels, 3000] -> (token ids [B, max_tokens] EOS-padded,
        avg logprob [B] of the emitted tokens incl. EOS — whisper's
        fallback quality signal).

        `temperature` is a TRACED scalar (argmax vs categorical selected
        in-graph with jnp.where), so one compiled program serves every
        rung of the temperature-fallback ladder
        (frontend.processor.transcribe_with_fallback)."""
        cfg = self.config
        b = mel.shape[0]
        temperature = jnp.asarray(temperature, jnp.float32)
        enc = self.encoder(mel)["last_hidden"]
        prompt = jnp.tile(jnp.asarray(cfg.decoder_prompt, jnp.int32)[None],
                          (b, 1))
        p = prompt.shape[1]
        total = p + max_tokens
        caches = self.decoder.init_cache(b, total)

        # prefill the prompt
        hidden, caches = self.decoder(prompt, enc, caches=caches,
                                      cache_index=jnp.int32(0))
        if rng is None:
            rng = jax.random.PRNGKey(0)

        from typing import NamedTuple as _NT

        class S(_NT):
            step: jnp.ndarray
            rng: jax.Array
            last_hidden: jnp.ndarray   # [B, C]
            caches: Any
            tokens: jnp.ndarray        # [B, max_tokens]
            sum_logprob: jnp.ndarray   # [B]
            n_emitted: jnp.ndarray     # [B]
            done: jnp.ndarray          # [B]

        init = S(jnp.int32(0), rng, hidden[:, -1], caches,
                 jnp.full((b, max_tokens), cfg.eos_token_id, jnp.int32),
                 jnp.zeros((b,), jnp.float32), jnp.zeros((b,), jnp.int32),
                 jnp.zeros((b,), bool))

        def cond(mdl, s):
            return jnp.logical_and(s.step < max_tokens, ~jnp.all(s.done))

        def body(mdl, s):
            rng, sub = jax.random.split(s.rng)
            # logits via tied embedding (whisper ties lm head to embeds)
            logits = (s.last_hidden.astype(jnp.float32)
                      @ mdl.decoder.embed_tokens.embedding.astype(jnp.float32).T)
            logits = logits + mdl._suppress_mask[None]
            logits = jnp.where(s.step == 0, logits + mdl._begin_mask[None],
                               logits)
            sampled = jax.random.categorical(
                sub, logits / jnp.maximum(temperature, 1e-6), axis=-1
            ).astype(jnp.int32)
            greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            ids = jnp.where(temperature > 0.0, sampled, greedy)
            logprobs = jax.nn.log_softmax(logits, axis=-1)
            lp = jnp.take_along_axis(logprobs, ids[:, None], axis=1)[:, 0]
            is_eos = ids == cfg.eos_token_id
            emit = jnp.where(s.done, cfg.eos_token_id, ids)
            tokens = s.tokens.at[:, s.step].set(emit)
            sum_lp = s.sum_logprob + jnp.where(s.done, 0.0, lp)
            n_emit = s.n_emitted + (~s.done).astype(jnp.int32)
            hidden, caches = mdl.decoder(
                emit[:, None], enc, position_offset=p + s.step,
                caches=s.caches, cache_index=p + s.step)
            return S(s.step + 1, rng, hidden[:, 0], caches, tokens,
                     sum_lp, n_emit, s.done | is_eos)

        final = nn.while_loop(cond, body, self, init)
        avg_logprob = final.sum_logprob / jnp.maximum(final.n_emitted, 1)
        return final.tokens, avg_logprob
