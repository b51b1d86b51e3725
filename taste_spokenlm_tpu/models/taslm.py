"""TASLM: the earlier-generation stage-2 spoken LM (SURVEY.md §2.3).

Re-design of /root/reference/STAGE1_TRAIN/SpokenLM/taslm/
{modeling_taslm,modules_taslm,configuration_taslm}.py:

Llama backbone + a parallel speech channel: per-step speech tokens (4 RVQ
channels, vocab 4096 + bos 4096 / eos 4097) are embedded via the frozen RVQ
codebooks, projected to the llm width, fused with the text embedding
(addition / gated / weighted-sum), and the hidden state predicts both the
next text token and the next speech token(s) — either with a multi-channel
CE head (per-channel decay, modeling_taslm.py:656-676) or a MELLE-style
latent sampling layer (modules_taslm.py:97-151) trained with
L_reg + 2*L_kl (modeling_taslm.py:631-655).  Loss = 0.5 text + 0.5 speech
(:700).  Optional text-KL against the adapter-disabled base model
(:599-629).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from taste_spokenlm_tpu.config import LlamaConfig, LoraConfig, _Base
from taste_spokenlm_tpu.models.llama import LlamaModel
from taste_spokenlm_tpu.models.quantizer import (Codebook,
                                                 codebook_output_from_indices)
from taste_spokenlm_tpu.ops.losses import IGNORE_ID, kl_to_reference


@dataclass(frozen=True)
class TaslmConfig(_Base):
    llama: LlamaConfig = field(default_factory=LlamaConfig)
    lora: Optional[LoraConfig] = field(default_factory=LoraConfig)
    use_lora: bool = True
    speech_vocab_size: int = 4096
    speech_num_channels: int = 4
    speech_bos_id: int = 4096
    speech_eos_id: int = 4097
    speech_hidden_size: int = 1280          # RVQ model-space width
    fusion_method: str = "addition"         # addition | gated | weighted_sum
    fusion_normalize_speech: bool = False
    speech_multi_channel_loss_decay_factor: float = 1.0
    speech_token_adopt_latent_sampling: bool = False
    latent_dim: int = 256
    text_conduct_kl_loss: bool = False
    text_kl_vocab_cutoff: int = 80000       # KL over the plain-text vocab slice
    # auxiliary RVQ-hidden reconstruction loss (modeling_taslm.py:685-697):
    # project the LM hidden back to the RVQ model space and MSE against the
    # next step's encoded speech input
    speech_labels_apply_quantization: bool = False

    @classmethod
    def tiny(cls) -> "TaslmConfig":
        return cls(llama=LlamaConfig.tiny(), lora=LoraConfig.tiny(),
                   speech_vocab_size=32, speech_num_channels=4,
                   speech_bos_id=32, speech_eos_id=33, speech_hidden_size=64,
                   latent_dim=16, text_kl_vocab_cutoff=256)


class TaslmFusion(nn.Module):
    """addition / gated / weighted_sum fusion (modules_taslm.py:6-94)."""

    method: str
    hidden_size: int
    normalize_speech: bool = False

    @nn.compact
    def __call__(self, text_embeds, speech_embeds):
        if self.normalize_speech:
            speech_embeds = nn.LayerNorm(epsilon=1e-5,
                                         name="layer_norm_speech")(speech_embeds)
        if self.method == "addition":
            return text_embeds + speech_embeds
        if self.method == "gated":
            gate = jax.nn.sigmoid(nn.Dense(2, use_bias=False, name="gate")(
                jnp.concatenate([text_embeds, speech_embeds], -1)))
            return gate[..., 0:1] * text_embeds + gate[..., 1:2] * speech_embeds
        if self.method == "weighted_sum":
            w = jax.nn.softmax(self.param(
                "weights", lambda key: jnp.array([-2.0, 2.0])))
            return w[0] * speech_embeds + w[1] * text_embeds
        raise ValueError(self.method)


class LatentSamplingLayer(nn.Module):
    """MELLE-style mu/logvar head + reparameterized latent
    (modules_taslm.py:97-151)."""

    latent_dim: int

    @nn.compact
    def __call__(self, hidden, train: bool = False, rng=None):
        mu = nn.Dense(self.latent_dim, name="fc_mu")(hidden.astype(jnp.float32))
        logvar = jnp.broadcast_to(
            self.param("b_logvar", nn.initializers.zeros, (self.latent_dim,)),
            mu.shape)
        sigma = jnp.exp(0.5 * logvar)
        if train and rng is not None:
            base = mu + sigma
            eps = jax.random.normal(rng, sigma.shape)
            z = base + jax.lax.stop_gradient(mu + sigma * eps - base)
        else:
            z = mu + sigma
        return mu, logvar, z


class TaslmForCausalLM(nn.Module):
    config: TaslmConfig
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        self.language_model = LlamaModel(
            cfg.llama, lora=cfg.lora if cfg.use_lora else None,
            dtype=self.dtype, remat=cfg.llama.remat, name="language_model")
        self.fusion_layer = TaslmFusion(cfg.fusion_method,
                                        cfg.llama.hidden_size,
                                        cfg.fusion_normalize_speech)
        if cfg.speech_num_channels > 1:
            # RVQ-embedded speech channel + projection to llm width; special
            # (bos/eos/pad) ids embed as learned rows
            self.speech_special_embed = nn.Embed(
                4, cfg.speech_hidden_size, dtype=self.dtype)
            self.speech_token_embed_proj_layer = nn.Dense(
                cfg.llama.hidden_size, dtype=self.dtype)
        else:
            self.speech_embed_tokens = nn.Embed(
                cfg.speech_vocab_size + 2, cfg.llama.hidden_size,
                dtype=self.dtype)
        if cfg.speech_num_channels > 1 and cfg.speech_labels_apply_quantization:
            self.speech_rvq_hidden_proj_layer = nn.Dense(
                cfg.speech_hidden_size, dtype=self.dtype)
        if cfg.speech_token_adopt_latent_sampling:
            self.speech_latent_sampler = LatentSamplingLayer(cfg.latent_dim)
        else:
            # single-channel: head covers bos/eos too so generation can emit
            # the speech EOS (the reference folds specials into the vocab,
            # configuration_taslm.py:64-65)
            self.speech_head_size = (cfg.speech_vocab_size + 2
                                     if cfg.speech_num_channels == 1
                                     else cfg.speech_vocab_size)
            self.speech_head = nn.Dense(
                cfg.speech_num_channels * self.speech_head_size,
                use_bias=False, dtype=self.dtype)

    def _encode_speech_rvq(self, cb: Optional[Codebook],
                           speech_ids: jnp.ndarray) -> jnp.ndarray:
        """Multi-channel ids [B, T, C] -> RVQ model-space embeds [B, T, A];
        bos/eos (>= vocab) use learned special rows."""
        cfg = self.config
        is_special = speech_ids[..., 0] >= cfg.speech_vocab_size
        rvq = codebook_output_from_indices(
            cb, jnp.clip(speech_ids, 0, cfg.speech_vocab_size - 1))
        special = self.speech_special_embed(
            jnp.clip(speech_ids[..., 0] - cfg.speech_vocab_size, 0, 3))
        return jnp.where(is_special[..., None], special,
                         rvq.astype(self.dtype))

    def embed_speech(self, cb: Optional[Codebook], speech_ids: jnp.ndarray
                     ) -> jnp.ndarray:
        """[B, T, C] multi-channel ids (or [B, T] single-channel) -> llm-width
        embeddings."""
        if self.config.speech_num_channels == 1:
            return self.speech_embed_tokens(speech_ids)
        return self.speech_token_embed_proj_layer(
            self._encode_speech_rvq(cb, speech_ids))

    def __call__(
        self,
        cb: Optional[Codebook],
        text_input_ids: jnp.ndarray,            # [B, T]
        speech_input_ids: jnp.ndarray,          # [B, T, C] or [B, T]
        text_labels: Optional[jnp.ndarray] = None,
        speech_labels: Optional[jnp.ndarray] = None,
        attention_lengths: Optional[jnp.ndarray] = None,
        train: bool = False,
        rng: Optional[jax.Array] = None,
        ref_logits: Optional[jnp.ndarray] = None,
        compute_ref_kl: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        cfg = self.config
        embed_tokens = self.language_model.embed_tokens
        text_embeds = embed_tokens(text_input_ids).astype(self.dtype)
        speech_embeds = self.embed_speech(cb, speech_input_ids)
        combined = self.fusion_layer(text_embeds, speech_embeds)

        out = self.language_model(inputs_embeds=combined,
                                  attention_lengths=attention_lengths)
        hidden = out["last_hidden"]
        text_logits = self.language_model.logits(hidden)

        if (cfg.text_conduct_kl_loss and compute_ref_kl
                and ref_logits is None):
            # frozen-base forward over the PURE text embeddings with adapters
            # disabled (reference: disable_adapter_layers + text-only decoder
            # pass, modeling_taslm.py:599-613)
            ref_out = self.language_model(
                inputs_embeds=text_embeds,
                attention_lengths=attention_lengths, disable_lora=True)
            ref_logits = jax.lax.stop_gradient(
                self.language_model.logits(ref_out["last_hidden"]))

        result: Dict[str, jnp.ndarray] = {"text_logits": text_logits}
        total_text, total_speech = 0.0, 0.0

        if text_labels is not None:
            tl = text_labels[:, 1:]
            logp = jax.nn.log_softmax(
                text_logits[:, :-1].astype(jnp.float32), -1)
            valid = tl != IGNORE_ID
            nll = -jnp.take_along_axis(
                logp, jnp.maximum(tl, 0)[..., None], -1)[..., 0]
            total_text = jnp.sum(jnp.where(valid, nll, 0.0)) / \
                jnp.maximum(jnp.sum(valid), 1)
            result["text_ce_loss"] = total_text
            if cfg.text_conduct_kl_loss and ref_logits is not None:
                cut = cfg.text_kl_vocab_cutoff
                kl = kl_to_reference(text_logits[:, :-1, :cut],
                                     ref_logits[:, :-1, :cut], ~valid)
                total_text = total_text + kl
                result["text_kl_loss"] = kl

        if cfg.speech_token_adopt_latent_sampling:
            mu, logvar, z = self.speech_latent_sampler(hidden, train, rng)
            result["speech_y_pred"] = z
            result["speech_mu"] = mu
            result["speech_logvar"] = logvar
            if speech_labels is not None:
                target = codebook_output_from_indices(
                    cb, jnp.clip(speech_labels, 0, cfg.speech_vocab_size - 1)
                ).astype(jnp.float32)
                tgt, pred = target[:, 1:], z[:, :-1]
                mu_s, lv_s = mu[:, :-1], logvar[:, :-1]
                valid = (speech_labels[:, 1:, 0] != IGNORE_ID)[..., None]
                denom = jnp.maximum(jnp.sum(valid) * tgt.shape[-1], 1.0)
                l_reg = jnp.sum((pred - tgt) ** 2 * valid) / denom
                l_kl = 0.5 * jnp.sum(jnp.mean(
                    jnp.exp(lv_s) + (mu_s - tgt) ** 2 - 1 - lv_s, -1,
                    keepdims=True) * valid) / jnp.maximum(jnp.sum(valid), 1.0)
                total_speech = l_reg + 2.0 * l_kl
                result["speech_latent_reg_loss"] = l_reg
                result["speech_latent_kl_loss"] = l_kl
        else:
            b, t = text_input_ids.shape
            sp_logits = self.speech_head(hidden).reshape(
                b, t, cfg.speech_num_channels, self.speech_head_size)
            result["speech_logits"] = sp_logits
            if speech_labels is not None:
                decay = cfg.speech_multi_channel_loss_decay_factor
                for c in range(cfg.speech_num_channels):
                    sl = speech_labels[:, 1:, c]
                    logp = jax.nn.log_softmax(
                        sp_logits[:, :-1, c].astype(jnp.float32), -1)
                    # the head covers the full label range (single-channel
                    # folds bos/eos in; eos must stay IN the loss,
                    # modeling_taslm.py:626 note)
                    valid = (sl != IGNORE_ID) & (sl < self.speech_head_size)
                    nll = -jnp.take_along_axis(
                        logp, jnp.clip(sl, 0, self.speech_head_size - 1)[..., None],
                        -1)[..., 0]
                    ce = jnp.sum(jnp.where(valid, nll, 0.0)) / \
                        jnp.maximum(jnp.sum(valid), 1)
                    total_speech = total_speech + decay ** (c + 1) * ce
                    result[f"speech_layer_{c}_ce_loss"] = ce
                if (cfg.speech_num_channels > 1
                        and cfg.speech_labels_apply_quantization):
                    # project the hidden back to RVQ model space and MSE it
                    # against the NEXT step's encoded speech input
                    # (modeling_taste.py analog: modeling_taslm.py:685-697)
                    enc_in = self._encode_speech_rvq(cb, speech_input_ids)
                    recon = self.speech_rvq_hidden_proj_layer(hidden)
                    tgt, pred = enc_in[:, 1:].astype(jnp.float32), \
                        recon[:, :-1].astype(jnp.float32)
                    valid = (speech_labels[:, 1:, 0] != IGNORE_ID)[..., None]
                    denom = jnp.maximum(jnp.sum(valid) * tgt.shape[-1], 1.0)
                    recon_loss = jnp.sum((pred - tgt) ** 2 * valid) / denom
                    total_speech = total_speech + decay * recon_loss
                    result["speech_recon_loss"] = recon_loss

        result["loss"] = 0.5 * total_text + 0.5 * total_speech
        return result

    def calculate_log_likelihood(
        self,
        cb: Optional[Codebook],
        text_input_ids: jnp.ndarray,            # [B, T]
        speech_input_ids: jnp.ndarray,          # [B, T, C] or [B, T]
        text_labels: jnp.ndarray,               # [B, T]
        speech_labels: jnp.ndarray,             # [B, T, C]
        attention_lengths: Optional[jnp.ndarray] = None,
    ) -> Dict[str, jnp.ndarray]:
        """The reference's per-utterance selection protocol
        (modeling_taslm.py:324-377, eval_taslm_loglikelihood.py:24-60): one
        teacher-forced forward, then mean text log-likelihood and
        per-channel speech log-likelihood over the valid (shifted) labels,
        each paired with a flipped-labels 'reversed_*' control."""
        from taste_spokenlm_tpu.ops.losses import masked_log_likelihood
        cfg = self.config
        out = self(cb, text_input_ids, speech_input_ids,
                   attention_lengths=attention_lengths)
        res: Dict[str, jnp.ndarray] = {}
        ll, rll = masked_log_likelihood(out["text_logits"][:, :-1],
                                        text_labels[:, 1:])
        res["text_log_likelihood"] = ll
        res["reversed_text_log_likelihood"] = rll
        if not cfg.speech_token_adopt_latent_sampling:
            sp = out["speech_logits"]           # [B, T, C, H]
            for c in range(cfg.speech_num_channels):
                sl = (speech_labels[:, 1:, c] if speech_labels.ndim == 3
                      else speech_labels[:, 1:])
                ll, rll = masked_log_likelihood(
                    sp[:, :-1, c], sl, head_size=self.speech_head_size)
                res[f"speech_log_likelihood.{c}"] = ll
                res[f"reversed_speech_log_likelihood.{c}"] = rll
        return res

    # ------------------------------------------------------------------
    # dual-stream AR generation (modeling_taslm.py:739-990 _baseline_generate)
    # ------------------------------------------------------------------

    def generate(
        self,
        rng: jax.Array,
        cb: Optional[Codebook],
        text_input_ids: jnp.ndarray,        # [1, Tt]
        speech_input_ids: jnp.ndarray,      # [1, Ts(, C)]
        text_length: jnp.ndarray,           # [] valid text tokens
        speech_length: jnp.ndarray,         # [] valid speech tokens
        max_steps: int = 64,
        text_top_p: float = 0.9,
        speech_top_p: float = 0.3,
        temperature: float = 1.0,
        speech_use_greedy: bool = False,
        is_tts: bool = False,
        speech_repetition_max: int = 5,
        text_terminate_id: Optional[int] = None,
    ) -> Dict[str, jnp.ndarray]:
        """KV-cached joint (text, speech) decode as one `lax.while_loop`.

        Modes mirror the reference: unconditional continue (speech_length ==
        text_length), conditional (speech_length > text_length: the surplus
        speech ids are forced while text is sampled), and TTS (`is_tts`:
        text is forced from `text_input_ids`, speech sampled from its bos).
        Stops on the speech EOS, on `speech_repetition_max` consecutive
        repeats of one speech id, or at `max_steps`.  After the text
        terminate id (default: llama eos) is sampled once, every later text
        position is forced to it (modeling_taslm.py:812-819).
        """
        cfg = self.config
        assert cfg.speech_num_channels == 1 or not speech_use_greedy or True
        from taste_spokenlm_tpu.ops.sampling import mask_top_p
        embed_tokens = self.language_model.embed_tokens
        multi = speech_input_ids.ndim == 3
        c = speech_input_ids.shape[-1] if multi else 1
        terminate_id = (text_terminate_id if text_terminate_id is not None
                        else cfg.llama.eos_token_id)

        tt = text_input_ids.shape[1]
        ts = speech_input_ids.shape[1]
        cond_len = jnp.where(is_tts, 1, text_length).astype(jnp.int32)
        n_forced = jnp.maximum(speech_length - cond_len, 0)

        # ---- prefill over the conditional prefix ----
        sp_prefix = speech_input_ids[:, :tt] if ts >= tt else jnp.pad(
            speech_input_ids, ((0, 0), (0, tt - ts)) + (((0, 0),) if multi else ()))
        fused = self.fusion_layer(
            embed_tokens(text_input_ids).astype(self.dtype),
            self.embed_speech(cb, sp_prefix))
        total = tt + max_steps
        caches = self.language_model.init_cache(1, total)
        key_valid0 = jnp.arange(total)[None, :] < cond_len
        out0 = self.language_model(inputs_embeds=fused, caches=caches,
                                   cache_index=jnp.int32(0),
                                   key_valid=key_valid0)
        hidden0 = out0["last_hidden"][0, cond_len - 1]

        sp_buf_shape = (max_steps, c) if multi else (max_steps,)

        class S(NamedTuple):
            step: jnp.ndarray
            rng: jax.Array
            caches: Any
            hidden: jnp.ndarray
            out_text: jnp.ndarray
            out_speech: jnp.ndarray
            forced_text_id: jnp.ndarray    # -1 => not terminated yet
            rep_tok: jnp.ndarray
            rep_cnt: jnp.ndarray
            done: jnp.ndarray

        s0 = S(jnp.int32(0), rng, out0["caches"], hidden0,
               jnp.full((max_steps,), IGNORE_ID, jnp.int32),
               jnp.full(sp_buf_shape, IGNORE_ID, jnp.int32),
               jnp.int32(-1), jnp.int32(-1), jnp.int32(0),
               jnp.asarray(False))

        def cond_fn(mdl, s):
            return jnp.logical_and(s.step < max_steps, ~s.done)

        def body(mdl, s: S):
            rng, r_text, r_speech = jax.random.split(s.rng, 3)
            text_logits = mdl.language_model.logits(
                s.hidden[None, None])[0, 0].astype(jnp.float32)

            # text: forced (tts / post-terminate) or top-p sampled
            filt = mask_top_p(text_logits / temperature, text_top_p)
            sampled_text = jax.random.categorical(r_text, filt).astype(jnp.int32)
            tts_next = text_input_ids[0, jnp.minimum(s.step + 1, tt - 1)]
            text_id = jnp.where(jnp.asarray(is_tts), tts_next.astype(jnp.int32),
                                sampled_text)
            text_id = jnp.where(s.forced_text_id >= 0, s.forced_text_id, text_id)
            forced_text_id = jnp.where(
                jnp.logical_and(s.forced_text_id < 0, text_id == terminate_id),
                jnp.int32(terminate_id), s.forced_text_id)

            # speech: forced conditional ids, then sampled
            head = mdl.speech_head(s.hidden[None, None]).reshape(
                1, 1, cfg.speech_num_channels, mdl.speech_head_size
            )[0, 0].astype(jnp.float32)
            if speech_use_greedy:
                sampled_sp = jnp.argmax(head, axis=-1).astype(jnp.int32)
            else:
                filt_sp = mask_top_p(head / temperature, speech_top_p)
                sampled_sp = jax.random.categorical(
                    r_speech, filt_sp, axis=-1).astype(jnp.int32)
            pos = cond_len + s.step
            forced_sp = jax.lax.dynamic_slice_in_dim(
                speech_input_ids, jnp.minimum(pos, ts - 1), 1, axis=1)[0, 0]
            forced_sp = jnp.atleast_1d(forced_sp).astype(jnp.int32)
            use_forced = s.step < n_forced
            speech_ids = jnp.where(use_forced, forced_sp[:c], sampled_sp)

            # bookkeeping: repetition + eos stopping on channel 0
            sp0 = speech_ids[0]
            rep_cnt = jnp.where(sp0 == s.rep_tok, s.rep_cnt + 1, jnp.int32(0))
            stop = jnp.logical_or(
                sp0 == cfg.speech_eos_id, rep_cnt > speech_repetition_max)

            out_text = s.out_text.at[s.step].set(text_id)
            out_speech = (s.out_speech.at[s.step].set(speech_ids) if multi
                          else s.out_speech.at[s.step].set(sp0))

            # next-step embedding
            sp_in = speech_ids[None, None] if multi else sp0[None, None]
            fused_step = mdl.fusion_layer(
                embed_tokens(text_id[None, None]).astype(mdl.dtype),
                mdl.embed_speech(cb, sp_in))
            out_step = mdl.language_model(
                inputs_embeds=fused_step, caches=s.caches, cache_index=pos,
                position_offset=pos,
                key_valid=(jnp.arange(total)[None, :] < pos + 1))
            return S(s.step + 1, rng, out_step["caches"],
                     out_step["last_hidden"][0, 0], out_text, out_speech,
                     forced_text_id, sp0, rep_cnt,
                     jnp.logical_or(s.done, stop))

        final = nn.while_loop(cond_fn, body, self, s0)
        return {"text_ids": final.out_text, "speech_ids": final.out_speech,
                "num_steps": final.step}
