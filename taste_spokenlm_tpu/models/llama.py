"""Llama-3.2 backbone in flax.linen with LoRA, GQA, and llama3 rope scaling.

The spoken-LM backbone (reference: HF Llama + peft LoRA r=64 a=128 over all
linear projections, /root/reference/configs/model/taslm.json text_config +
kwargs_for_lora; used by taste_speech/modeling_taste.py:546-1206).

TPU-first notes:
* grouped-query attention via ops.attention.gqa_attention (fp32 softmax);
* functional KV cache for lax.scan/while_loop decode;
* LoRA is part of the module (params live under lora_a/lora_b), so the
  frozen-base + adapters split is an optax mask, not a wrapper library;
* accepts `inputs_embeds` directly — the TASTE in-bridge fuses text+taste
  embeddings before the backbone (modeling_taste.py:952-957);
* can return all hidden states for the WeightedLayerExtract out-bridge.

Parameter names mirror HF (embed_tokens, layers_N.self_attn.q_proj, ...,
input_layernorm, post_attention_layernorm, mlp.gate_proj/up_proj/down_proj,
norm) for mechanical checkpoint conversion.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from taste_spokenlm_tpu.config import LlamaConfig, LoraConfig
from taste_spokenlm_tpu.ops.remat import remat_policy as _remat_policy
from taste_spokenlm_tpu.ops.attention import gqa_attention


class LoraDense(nn.Module):
    """Dense with optional LoRA adapter: y = xW + (alpha/r) (xA)B.

    A ~ kaiming-uniform, B = 0 (peft defaults), so the adapter starts as a
    no-op and the base path stays checkpoint-compatible.

    `quantized=True` stores the base kernel as int8 with a per-output-channel
    f32 scale ("base_q"/"base_scale" instead of the "base" Dense) — the
    weight-only serving layout.  The dequant (convert + scale) sits inside
    the matmul consumer so XLA fuses it into the dot's operand load: the AR
    decode loop reads int8 from HBM, halving its bandwidth vs bf16
    (measured 1.66x tokens/sec on TPU v5e at Llama-1B decode shapes).
    `utils/quant.quantize_llama_params` converts a trained tree.
    """

    features: int
    lora: Optional[LoraConfig] = None
    use_bias: bool = False
    dtype: Any = jnp.float32
    quantized: Any = False  # False | 'int8' | 'int4'

    @nn.compact
    def __call__(self, x, deterministic: bool = True,
                 disable_lora: bool = False):
        from taste_spokenlm_tpu.ops.quantized import qmode
        mode = qmode(self.quantized)
        if mode is not None:
            # the quantized serving layouts store only (base_q*, base_scale);
            # a bias would be silently dropped — fail loudly instead
            assert not self.use_bias, \
                "LoraDense(quantized) does not support use_bias"
            in_dim = x.shape[-1]
            if mode == "int4":
                from taste_spokenlm_tpu.ops.quantized import (
                    int4_apply, int4_param_shapes)
                wp_shape, s_shape = int4_param_shapes(in_dim, self.features)
                scale = self.param("base_scale", nn.initializers.ones,
                                   s_shape, jnp.float32)
                wp = self.param("base_q4", nn.initializers.zeros,
                                wp_shape, jnp.uint8)
                y = int4_apply(x, wp, scale, self.dtype)
            else:
                scale = self.param("base_scale", nn.initializers.ones,
                                   (self.features,), jnp.float32)
                q = self.param("base_q", nn.initializers.zeros,
                               (in_dim, self.features), jnp.int8)
                y = (x.astype(self.dtype) @ q.astype(self.dtype)) \
                    * scale.astype(self.dtype)
        else:
            y = nn.Dense(self.features, use_bias=self.use_bias,
                         dtype=self.dtype, name="base")(x)
        if self.lora is not None and self.lora.r > 0:
            # params are created unconditionally so a frozen-base forward
            # (disable_lora=True) can share one module instance with the
            # adapter forward in the same traced step
            in_dim = x.shape[-1]
            a = self.param(
                "lora_a",
                lambda key, shape: jax.random.uniform(
                    key, shape, jnp.float32,
                    -math.sqrt(1.0 / shape[0]), math.sqrt(1.0 / shape[0])),
                (in_dim, self.lora.r))
            bmat = self.param("lora_b", nn.initializers.zeros,
                              (self.lora.r, self.features))
            if not disable_lora:
                h = x
                if self.lora.dropout > 0 and not deterministic:
                    h = nn.Dropout(self.lora.dropout, deterministic=False)(h)
                y = y + (self.lora.alpha / self.lora.r) * (
                    (h.astype(jnp.float32) @ a) @ bmat).astype(y.dtype)
        return y


def llama3_inv_freq(cfg: LlamaConfig) -> np.ndarray:
    """Rope inverse frequencies with llama3 frequency-dependent scaling."""
    head_dim = cfg.head_dim
    inv = 1.0 / (cfg.rope_theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))
    factor = cfg.rope_scaling_factor
    low_wavelen = cfg.rope_original_max_position / cfg.rope_low_freq_factor
    high_wavelen = cfg.rope_original_max_position / cfg.rope_high_freq_factor
    wavelen = 2 * np.pi / inv
    scaled = np.where(wavelen > low_wavelen, inv / factor, inv)
    smooth = (cfg.rope_original_max_position / wavelen - cfg.rope_low_freq_factor) / (
        cfg.rope_high_freq_factor - cfg.rope_low_freq_factor)
    mid = (1 - smooth) * inv / factor + smooth * inv
    is_mid = (wavelen >= high_wavelen) & (wavelen <= low_wavelen)
    return np.where(is_mid, mid, scaled).astype(np.float32)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: [B, T, H, D]; cos/sin: [T, D/2] (shared positions) or [B, T, D/2]
    (per-row positions) -> rotate-half convention (HF)."""
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    if cos.ndim == 2:
        cos, sin = cos[None], sin[None]
    cos = cos[:, :, None, :]
    sin = sin[:, :, None, :]
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)


class RMSNorm(nn.Module):
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf ** 2, axis=-1, keepdims=True)
        normed = xf * jax.lax.rsqrt(var + self.eps)
        return (w * normed).astype(self.dtype)


class LlamaAttention(nn.Module):
    config: LlamaConfig
    lora: Optional[LoraConfig] = None
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        hd = cfg.head_dim
        qz = cfg.quantized_serving
        if cfg.fused_qkv_serving:
            # one [H, (Hq+2KV)] GEMV instead of three: the AR decode step is
            # per-op-overhead-bound, not just byte-bound (quantize with
            # utils/quant.quantize_llama_params(fuse_qkv=True)).  Adapters
            # must be merged first (merge_lora_params) — per-projection LoRA
            # over a fused base would re-introduce the ops fusion removes.
            assert self.lora is None, \
                "fused_qkv_serving requires merged LoRA (use_lora=False)"
            self.qkv_proj = LoraDense(
                (cfg.num_attention_heads + 2 * cfg.num_key_value_heads) * hd,
                None, dtype=self.dtype, quantized=qz)
        else:
            self.q_proj = LoraDense(cfg.num_attention_heads * hd, self.lora,
                                    dtype=self.dtype, quantized=qz)
            self.k_proj = LoraDense(cfg.num_key_value_heads * hd, self.lora,
                                    dtype=self.dtype, quantized=qz)
            self.v_proj = LoraDense(cfg.num_key_value_heads * hd, self.lora,
                                    dtype=self.dtype, quantized=qz)
        self.o_proj = LoraDense(cfg.hidden_size, self.lora, dtype=self.dtype,
                                quantized=qz)

    def __call__(self, x, cos, sin, mask=None, cache=None, cache_index=None,
                 disable_lora: bool = False):
        cfg = self.config
        b, t, _ = x.shape
        hd = cfg.head_dim
        if cfg.fused_qkv_serving:
            nq = cfg.num_attention_heads * hd
            nkv = cfg.num_key_value_heads * hd
            qkv = self.qkv_proj(x, disable_lora=disable_lora)
            q = qkv[..., :nq].reshape(b, t, cfg.num_attention_heads, hd)
            k = qkv[..., nq:nq + nkv].reshape(
                b, t, cfg.num_key_value_heads, hd)
            v = qkv[..., nq + nkv:].reshape(
                b, t, cfg.num_key_value_heads, hd)
        else:
            q = self.q_proj(x, disable_lora=disable_lora).reshape(
                b, t, cfg.num_attention_heads, hd)
            k = self.k_proj(x, disable_lora=disable_lora).reshape(
                b, t, cfg.num_key_value_heads, hd)
            v = self.v_proj(x, disable_lora=disable_lora).reshape(
                b, t, cfg.num_key_value_heads, hd)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        if cache is not None:
            k = jax.lax.dynamic_update_slice_in_dim(cache["k"], k, cache_index, 1)
            v = jax.lax.dynamic_update_slice_in_dim(cache["v"], v, cache_index, 1)
            cache = {"k": k, "v": v}
        out = gqa_attention(q, k, v, mask=mask)
        return self.o_proj(out.reshape(b, t, -1),
                           disable_lora=disable_lora), cache


class LlamaMLP(nn.Module):
    config: LlamaConfig
    lora: Optional[LoraConfig] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, disable_lora: bool = False):
        cfg = self.config
        qz = cfg.quantized_serving
        from taste_spokenlm_tpu.ops.quantized import qmode
        if cfg.fused_mlp_serving and qmode(qz) is not None:
            # whole MLP as ONE Pallas call (ops/pallas/fused_mlp): weights
            # stream through VMEM once, the activation never touches HBM.
            # Params keep the standard separate gate/up/down quantized
            # layout (int4 packs down_proj per-tile:
            # quantize_llama_params(fused_mlp=True)).
            assert self.lora is None, \
                "fused_mlp_serving requires merged LoRA (use_lora=False)"
            from taste_spokenlm_tpu.ops.quantized import (
                QProjParams, fused_gated_mlp_apply)
            mode = qmode(qz)
            H, I = cfg.hidden_size, cfg.intermediate_size
            gate = QProjParams(H, I, mode, name="gate_proj")()
            up = QProjParams(H, I, mode, name="up_proj")()
            down = QProjParams(I, H, mode, name="down_proj")()
            return fused_gated_mlp_apply(x, gate, up, down, mode, self.dtype)
        if cfg.fused_qkv_serving:
            # gate+up as one [H, 2I] GEMV (see LlamaAttention.setup)
            assert self.lora is None, \
                "fused_qkv_serving requires merged LoRA (use_lora=False)"
            gu = LoraDense(2 * cfg.intermediate_size, None, dtype=self.dtype,
                           name="gateup_proj", quantized=qz)(x)
            gate = gu[..., :cfg.intermediate_size]
            up = gu[..., cfg.intermediate_size:]
        else:
            gate = LoraDense(cfg.intermediate_size, self.lora,
                             dtype=self.dtype, name="gate_proj",
                             quantized=qz)(x, disable_lora=disable_lora)
            up = LoraDense(cfg.intermediate_size, self.lora, dtype=self.dtype,
                           name="up_proj", quantized=qz)(
                               x, disable_lora=disable_lora)
        return LoraDense(cfg.hidden_size, self.lora, dtype=self.dtype,
                         name="down_proj", quantized=qz)(
                             nn.silu(gate) * up, disable_lora=disable_lora)


class LlamaLayer(nn.Module):
    config: LlamaConfig
    lora: Optional[LoraConfig] = None
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        self.input_layernorm = RMSNorm(cfg.rms_norm_eps, self.dtype)
        self.self_attn = LlamaAttention(cfg, self.lora, self.dtype)
        self.post_attention_layernorm = RMSNorm(cfg.rms_norm_eps, self.dtype)
        self.mlp = LlamaMLP(cfg, self.lora, self.dtype)

    def __call__(self, x, cos, sin, mask=None, cache=None, cache_index=None,
                 disable_lora: bool = False):
        h, new_cache = self.self_attn(self.input_layernorm(x), cos, sin,
                                      mask=mask, cache=cache,
                                      cache_index=cache_index,
                                      disable_lora=disable_lora)
        x = x + h
        x = x + self.mlp(self.post_attention_layernorm(x),
                         disable_lora=disable_lora)
        return x, new_cache


class LlamaModel(nn.Module):
    """Backbone; `lm_head` is tied to embed_tokens (Llama-3.2-1B ties)."""

    config: LlamaConfig
    lora: Optional[LoraConfig] = None
    dtype: Any = jnp.float32
    remat: bool = False  # gradient checkpointing per layer

    def setup(self):
        cfg = self.config
        if cfg.quantized_embed_serving:
            from taste_spokenlm_tpu.ops.quantized import QEmbed
            head_mode = ("int4"
                         if cfg.quantized_embed_serving == "int4head"
                         else "int8")
            self.embed_tokens = QEmbed(cfg.vocab_size, cfg.hidden_size,
                                       dtype=self.dtype,
                                       head_mode=head_mode)
        else:
            self.embed_tokens = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                                         dtype=self.dtype)
        # static_argnums: 0 is self; 7 is the python-bool disable_lora flag
        layer_cls = (nn.remat(LlamaLayer, static_argnums=(7,),
                              policy=_remat_policy(self.remat))
                     if self.remat else LlamaLayer)
        self.layers = [layer_cls(cfg, self.lora, self.dtype, name=f"layers_{i}")
                       for i in range(cfg.num_hidden_layers)]
        self.norm = RMSNorm(cfg.rms_norm_eps, self.dtype)
        if not cfg.tie_word_embeddings:
            # direct param (not nn.Dense) so it materializes at init even
            # though logits() is not traced by __call__
            self.lm_head_kernel = self.param(
                "lm_head_kernel", nn.initializers.lecun_normal(),
                (cfg.hidden_size, cfg.vocab_size))
        self.inv_freq = jnp.asarray(llama3_inv_freq(cfg))

    def _rope(self, positions: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        # positions [T] or [B, T] -> cos/sin [..., T, D/2]
        freqs = positions.astype(jnp.float32)[..., None] * self.inv_freq
        return jnp.cos(freqs).astype(self.dtype), jnp.sin(freqs).astype(self.dtype)

    def __call__(
        self,
        input_ids: Optional[jnp.ndarray] = None,     # [B, T]
        inputs_embeds: Optional[jnp.ndarray] = None, # [B, T, H]
        attention_lengths: Optional[jnp.ndarray] = None,  # [B] valid lengths
        position_offset: int | jnp.ndarray = 0,
        caches=None,
        cache_index: Optional[jnp.ndarray] = None,
        output_hidden_states: bool = False,
        key_valid: Optional[jnp.ndarray] = None,      # [B, Tk] for cached decode
        disable_lora: bool = False,   # frozen-base forward (adapters off)
    ):
        cfg = self.config
        if inputs_embeds is None:
            inputs_embeds = self.embed_tokens(input_ids)
        x = inputs_embeds.astype(self.dtype)
        b, t, _ = x.shape
        off = jnp.asarray(position_offset)
        # scalar offset -> positions [T]; per-row [B] offsets -> [B, T]
        positions = (jnp.arange(t) + off if off.ndim == 0
                     else off[:, None] + jnp.arange(t)[None, :])
        cos, sin = self._rope(positions)

        if caches is None:
            mask = jnp.tril(jnp.ones((t, t), bool))[None, None]
            if attention_lengths is not None:
                valid = (jnp.arange(t)[None, :] < attention_lengths[:, None])
                mask = jnp.logical_and(mask, valid[:, None, None, :])
        else:
            tk = caches[0]["k"].shape[1]
            # per-query causality: query row i (absolute pos cache_index+i)
            # attends keys <= its own position
            q_pos = cache_index + jnp.arange(t)[None, None, :, None]
            mask = jnp.arange(tk)[None, None, None, :] <= q_pos
            if key_valid is not None:
                mask = jnp.logical_and(mask, key_valid[:, None, None, :])

        hidden_states = [x] if output_hidden_states else None
        new_caches = []
        for i, layer in enumerate(self.layers):
            x, c = layer(x, cos, sin, mask,
                         None if caches is None else caches[i],
                         cache_index, disable_lora)
            new_caches.append(c)
            if output_hidden_states:
                hidden_states.append(x)
        x = self.norm(x)

        out = {"last_hidden": x}
        if output_hidden_states:
            # HF convention: hidden_states[-1] is the POST-norm final hidden
            hidden_states[-1] = x
            out["hidden_states"] = tuple(hidden_states)
        if caches is not None:
            out["caches"] = tuple(new_caches)
        return out

    def logits(self, hidden: jnp.ndarray) -> jnp.ndarray:
        """lm_head: tied to embed_tokens (Llama-3.2-1B) or a separate
        projection when config.tie_word_embeddings is False.

        f32 weights keep exact f32 math (parity tests); bf16 serving
        weights are read as bf16 with f32 MXU accumulation — upcasting a
        [V, D] table to f32 would double its HBM traffic per decode step."""

        def head(w_in_out):   # [D, V]
            if w_in_out.dtype == jnp.float32:
                return hidden.astype(jnp.float32) @ w_in_out
            return jax.lax.dot_general(
                hidden.astype(w_in_out.dtype), w_in_out,
                (((hidden.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        if not self.config.tie_word_embeddings:
            return head(self.lm_head_kernel)
        if self.config.quantized_embed_serving:
            return self.embed_tokens.logits(hidden)
        return head(self.embed_tokens.embedding.T)

    def init_cache(self, batch: int, max_len: int):
        cfg = self.config
        return tuple(
            {"k": jnp.zeros((batch, max_len, cfg.num_key_value_heads,
                             cfg.head_dim), self.dtype),
             "v": jnp.zeros((batch, max_len, cfg.num_key_value_heads,
                             cfg.head_dim), self.dtype)}
            for _ in range(cfg.num_hidden_layers))
