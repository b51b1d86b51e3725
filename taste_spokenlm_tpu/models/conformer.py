"""ESPnet/WeNet-style Transformer/Conformer encoder stack, TPU-first.

Re-design of the reference cosyvoice encoder family
(/root/reference/taste_speech/modules_taste/cosyvoice/{encoder,encoder_layer,
attention,embedding,subsampling,positionwise_feed_forward}.py) around XLA:

* Relative-position (Transformer-XL / ESPnet) attention computed with the
  skew trick as two batched matmuls — no per-chunk Python loops.
* `static_chunk_size=1` (causal LM) and full-attention modes as static masks.
* Incremental decode via a functional per-layer KV cache + a contiguous
  slice of the relative-position table (replacing the reference's
  `forward_chunk` full-prefix recompute, encoder.py:183-271 — SURVEY.md §7
  calls this out as a required improvement for the RTF target).

Parameter names mirror the reference state-dict layout (embed.out.*,
encoders_{i}.self_attn.linear_{q,k,v,out,pos}, pos_bias_u/v, feed_forward.w_1/w_2,
norm1/norm2 or norm_mha/norm_ff, after_norm) so converted CosyVoice/TASTE
checkpoints load with a mechanical rename.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from taste_spokenlm_tpu.config import EncoderStackConfig
from taste_spokenlm_tpu.ops.remat import remat_policy as _remat_policy
from taste_spokenlm_tpu.ops.quantized import dense as _q_dense
from taste_spokenlm_tpu.ops.masking import chunk_causal_mask, length_mask

_ACT = {
    "relu": nn.relu,
    "swish": nn.silu,
    "gelu": lambda x: nn.gelu(x, approximate=False),
    "tanh": jnp.tanh,
}


def espnet_rel_pos_table(d_model: int, max_len: int) -> np.ndarray:
    """Relative-position sinusoid table of length 2*max_len-1.

    Index p corresponds to relative position rel = (max_len-1) - p, matching
    EspnetRelPositionalEncoding (embedding.py:201-255): positive rels first
    (reversed), then negative.
    """
    pos = np.arange(max_len, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float64)
                 * -(math.log(10000.0) / d_model))
    pe_pos = np.zeros((max_len, d_model))
    pe_pos[:, 0::2] = np.sin(pos * div)
    pe_pos[:, 1::2] = np.cos(pos * div)
    pe_neg = np.zeros((max_len, d_model))
    pe_neg[:, 0::2] = np.sin(-pos * div)
    pe_neg[:, 1::2] = np.cos(-pos * div)
    return np.concatenate([pe_pos[::-1], pe_neg[1:]], axis=0).astype(np.float32)


def _rel_shift(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, T, 2T-1] -> [B, H, T, T]: out[..., i, j] = x[..., i, (T-1)-i+j].

    The Transformer-XL skew trick (attention.py:225-243) expressed with pad +
    reshape, which XLA lowers to pure data movement.
    """
    b, h, t, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))      # [B,H,T,2T]
    x = x.reshape(b, h, 2 * t, t)[:, :, 1:]               # [B,H,2T-1,T]
    x = x.reshape(b, h, t, 2 * t - 1)
    return x[..., :t]


class RelPositionAttention(nn.Module):
    """Multi-head self-attention with ESPnet relative position encoding.

    scores = ((q + u) k^T + rel_shift((q + v) p^T)) / sqrt(d)
    (attention.py:200-326).
    """

    d_model: int
    num_heads: int
    dtype: Any = jnp.float32
    quantized: Any = False  # False | 'int8' | 'int4'
    fused_qkv: bool = False  # one [d, 3d] GEMV (EncoderStackConfig flag)

    def setup(self):
        d = self.d_model
        if self.fused_qkv:
            # the AR decode step of the small S3 stack is per-op-overhead
            # bound; q/k/v as one GEMV computes identical dot products
            # (quantize with quantize_encoder_params(fuse_qkv=True))
            self.linear_qkv = _q_dense(3 * d, self.quantized,
                                       dtype=self.dtype, name="linear_qkv")
        else:
            self.linear_q = _q_dense(d, self.quantized, dtype=self.dtype,
                                     name="linear_q")
            self.linear_k = _q_dense(d, self.quantized, dtype=self.dtype,
                                     name="linear_k")
            self.linear_v = _q_dense(d, self.quantized, dtype=self.dtype,
                                     name="linear_v")
        self.linear_out = _q_dense(d, self.quantized, dtype=self.dtype,
                                   name="linear_out")
        self.linear_pos = _q_dense(d, self.quantized, use_bias=False,
                                   dtype=self.dtype, name="linear_pos")
        init = nn.initializers.xavier_uniform()
        dk = d // self.num_heads
        self.pos_bias_u = self.param("pos_bias_u", init, (self.num_heads, dk))
        self.pos_bias_v = self.param("pos_bias_v", init, (self.num_heads, dk))

    def _qkv(self, x):
        b, t, _ = x.shape
        h, dk = self.num_heads, self.d_model // self.num_heads
        d = self.d_model
        if self.fused_qkv:
            qkv = self.linear_qkv(x)
            q = qkv[..., :d].reshape(b, t, h, dk)
            k = qkv[..., d:2 * d].reshape(b, t, h, dk)
            v = qkv[..., 2 * d:].reshape(b, t, h, dk)
            return q, k, v
        q = self.linear_q(x).reshape(b, t, h, dk)
        k = self.linear_k(x).reshape(b, t, h, dk)
        v = self.linear_v(x).reshape(b, t, h, dk)
        return q, k, v

    def project_pos(self, pos_emb: jnp.ndarray) -> jnp.ndarray:
        return self.linear_pos(pos_emb)

    def __call__(
        self,
        x: jnp.ndarray,                  # [B, T, C]
        pos_emb: jnp.ndarray,            # [P, C] slice of the rel-pos table
        mask: Optional[jnp.ndarray] = None,   # bool [B, 1, Tq, Tk]
        cache: Optional[Dict[str, jnp.ndarray]] = None,
        cache_index: Optional[jnp.ndarray] = None,
        pos_proj: Optional[jnp.ndarray] = None,  # [P, C] pre-projected
        causal_scores: bool = False,  # STATIC: mask ⊆ strict causal
    ):
        b, t, _ = x.shape
        h, dk = self.num_heads, self.d_model // self.num_heads
        q, k, v = self._qkv(x)

        if cache is not None:
            k = jax.lax.dynamic_update_slice_in_dim(cache["k"], k, cache_index, 1)
            v = jax.lax.dynamic_update_slice_in_dim(cache["v"], v, cache_index, 1)
            cache = {"k": k, "v": v}

        # pos_proj: linear_pos applied ONCE per decode session
        # (ConformerEncoder.precompute_pos_projs) — recomputing it per AR
        # step over the whole window dominates decode cost otherwise
        if pos_proj is None:
            pos_proj = self.linear_pos(pos_emb)
        p = pos_proj.reshape(-1, h, dk)                      # [P, H, dk]

        q_u = q + self.pos_bias_u[None, None]
        q_v = q + self.pos_bias_v[None, None]
        # pos_emb must have P = Tq + Tk - 1 entries where entry p encodes
        # rel = (Tq - 1) - p + (key offset); align so bd[i, j] picks
        # p = (Tq-1-i) + j.
        tk = k.shape[1]
        tq = t
        assert p.shape[0] == tq + tk - 1, (p.shape, tq, tk)
        if causal_scores and cache is None and tq == tk and tq > 1:
            # Pallas flash path: fuses ac + skewed-bd + softmax + pv in
            # VMEM — no [B, H, T, T] HBM tensors at all (the remaining
            # traffic of the skew path below).  Training-shape win measured
            # in scripts/profile_s3attn.py; numerics match the XLA path to
            # matmul-tiling tolerance (tests/test_relpos_flash.py).
            import os
            from taste_spokenlm_tpu.ops.pallas.relpos_attention import (
                can_use_relpos_flash, relpos_causal_attention)
            if (can_use_relpos_flash(tq, dk)
                    and os.environ.get("TASTE_DISABLE_FLASH") != "1"
                    and (jax.default_backend() in ("tpu", "axon")
                         or os.environ.get("TASTE_FORCE_RELPOS_FLASH")
                         == "1")):
                if mask is not None:
                    # causal_scores contract: mask = strict-causal ∧
                    # key-valid, so the last row carries key validity
                    lengths = jnp.broadcast_to(
                        jnp.sum(mask[:, 0, -1, :].astype(jnp.int32), -1),
                        (b,))
                else:
                    lengths = None
                out = relpos_causal_attention(q_u, q_v, k, v, p, lengths)
                return (self.linear_out(out.reshape(b, t, self.d_model)),
                        cache)
            # causal scores never read the future half of the rel table
            # (cols 0..T-1 = rel -(T-1)..0), so compute q_v @ p[:T]^T —
            # [T, T] instead of [T, 2T-1] — and apply the pad-left-1
            # "music-transformer" skew: y[i, j] = x[i, (T-1)-i+j].  The
            # j > i wrap-around entries land under the causal mask.  At
            # training shapes (B=8, T~1640) this halves the dominant
            # HBM tensor of the layer: the full-width bd path is ~75% of
            # the stack's fwd+bwd wall (scripts/profile_s3attn.py).
            # accumulate on the MXU in f32, but STORE the tensor that the
            # pad/reshape skew streams through HBM in the model dtype —
            # the strided skew copy is traffic-bound, and for f32 models
            # the cast is the identity (parity paths unchanged)
            bd = jnp.einsum("bqhd,phd->bhqp", q_v, p[:tq],
                            preferred_element_type=jnp.float32
                            ).astype(self.dtype)
            bd = jnp.pad(bd, ((0, 0), (0, 0), (0, 0), (1, 0)))
            bd = bd.reshape(b, h, tq * (tq + 1)) \
                   .reshape(b, h, tq + 1, tq)[:, :, 1:]
        elif tq == tk:
            bd = jnp.einsum("bqhd,phd->bhqp", q_v, p,
                            preferred_element_type=jnp.float32)
            bd = _rel_shift(bd)          # pad/reshape trick, pure data movement
        elif tq > 1:
            bd = jnp.einsum("bqhd,phd->bhqp", q_v, p,
                            preferred_element_type=jnp.float32)
            idx = (tq - 1 - jnp.arange(tq))[:, None] + jnp.arange(tk)[None, :]
            bd = jnp.take_along_axis(
                bd, jnp.broadcast_to(idx[None, None], (b, h, tq, tk)), axis=-1)
        else:
            # tq == 1: [B, H, 1, Tk] is already aligned
            bd = jnp.einsum("bqhd,phd->bhqp", q_v, p,
                            preferred_element_type=jnp.float32)
        # computed AFTER the flash-path early return: in eager/interpret
        # execution (TASTE_FORCE_RELPOS_FLASH debugging) this [B,H,T,T]
        # tensor would otherwise materialize even when the kernel handles it
        ac = jnp.einsum("bqhd,bkhd->bhqk", q_u, k,
                        preferred_element_type=jnp.float32)
        scores = (ac + bd) * jnp.asarray(1.0 / math.sqrt(dk), jnp.float32)
        if mask is not None:
            scores = jnp.where(mask, scores,
                               jnp.asarray(jnp.finfo(jnp.float32).min / 2))
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        return self.linear_out(out.reshape(b, t, self.d_model)), cache


class PositionwiseFeedForward(nn.Module):
    d_model: int
    hidden: int
    activation: str = "relu"
    dtype: Any = jnp.float32
    quantized: Any = False  # False | 'int8' | 'int4'
    fused: bool = False     # EncoderStackConfig.fused_mlp_serving

    @nn.compact
    def __call__(self, x):
        from taste_spokenlm_tpu.ops.quantized import qmode
        if self.fused and qmode(self.quantized) is not None:
            # ONE Pallas call for the whole FFN (ops/pallas/fused_mlp);
            # params keep the QDense/QDense4 naming, but int4 packs w_2
            # per-tile: quantize_encoder_params(fused_mlp=True)
            from taste_spokenlm_tpu.ops.quantized import (
                QProjParams, fused_ffn_apply)
            mode = qmode(self.quantized)
            names = ("kernel_q", "scale", "kernel_q4")
            w1 = QProjParams(self.d_model, self.hidden, mode, names,
                             use_bias=True, name="w_1")()
            w2 = QProjParams(self.hidden, self.d_model, mode, names,
                             use_bias=True, name="w_2")()
            return fused_ffn_apply(x, w1, w2, mode, self.dtype,
                                   activation=self.activation)
        h = _q_dense(self.hidden, self.quantized, dtype=self.dtype,
                     name="w_1")(x)
        h = _ACT[self.activation](h)
        return _q_dense(self.d_model, self.quantized, dtype=self.dtype,
                        name="w_2")(h)


class ConvolutionModule(nn.Module):
    """Conformer convolution module (convolution.py:25-145).

    pointwise 1x1 -> GLU -> depthwise (causal = left-pad k-1, else
    symmetric) -> norm -> act -> pointwise 1x1, with padded positions zeroed
    on both sides.  Causal mode left-pads the RAW input before the first
    pointwise conv (convolution.py:115-117 — so GLU(pconv1 bias) leaks into
    the left edge of the depthwise window, reproduced here); symmetric mode
    zero-pads AFTER the GLU (the depthwise conv's own padding=(k-1)//2,
    convolution.py:60-68).
    """

    channels: int
    kernel_size: int = 15
    activation: str = "swish"
    norm_type: str = "batch_norm"  # batch_norm | layer_norm
    causal: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pad_mask=None, train: bool = False):
        # x: [B, T, C]; pad_mask: bool [B, T] (True = valid frame)
        if pad_mask is not None:
            x = jnp.where(pad_mask[..., None], x, 0.0)
        if self.causal:
            x = jnp.pad(x, ((0, 0), (self.kernel_size - 1, 0), (0, 0)))
        x = nn.Conv(2 * self.channels, (1,), padding="VALID",
                    dtype=self.dtype, name="pointwise_conv1")(x)
        a, b = jnp.split(x, 2, axis=-1)
        x = a * nn.sigmoid(b)                                  # GLU
        if not self.causal:
            half = (self.kernel_size - 1) // 2
            x = jnp.pad(x, ((0, 0), (half, half), (0, 0)))
        x = nn.Conv(self.channels, (self.kernel_size,), padding="VALID",
                    feature_group_count=self.channels, dtype=self.dtype,
                    name="depthwise_conv")(x)
        if self.norm_type == "layer_norm":
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        else:
            x = nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                             dtype=self.dtype, name="norm")(x)
        x = _ACT[self.activation](x)
        x = nn.Conv(self.channels, (1,), padding="VALID", dtype=self.dtype,
                    name="pointwise_conv2")(x)
        if pad_mask is not None:
            x = jnp.where(pad_mask[..., None], x, 0.0)
        return x


class EncoderLayer(nn.Module):
    """Pre-LN (macaron-FFN? -> MHA -> conv? -> FFN) layer
    (encoder_layer.py:109-233); `conformer_names=True` uses the conformer
    norm naming (norm_mha/norm_ff), False the transformer naming (norm1/norm2),
    matching the reference state dicts."""

    d_model: int
    num_heads: int
    ffn_dim: int
    activation: str
    conformer_names: bool = True
    macaron_style: bool = False
    use_cnn_module: bool = False
    cnn_module_kernel: int = 15
    cnn_module_norm: str = "batch_norm"
    cnn_causal: bool = False
    dtype: Any = jnp.float32
    quantized: Any = False  # False | 'int8' | 'int4'
    fused_qkv: bool = False
    fused_mlp: bool = False

    def setup(self):
        mha_norm = "norm_mha" if self.conformer_names else "norm1"
        ffn_norm = "norm_ff" if self.conformer_names else "norm2"
        self.attn = RelPositionAttention(self.d_model, self.num_heads,
                                         self.dtype, self.quantized,
                                         self.fused_qkv,
                                         name="self_attn")
        self.attn_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=mha_norm)
        self.ffn = PositionwiseFeedForward(self.d_model, self.ffn_dim,
                                           self.activation, self.dtype,
                                           self.quantized, self.fused_mlp,
                                           name="feed_forward")
        self.ffn_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=ffn_norm)
        self.ff_scale = 0.5 if self.macaron_style else 1.0
        if self.macaron_style:
            self.ffn_macaron = PositionwiseFeedForward(
                self.d_model, self.ffn_dim, self.activation, self.dtype,
                self.quantized, self.fused_mlp,
                name="feed_forward_macaron")
            self.macaron_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                             name="norm_ff_macaron")
        if self.use_cnn_module:
            self.conv_module = ConvolutionModule(
                self.d_model, self.cnn_module_kernel, self.activation,
                self.cnn_module_norm, self.cnn_causal, self.dtype,
                name="conv_module")
            self.conv_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                          name="norm_conv")
            self.final_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                           name="norm_final")

    def __call__(self, x, pos_emb, mask=None, cache=None, cache_index=None,
                 pad_mask=None, train: bool = False, pos_proj=None,
                 causal_scores: bool = False):
        if self.macaron_style:
            x = x + self.ff_scale * self.ffn_macaron(self.macaron_norm(x))
        h, new_cache = self.attn(self.attn_norm(x), pos_emb, mask=mask,
                                 cache=cache, cache_index=cache_index,
                                 pos_proj=pos_proj,
                                 causal_scores=causal_scores)
        x = x + h
        if self.use_cnn_module:
            x = x + self.conv_module(self.conv_norm(x), pad_mask, train=train)
        x = x + self.ff_scale * self.ffn(self.ffn_norm(x))
        if self.use_cnn_module:
            x = self.final_norm(x)
        return x, new_cache


class ConformerEncoder(nn.Module):
    """The full encoder stack (covers both reference `TransformerEncoder` and
    cnn-less `ConformerEncoder` — TASTE never enables the conv module).

    Input pipeline: Linear -> LayerNorm -> (ReLU if linear_legacy) ->
    x*sqrt(d) + rel-pos table (subsampling.py:69-115, 338-368;
    embedding.py:256-269).
    """

    config: EncoderStackConfig
    max_len: int = 4096
    dtype: Any = jnp.float32
    remat: bool = False  # gradient checkpointing per layer

    def setup(self):
        cfg = self.config
        if cfg.input_layer in ("linear", "linear_legacy"):
            self.embed_linear = nn.Dense(cfg.output_size, dtype=self.dtype)
            self.embed_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        elif cfg.input_layer == "conv1d2":
            # subsampling.py:116-170 (whisper-style 1-D stride-2 stem)
            self.sub_conv_0 = nn.Conv(cfg.output_size, (3,), padding=1,
                                      dtype=self.dtype, name="conv_0")
            self.sub_conv_2 = nn.Conv(cfg.output_size, (3,), strides=(2,),
                                      padding=1, dtype=self.dtype,
                                      name="conv_2")
        elif cfg.input_layer in ("conv2d", "conv2d4", "conv2d6", "conv2d8"):
            # subsampling.py:173-337: stride-2 (then 3/2/2) VALID 2-D stems
            stride2 = {"conv2d": 2, "conv2d4": 2, "conv2d6": 3,
                       "conv2d8": 2}[cfg.input_layer]
            self.sub_conv_0 = nn.Conv(cfg.output_size, (3, 3), strides=(2, 2),
                                      padding="VALID", dtype=self.dtype,
                                      name="conv_0")
            k2 = 5 if cfg.input_layer == "conv2d6" else 3
            self.sub_conv_2 = nn.Conv(cfg.output_size, (k2, k2),
                                      strides=(stride2, stride2),
                                      padding="VALID", dtype=self.dtype,
                                      name="conv_2")
            if cfg.input_layer == "conv2d8":
                self.sub_conv_4 = nn.Conv(cfg.output_size, (3, 3),
                                          strides=(2, 2), padding="VALID",
                                          dtype=self.dtype, name="conv_4")
            # torch names: Conv2dSubsampling4 uses out.0, the 6/8 variants
            # use `linear` (subsampling.py:196,253,305)
            out_name = "out_0" if cfg.input_layer in ("conv2d", "conv2d4") \
                else "linear"
            self.sub_out = nn.Dense(cfg.output_size, dtype=self.dtype,
                                    name=out_name)
        else:
            raise ValueError(f"unknown input_layer {cfg.input_layer!r}")
        conformer_names = cfg.input_layer != "linear_legacy"
        act = cfg.activation_type if conformer_names else "relu"
        # static args: train (7) and causal_scores (9) — both select code
        # paths and must stay Python bools under the remat wrapper
        layer_cls = (nn.remat(EncoderLayer, static_argnums=(7, 9),
                              policy=_remat_policy(self.remat))
                     if self.remat else EncoderLayer)
        self.encoders = [
            layer_cls(cfg.output_size, cfg.attention_heads, cfg.linear_units,
                      act, conformer_names=conformer_names,
                      macaron_style=cfg.macaron_style,
                      use_cnn_module=cfg.use_cnn_module,
                      cnn_module_kernel=cfg.cnn_module_kernel,
                      cnn_module_norm=cfg.cnn_module_norm,
                      cnn_causal=cfg.cnn_causal, dtype=self.dtype,
                      quantized=cfg.quantized_serving,
                      fused_qkv=cfg.fused_qkv_serving,
                      fused_mlp=cfg.fused_mlp_serving,
                      name=f"encoders_{i}")
            for i in range(cfg.num_blocks)
        ]
        self.after_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.pe_table = jnp.asarray(espnet_rel_pos_table(cfg.output_size, self.max_len))

    def _embed(self, x):
        cfg = self.config
        if cfg.input_layer in ("linear", "linear_legacy"):
            x = self.embed_norm(self.embed_linear(x))
            if cfg.input_layer == "linear_legacy":
                x = nn.relu(x)
        elif cfg.input_layer == "conv1d2":
            x = nn.gelu(self.sub_conv_0(x), approximate=False)
            x = nn.gelu(self.sub_conv_2(x), approximate=False)
        else:  # conv2d stems: [B, T, F] -> [B, T', F', C] -> Dense
            x = x[..., None]                                   # channel last
            x = nn.relu(self.sub_conv_0(x))
            x = nn.relu(self.sub_conv_2(x))
            if cfg.input_layer == "conv2d8":
                x = nn.relu(self.sub_conv_4(x))
            b, t, f, c = x.shape
            if f == 0:
                raise ValueError(
                    f"input_size={cfg.input_size} is too small for "
                    f"{cfg.input_layer!r}: the VALID conv stack consumed the "
                    f"whole feature axis")
            # torch flattens (c, f) as c*f with c-major (view(b, t, c*f)
            # after [b, c, t, f] -> [b, t, c, f]); match that order
            x = self.sub_out(x.transpose(0, 1, 3, 2).reshape(b, t, c * f))
        return x * jnp.asarray(math.sqrt(cfg.output_size), self.dtype)

    def subsampled_length(self, t_in: int) -> int:
        """Output frame count of the input layer for a t_in-frame input."""
        il = self.config.input_layer
        if il in ("linear", "linear_legacy"):
            return t_in
        if il == "conv1d2":
            return (t_in + 1) // 2     # conv1d stride 2, padding 1
        t = (t_in - 1) // 2            # 3x3 stride-2 VALID
        if il in ("conv2d", "conv2d4"):
            return (t - 1) // 2
        if il == "conv2d6":
            return (t - 4) // 3        # 5x5 stride-3 VALID
        return ((t - 1) // 2 - 1) // 2  # conv2d8

    def _subsample_lengths(self, lengths, t_in: int, t_out: int):
        """Valid-length mapping, matching the reference's mask slicing
        (subsampling.py:170,227,279,335)."""
        il = self.config.input_layer
        if il in ("linear", "linear_legacy"):
            return lengths
        p0, step = {"conv1d2": ((t_in + 1) % 2, 2),
                    "conv2d": (6, 4), "conv2d4": (6, 4),
                    "conv2d6": (10, 6), "conv2d8": (14, 8)}[il]
        return jnp.clip((lengths - p0 + step - 1) // step, 0, t_out)

    def __call__(self, x: jnp.ndarray, lengths: Optional[jnp.ndarray] = None,
                 causal: Optional[bool] = None, train: bool = False):
        """Full-sequence forward.  x: [B, T, input_size] -> [B, T, output_size]."""
        cfg = self.config
        t_in = x.shape[1]
        x = self._embed(x.astype(self.dtype))
        t = x.shape[1]
        # pos table slice for rel in [T-1, -(T-1)] -> 2T-1 entries centered
        pe = jax.lax.dynamic_slice_in_dim(
            self.pe_table, self.max_len - t, 2 * t - 1, axis=0)
        if causal is None:
            causal = cfg.static_chunk_size > 0
        mask = chunk_causal_mask(t, cfg.static_chunk_size if causal else 0)[None, None]
        # strict-causal masks never expose the j > i half of the scores, so
        # the attention can use the [T, T] truncated-rel-table skew path
        sc = bool(causal) and cfg.static_chunk_size == 1
        pad_mask = None
        if lengths is not None:
            lengths = self._subsample_lengths(lengths, t_in, t)
            valid = length_mask(lengths, t)                    # [B, T]
            mask = jnp.logical_and(mask, valid[:, None, None, :])
            pad_mask = valid if cfg.use_cnn_module else None
        for layer in self.encoders:
            x, _ = layer(x, pe, mask, None, None, pad_mask, train, None, sc)
        return self.after_norm(x)

    # ---------------- incremental decode ----------------

    def init_cache(self, batch: int, max_len: int):
        cfg = self.config
        h, dk = cfg.attention_heads, cfg.output_size // cfg.attention_heads
        return tuple(
            {"k": jnp.zeros((batch, max_len, h, dk), self.dtype),
             "v": jnp.zeros((batch, max_len, h, dk), self.dtype)}
            for _ in range(cfg.num_blocks))

    def precompute_pos_projs(self, total: int):
        """Project the rel-pos window for a decode session with cache
        length `total` ONCE per layer.  Per-step decode otherwise re-runs
        each layer's `linear_pos` over the whole window — ~10 GFLOP/step at
        the S3 decoder's shapes vs ~0.1 GFLOP of actual decode compute.

        Returns a tuple (one [2*total-1, C] array per layer); pass to
        `decode_step(pos_projs=...)`."""
        assert not self.remat, "precompute_pos_projs: serving path only"
        pe = jax.lax.dynamic_slice_in_dim(
            self.pe_table, self.max_len - total, 2 * total - 1, axis=0)
        return tuple(layer.attn.project_pos(pe.astype(self.dtype))
                     for layer in self.encoders)

    def decode_step(self, x: jnp.ndarray, caches, index: jnp.ndarray,
                    key_valid: Optional[jnp.ndarray] = None,
                    pos_projs=None):
        """One-token (or prefill-chunk) step.  x: [B, S, input_size]; `index`
        is the absolute position of x[:, 0].  Attends to cache positions
        <= own position; `key_valid` [B, 1, 1, Tk] additionally masks
        invalid (e.g. left-pad) cache slots.
        """
        # decode caches cover attention KV only; none of the TASTE decode
        # stacks enables the conv module (every config sets use_cnn_module
        # False), so streaming CNN caches are out of scope here.
        assert not self.config.use_cnn_module, \
            "decode_step does not support use_cnn_module"
        assert self.config.input_layer in ("linear", "linear_legacy"), \
            "decode_step needs a non-subsampling input layer"
        b, s, _ = x.shape
        x = self._embed(x.astype(self.dtype))
        tk = caches[0]["k"].shape[1]
        # rel-pos table slice: entry p corresponds to rel = index+s-1-p, so
        # the attention kernel's alignment p = (s-1-i)+j holds for key j.
        pe = jax.lax.dynamic_slice_in_dim(
            self.pe_table, self.max_len - 1 - index - (s - 1), tk + s - 1, axis=0)
        key_pos = jnp.arange(tk)[None, None, None, :]
        q_pos = index + jnp.arange(s)[None, None, :, None]
        mask = key_pos <= q_pos
        if key_valid is not None:
            mask = jnp.logical_and(mask, key_valid)
        new_caches = []
        for li, (layer, cache) in enumerate(zip(self.encoders, caches)):
            pp = None
            if pos_projs is not None:
                # pos_projs[li] covers table rows [max_len-total, ...);
                # this step's slice starts at max_len-1-index-(s-1)
                pp = jax.lax.dynamic_slice_in_dim(
                    pos_projs[li], tk - 1 - index - (s - 1), tk + s - 1,
                    axis=0)
            x, c = layer(x, pe, mask=mask, cache=cache, cache_index=index,
                         pos_proj=pp)
            new_caches.append(c)
        return self.after_norm(x), tuple(new_caches)
