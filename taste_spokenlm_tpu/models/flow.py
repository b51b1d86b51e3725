"""Flow-matching acoustic model: S3 speech tokens -> mel spectrogram.

Re-design of the CosyVoice flow stack
(/root/reference/taste_speech/modules_taste/cosyvoice/flow/{flow,
flow_matching,length_regulator,decoder}.py + matcha components) for TPU:

* channels-LAST layout ([B, T, C]) everywhere — convs and attention map
  straight onto MXU tiles;
* the Euler CFM solver runs as a `lax.scan` over timesteps, and
  classifier-free guidance batches the conditional and unconditional
  estimator passes as ONE 2B-batch call instead of two sequential calls
  (flow_matching.py:75-88 does 2 calls/step — SURVEY.md §7 step 5);
* nearest-neighbour length regulation is a static gather.

Exact hyperparameters from the reference VoiceGenerator
(modules_taste/inference_audio.py:22-72): 6-block full-attention conformer
512d, mel 80, U-Net channels (256,256) with one real 2x downsample, 12 mid
blocks, heads 8 x 64, 10 Euler steps, CFG rate 0.7, cosine t-schedule.
"""

from __future__ import annotations

import math
import os
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from taste_spokenlm_tpu.config import FlowConfig
from taste_spokenlm_tpu.models.conformer import ConformerEncoder
from taste_spokenlm_tpu.models.hift import WNConvTranspose
from taste_spokenlm_tpu.ops.attention import (multi_head_attention,
                                              padded_flash_attention)
from taste_spokenlm_tpu.ops.masking import length_mask


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


class TapConv(nn.Module):
    """conv1d expressed as K shifted [B, T, Cin] @ [Cin, Cout] matmuls.

    XLA's NHC conv lowering runs the U-Net's C=256 kernel-3 convs at
    ~3-6 TF/s on v5e (MXU mostly idle — same pathology as the HiFT
    ResBlocks, see ops/pallas/conv1d.py); K shifted slices of the padded
    input feed plain MXU dots instead, and XLA fuses the K-1 adds.  Unlike
    the Pallas kernel there is no per-call overhead, so it also wins at the
    U-Net's short sequences (T=452..904) where the kernel loses.

    Param layout and naming are identical to nn.Conv ([K, Cin, Cout]
    `kernel` + `bias`), so checkpoint converters are unaffected."""

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1

    @nn.compact
    def __call__(self, x):
        K = self.kernel
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (K, x.shape[-1], self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        x, w, b = nn.dtypes.promote_dtype(x, w, b, dtype=None)
        pad = self.padding
        xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0))) if pad else x
        t_out = (x.shape[1] + 2 * pad - K) // self.stride + 1
        out = None
        for i in range(K):
            xi = jax.lax.slice_in_dim(
                xp, i, i + self.stride * (t_out - 1) + 1, self.stride, axis=1)
            part = xi @ w[i]
            out = part if out is None else out + part
        return out + b


def nearest_interpolate(x: jnp.ndarray, out_len: int,
                        in_lengths: Optional[jnp.ndarray] = None,
                        out_lengths: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """[B, T, C] -> [B, out_len, C] nearest over time.

    Without lengths this is torch F.interpolate('nearest') over the full
    axis (src = floor(i*T/out_len)).  With per-sample lengths it matches the
    reference length regulator semantics (length_regulator.py:47: each
    sample's valid token span is stretched over its own mel span): frame i of
    sample b reads token floor(i * in_len[b] / out_len[b]).
    """
    t = x.shape[1]
    if in_lengths is None:
        idx = (jnp.arange(out_len) * t) // out_len
        return x[:, idx, :]
    frames = jnp.arange(out_len)[None, :]
    idx = (frames * in_lengths[:, None]) // jnp.maximum(out_lengths[:, None], 1)
    idx = jnp.clip(idx, 0, t - 1)
    return jnp.take_along_axis(x, idx[:, :, None], axis=1)


class InterpolateRegulator(nn.Module):
    """Length regulation: nearest-interpolate to mel frames, then conv stack
    (length_regulator.py:21-50): 4x [Conv k3 + GroupNorm(1) + Mish] + 1x1."""

    channels: int
    n_layers: int = 4

    @nn.compact
    def __call__(self, x, out_len: int, out_lengths: jnp.ndarray,
                 in_lengths: Optional[jnp.ndarray] = None):
        h = nearest_interpolate(x, out_len, in_lengths, out_lengths)
        for i in range(self.n_layers):
            h = TapConv(self.channels, 3, padding=1, name=f"conv_{i}")(h)
            h = nn.GroupNorm(num_groups=1, epsilon=1e-5, name=f"norm_{i}")(h)
            h = mish(h)
        h = TapConv(self.channels, 1, padding=0, name="proj")(h)
        return h * length_mask(out_lengths, out_len)[:, :, None]


class Block1D(nn.Module):
    dim_out: int
    groups: int = 8

    @nn.compact
    def __call__(self, x, mask):
        # x: [B, T, C]; mask: [B, T, 1]
        h = TapConv(self.dim_out, 3, padding=1, name="conv")(x * mask)
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5, name="norm")(h)
        return mish(h) * mask


class ResnetBlock1D(nn.Module):
    dim_out: int
    groups: int = 8

    @nn.compact
    def __call__(self, x, mask, t_emb):
        h = Block1D(self.dim_out, self.groups, name="block1")(x, mask)
        h = h + nn.Dense(self.dim_out, name="mlp")(mish(t_emb))[:, None, :]
        h = Block1D(self.dim_out, self.groups, name="block2")(h, mask)
        return h + TapConv(self.dim_out, 1, padding=0,
                           name="res_conv")(x * mask)


class DiffusersAttention(nn.Module):
    """diffusers-style self-attention (to_q/k/v no bias, to_out).

    `key_valid` is the [B, T] frame-validity mask.  A Pallas flash route
    (padded_flash_attention, mask as a free head-dim lane) exists behind
    TASTE_FLOW_FLASH=1 but is OFF by default: measured on the v5e chip the
    10-step CFM solve is 46 ms with the einsum path vs 58 ms with flash —
    at U-Net shapes (T=904/452, B*H=16) the per-program kernel overhead
    across ~68 attention blocks per eval swamps the saved [B,H,T,T] logit
    traffic (scripts/profile_vocoder.py, 2026-08-19)."""

    heads: int
    head_dim: int
    out_dim: int

    @nn.compact
    def __call__(self, x, key_valid=None):
        b, t, _ = x.shape
        inner = self.heads * self.head_dim
        q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, name="to_k")(x)
        v = nn.Dense(inner, use_bias=False, name="to_v")(x)
        q = q.reshape(b, t, self.heads, self.head_dim)
        k = k.reshape(b, t, self.heads, self.head_dim)
        v = v.reshape(b, t, self.heads, self.head_dim)
        from taste_spokenlm_tpu.ops.pallas.flash_attention import can_use_flash
        if (key_valid is not None and can_use_flash(t, t)
                and os.environ.get("TASTE_FLOW_FLASH") == "1"
                and os.environ.get("TASTE_DISABLE_FLASH") != "1"
                and jax.default_backend() in ("tpu", "axon")):
            out = padded_flash_attention(q, k, v, key_valid)
        else:
            mask = None
            if key_valid is not None:
                mask = key_valid[:, None, None, :]  # [B, 1, 1, Tk]
            out = multi_head_attention(q, k, v, mask=mask)
        return nn.Dense(self.out_dim, name="to_out")(out.reshape(b, t, inner))


class BasicTransformerBlock(nn.Module):
    dim: int
    heads: int
    head_dim: int
    # serving-only fused Pallas path (FlowConfig.fused_dit_serving): the
    # whole block in ONE kernel call — the U-Net stacks are op-latency
    # bound at [2B, T<=904, 256] (ops/pallas/fused_dit.py).  No VJP; the
    # flow training path keeps the XLA blocks (same convention as
    # quantized_serving).
    fused: bool = False

    @nn.compact
    def __call__(self, x, key_valid=None):
        from taste_spokenlm_tpu.ops.pallas.fused_dit import (
            can_use_fused_dit, fused_dit_block)
        if (self.fused and not self.is_initializing()
                and key_valid is not None
                and can_use_fused_dit(x.shape[1], self.dim,
                                      self.heads * self.head_dim)
                and os.environ.get("TASTE_DISABLE_FLASH") != "1"
                and (jax.default_backend() in ("tpu", "axon")
                     or os.environ.get("TASTE_FORCE_FUSED_DIT") == "1")):
            lengths = jnp.sum(key_valid.astype(jnp.int32), axis=-1)
            return fused_dit_block(x, lengths, self.variables["params"],
                                   heads=self.heads, head_dim=self.head_dim)
        h = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        x = x + DiffusersAttention(self.heads, self.head_dim, self.dim,
                                   name="attn1")(h, key_valid=key_valid)
        h = nn.LayerNorm(epsilon=1e-5, name="norm3")(x)
        h = nn.Dense(self.dim * 4, name="ff_in")(h)
        h = nn.gelu(h, approximate=False)
        x = x + nn.Dense(self.dim, name="ff_out")(h)
        return x


def sinusoidal_time_emb(t: jnp.ndarray, dim: int, scale: float = 1000.0) -> jnp.ndarray:
    """matcha SinusoidalPosEmb: [B] -> [B, dim]."""
    half = dim // 2
    freqs = jnp.exp(-math.log(10000.0) / (half - 1) * jnp.arange(half))
    ang = scale * t[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


def _key_valid(m):
    """[B, T, 1] float mask -> bool [B, T] key-validity mask.

    Only KEY masking is needed for correctness: padded query rows produce
    junk either way (all--inf softmax rows were uniform-junk too) and every
    consumer multiplies by the frame mask before the next cross-position op."""
    return m[:, :, 0] > 0.5


class ConditionalDecoder(nn.Module):
    """1-D U-Net CFM estimator (decoder.py:21-222), channels-last."""

    config: FlowConfig

    @nn.compact
    def __call__(self, x, mask, mu, t, spks=None, cond=None):
        """x/mu/cond: [B, T, n_mels]; mask: [B, T] bool; t: [B]; spks: [B, n_mels]."""
        cfg = self.config
        channels = cfg.estimator_channels
        n_mels = cfg.output_size
        in_ch = n_mels * (2 + (spks is not None) + (cond is not None))

        # sinusoids in f32 (bf16 angles alias), then the MLP joins the
        # network compute dtype so it can't re-promote downstream blocks
        t_emb = sinusoidal_time_emb(t.astype(jnp.float32), in_ch)
        t_emb = t_emb.astype(x.dtype)
        time_dim = channels[0] * 4
        t_emb = nn.Dense(time_dim, name="time_mlp_1")(t_emb)
        t_emb = nn.Dense(time_dim, name="time_mlp_2")(nn.silu(t_emb))

        parts = [x, mu]
        if spks is not None:
            parts.append(jnp.broadcast_to(spks[:, None, :],
                                          (x.shape[0], x.shape[1], spks.shape[-1])))
        if cond is not None:
            parts.append(cond)
        h = jnp.concatenate(parts, axis=-1)

        m0 = mask.astype(h.dtype)[:, :, None]

        def tf_stack(h, m, ch, name):
            kv = _key_valid(m)
            for bi in range(cfg.estimator_n_blocks):
                h = BasicTransformerBlock(ch, cfg.estimator_num_heads,
                                          cfg.estimator_attention_head_dim,
                                          fused=cfg.fused_dit_serving,
                                          name=f"{name}_tf_{bi}")(h, kv)
            return h

        # ---- down path: skips captured BEFORE downsampling ----
        masks = [m0]
        skips = []
        for i, ch in enumerate(channels):
            is_last = i == len(channels) - 1
            m = masks[-1]
            h = ResnetBlock1D(ch, name=f"down_{i}_resnet")(h, m, t_emb)
            h = tf_stack(h, m, ch, f"down_{i}")
            skips.append(h)
            if not is_last:
                h = TapConv(ch, 3, stride=2, padding=1,
                            name=f"down_{i}_downsample")(h * m)
                masks.append(m[:, ::2])
            else:
                h = TapConv(ch, 3, padding=1,
                            name=f"down_{i}_downsample")(h * m)
                masks.append(m)
        masks = masks[:-1]

        # ---- mid ----
        m_mid = masks[-1]
        for i in range(cfg.estimator_num_mid_blocks):
            h = ResnetBlock1D(channels[-1], name=f"mid_{i}_resnet")(h, m_mid, t_emb)
            h = tf_stack(h, m_mid, channels[-1], f"mid_{i}")

        # ---- up path ----
        rev = tuple(channels[::-1]) + (channels[0],)
        for i in range(len(rev) - 1):
            out_ch = rev[i + 1]
            is_last = i == len(rev) - 2
            m = masks.pop()
            skip = skips.pop()
            h = jnp.concatenate([h[:, : skip.shape[1]], skip], axis=-1)
            h = ResnetBlock1D(out_ch, name=f"up_{i}_resnet")(h, m, t_emb)
            h = tf_stack(h, m, out_ch, f"up_{i}")
            if not is_last:
                # torch ConvTranspose1d(4, 2, 1) semantics (matcha Upsample1D)
                h = WNConvTranspose(out_ch, 4, 2, 1,
                                    name=f"up_{i}_upsample")(h * m)
            else:
                h = TapConv(out_ch, 3, padding=1,
                            name=f"up_{i}_upsample")(h * m)
            m_final = m

        h = h[:, : m_final.shape[1]]
        h = Block1D(rev[-1], name="final_block")(h, m_final)
        out = TapConv(n_mels, 1, padding=0, name="final_proj")(h * m_final)
        return out * m_final


class ConditionalCFM(nn.Module):
    """Optimal-transport conditional flow matching (flow_matching.py:18-138).

    `dtype` is the estimator compute dtype (serving runs bf16 on the MXU);
    the ODE state x and the Euler update stay float32 regardless.
    """

    config: FlowConfig
    dtype: Any = jnp.float32

    def setup(self):
        self.estimator = ConditionalDecoder(self.config, name="estimator")

    def __call__(self, rng, mu, mask, spks, cond, n_timesteps: Optional[int] = None,
                 temperature: float = 1.0, z: Optional[jnp.ndarray] = None):
        """Euler ODE solve: noise -> mel.  mu/cond: [B, T, M]; mask [B, T].
        `z` overrides the initial noise (reproducible synthesis / parity)."""
        cfg = self.config
        n = n_timesteps or cfg.n_timesteps
        if z is None:
            z = jax.random.normal(rng, mu.shape, jnp.float32) * temperature
        t_span = jnp.linspace(0.0, 1.0, n + 1)
        if cfg.t_scheduler == "cosine":
            t_span = 1.0 - jnp.cos(t_span * 0.5 * jnp.pi)

        cfg_rate = cfg.inference_cfg_rate
        b = mu.shape[0]

        cdt = self.dtype
        mu_c = mu.astype(cdt)
        spks_c = spks.astype(cdt)
        cond_c = cond.astype(cdt)

        def step(mdl, x, i):
            t = t_span[i]
            dt = t_span[i + 1] - t_span[i]
            if cfg_rate > 0:
                # one batched 2B estimator call: [cond | uncond]
                xc = x.astype(cdt)
                x2 = jnp.concatenate([xc, xc], axis=0)
                mu2 = jnp.concatenate([mu_c, jnp.zeros_like(mu_c)], axis=0)
                spks2 = jnp.concatenate([spks_c, jnp.zeros_like(spks_c)],
                                        axis=0)
                cond2 = jnp.concatenate([cond_c, jnp.zeros_like(cond_c)],
                                        axis=0)
                mask2 = jnp.concatenate([mask, mask], axis=0)
                v2 = mdl.estimator(x2, mask2, mu2, jnp.full((2 * b,), t),
                                   spks2, cond2).astype(jnp.float32)
                v = (1.0 + cfg_rate) * v2[:b] - cfg_rate * v2[b:]
            else:
                v = mdl.estimator(x.astype(cdt), mask, mu_c,
                                  jnp.full((b,), t), spks_c,
                                  cond_c).astype(jnp.float32)
            return x + dt * v, None

        x, _ = nn.scan(step, variable_broadcast="params",
                       split_rngs={"params": False})(self, z, jnp.arange(n))
        return x

    def compute_loss(self, rng, x1, mask, mu, spks, cond):
        """OT-CFM training loss (flow_matching.py:99-138)."""
        cfg = self.config
        b = x1.shape[0]
        rng_t, rng_z, rng_cfg = jax.random.split(rng, 3)
        t = jax.random.uniform(rng_t, (b, 1, 1))
        if cfg.t_scheduler == "cosine":
            t = 1.0 - jnp.cos(t * 0.5 * jnp.pi)
        z = jax.random.normal(rng_z, x1.shape)
        y = (1.0 - (1.0 - cfg.sigma_min) * t) * z + t * x1
        u = x1 - (1.0 - cfg.sigma_min) * z
        if cfg.training_cfg_rate > 0:
            keep = (jax.random.uniform(rng_cfg, (b,)) > cfg.training_cfg_rate)
            mu = mu * keep[:, None, None]
            spks = spks * keep[:, None]
            cond = cond * keep[:, None, None]
        pred = self.estimator(y, mask, mu, t[:, 0, 0], spks, cond)
        maskf = mask.astype(jnp.float32)[:, :, None]
        return jnp.sum((pred - u) ** 2 * maskf) / (jnp.sum(maskf) * x1.shape[-1])


class MaskedDiffWithXvec(nn.Module):
    """Token->mel flow model (flow.py:24-136).

    `dtype` is the serving compute dtype for the token encoder and the CFM
    estimator (training keeps the default float32).
    """

    config: FlowConfig
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        self.input_embedding = nn.Embed(cfg.vocab_size, cfg.input_size)
        self.spk_embed_affine_layer = nn.Dense(cfg.output_size)
        self.encoder = ConformerEncoder(cfg.encoder, name="encoder",
                                        dtype=self.dtype,
                                        remat=cfg.encoder.remat)
        self.encoder_proj = nn.Dense(cfg.output_size)
        self.length_regulator = InterpolateRegulator(cfg.output_size,
                                                     name="length_regulator")
        self.decoder = ConditionalCFM(cfg, dtype=self.dtype, name="decoder")

    def _encode(self, token, token_len, mel_len_max, mel_lengths):
        cfg = self.config
        mask = length_mask(token_len, token.shape[1])
        emb = self.input_embedding(jnp.maximum(token, 0)) * mask[:, :, None]
        h = self.encoder(emb, token_len, causal=False)
        h = self.encoder_proj(h)
        return self.length_regulator(h, mel_len_max, mel_lengths,
                                     in_lengths=token_len)

    def mel_lengths(self, token_len: jnp.ndarray) -> jnp.ndarray:
        """Token count -> mel frame count: len/50 * 22050/256 (flow.py:116)."""
        cfg = self.config
        return (token_len.astype(jnp.float32) / cfg.input_frame_rate
                * 22050.0 / 256.0).astype(jnp.int32)

    def __call__(self, rng, token, token_len, feat, feat_len, embedding):
        """Training loss.  feat: [B, Tm, M] target mel."""
        spk = embedding / jnp.maximum(
            jnp.linalg.norm(embedding, axis=-1, keepdims=True), 1e-8)
        spk = self.spk_embed_affine_layer(spk)
        h = self._encode(token, token_len, feat.shape[1], feat_len)
        conds = jnp.zeros_like(feat)
        mask = length_mask(feat_len, feat.shape[1])
        loss = self.decoder.compute_loss(rng, feat, mask, h, spk, conds)
        return {"loss": loss}

    def inference(self, rng, token, token_len, embedding,
                  mel_len_max: int, n_timesteps: Optional[int] = None):
        """token [B, T] -> mel [B, mel_len_max, M] (masked beyond length)."""
        spk = embedding / jnp.maximum(
            jnp.linalg.norm(embedding, axis=-1, keepdims=True), 1e-8)
        spk = self.spk_embed_affine_layer(spk)
        mel_lengths = jnp.minimum(self.mel_lengths(token_len), mel_len_max)
        h = self._encode(token, token_len, mel_len_max, mel_lengths)
        conds = jnp.zeros((token.shape[0], mel_len_max, self.config.output_size))
        mask = length_mask(mel_lengths, mel_len_max)
        mel = self.decoder(rng, h, mask, spk, conds, n_timesteps)
        return mel * mask[:, :, None], mel_lengths
