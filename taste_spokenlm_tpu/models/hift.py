"""HiFT vocoder: NSF source-filter + iSTFT head (HiFTNet), mel -> waveform.

Re-design of /root/reference/taste_speech/modules_taste/cosyvoice/hifigan/
{generator,f0_predictor}.py + activation.Snake for TPU:

* channels-last convs; transposed convs implemented with torch-equivalent
  semantics via lhs-dilated `lax.conv_general_dilated` (exact output
  lengths, so converted checkpoints align sample-for-sample);
* STFT/iSTFT (n_fft 16, hop 4) via XLA rfft/irfft + overlap-add
  scatter-add;
* the sine source generator is a pure function of (f0, rng) — cumsum phase,
  random initial phase per harmonic, voiced/unvoiced noise mixing
  (generator.py:103-166).

Weight-norm convs are stored collapsed (effective weight = g * v/||v||);
the checkpoint converter collapses torch's weight_v/weight_g pairs.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from taste_spokenlm_tpu.config import HiFTConfig


def conv1d(x, w, b=None, stride=1, padding=0, dilation=1):
    """torch-semantics Conv1d on channels-last x [B, T, C]; w [k, Cin, Cout].

    Weights are upcast to the activation dtype (raw lax convs do not
    auto-promote, unlike flax modules — supports bf16-stored checkpoints)."""
    w = w.astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=[(padding, padding)],
        rhs_dilation=(dilation,), dimension_numbers=("NHC", "HIO", "NHC"))
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def conv_transpose1d(x, w, b=None, stride=1, padding=0):
    """torch ConvTranspose1d semantics: x [B, T, C]; w [k, Cout, Cin]
    (flipped + transposed inside).  out_len = (T-1)*stride + k - 2*padding."""
    k = w.shape[0]
    w = w.astype(x.dtype)
    w_conv = jnp.flip(w, axis=0).transpose(0, 2, 1)  # -> [k, Cin, Cout]
    out = jax.lax.conv_general_dilated(
        x, w_conv, window_strides=(1,),
        padding=[(k - 1 - padding, k - 1 - padding)],
        lhs_dilation=(stride,), dimension_numbers=("NHC", "HIO", "NHC"))
    if b is not None:
        out = out + b
    return out


class WNConv(nn.Module):
    """Plain conv storing collapsed weight-norm weights, torch padding.

    `use_pallas` routes eligible shapes (stride 1, same padding, channels
    a multiple of 128) through the MXU tap-loop kernel in
    ops/pallas/conv1d.py; everything else keeps the lax conv."""

    features: int
    kernel: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.kernel, cin, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        if (self.use_pallas and self.stride == 1
                and self.padding == (self.kernel - 1) * self.dilation // 2
                and cin % 128 == 0 and self.features % 128 == 0
                and x.shape[1] >= 4096):
            # small T (streaming windows) loses to XLA: the fixed VMEM
            # tile pads short sequences by up to ~50%
            from taste_spokenlm_tpu.ops.pallas.conv1d import conv1d_same
            return conv1d_same(x, w.astype(x.dtype), b,
                               dilation=self.dilation)
        return conv1d(x, w, b, self.stride, self.padding, self.dilation)


class WNConvTranspose(nn.Module):
    features: int
    kernel: int
    stride: int
    padding: int

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.kernel, self.features, cin))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return conv_transpose1d(x, w, b, self.stride, self.padding)


def snake(x, alpha):
    """Snake activation x + sin^2(alpha x)/alpha (activation.py:34-80)."""
    return x + (1.0 / (alpha + 1e-9)) * jnp.sin(alpha * x) ** 2


class ResBlock(nn.Module):
    """HiFiGAN residual block with Snake activations (generator.py:41-100)."""

    channels: int
    kernel: int = 3
    dilations: Tuple[int, ...] = (1, 3, 5)
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            a1 = self.param(f"alpha1_{i}", nn.initializers.ones, (self.channels,))
            a2 = self.param(f"alpha2_{i}", nn.initializers.ones, (self.channels,))
            pad1 = (self.kernel * d - d) // 2
            pad2 = (self.kernel - 1) // 2
            h = snake(x, a1)
            h = WNConv(self.channels, self.kernel, padding=pad1, dilation=d,
                       use_pallas=self.use_pallas, name=f"conv1_{i}")(h)
            h = snake(h, a2)
            h = WNConv(self.channels, self.kernel, padding=pad2,
                       use_pallas=self.use_pallas, name=f"conv2_{i}")(h)
            x = x + h
        return x


class ConvRNNF0Predictor(nn.Module):
    """5x (WNConv k3 + ELU) + linear classifier -> |f0| (f0_predictor.py)."""

    in_channels: int = 80
    cond_channels: int = 512

    @nn.compact
    def __call__(self, mel):
        h = mel
        for i in range(5):
            h = WNConv(self.cond_channels, 3, padding=1, name=f"cond_{i}")(h)
            h = nn.elu(h)
        f0 = nn.Dense(1, name="classifier")(h)[..., 0]
        return jnp.abs(f0)


def sine_source(rng, f0_up: jnp.ndarray, sampling_rate: int, harmonics: int,
                sine_amp: float, noise_std: float, voiced_threshold: float,
                deterministic: bool = False) -> jnp.ndarray:
    """f0 at sample rate [B, T] -> harmonic source [B, T] (SineGen +
    SourceModuleHnNSF merge happens in the caller).  `deterministic` zeros
    the random initial phases and additive noise (reproducible synthesis /
    golden parity against the reference with its sampling patched out)."""
    b, t = f0_up.shape
    h = jnp.arange(1, harmonics + 2, dtype=jnp.float32)     # [H+1]
    rads = f0_up[:, None, :] * h[None, :, None] / sampling_rate  # [B, H+1, T]
    theta = 2.0 * jnp.pi * (jnp.cumsum(rads, axis=-1) % 1.0)
    uv = (f0_up > voiced_threshold).astype(jnp.float32)[:, None, :]
    if deterministic:
        return sine_amp * jnp.sin(theta) * uv
    rng_phase, rng_noise = jax.random.split(rng)
    phase = jax.random.uniform(rng_phase, (b, harmonics + 1, 1),
                               minval=-jnp.pi, maxval=jnp.pi)
    phase = phase.at[:, 0, :].set(0.0)
    sines = sine_amp * jnp.sin(theta + phase)
    noise_amp = uv * noise_std + (1.0 - uv) * sine_amp / 3.0
    noise = noise_amp * jax.random.normal(rng_noise, sines.shape)
    return sines * uv + noise                               # [B, H+1, T]


def _dft_consts(n_fft: int):
    """Size-n_fft real DFT / inverse-DFT as constant matmul operands.

    At n_fft=16 the transform is a [16, 9]-shaped matmul — far cheaper on
    TPU than dispatching XLA FFTs over ~230k frames, and it keeps the
    whole head in real arithmetic (no complex dtype)."""
    nf = n_fft // 2 + 1
    eye = np.eye(n_fft)
    fwd = np.fft.rfft(eye, axis=-1)                       # frames @ fwd
    inv_r = np.fft.irfft(np.eye(nf), n=n_fft, axis=-1)    # real @ inv_r
    inv_i = np.fft.irfft(1j * np.eye(nf), n=n_fft, axis=-1)
    return (fwd.real.astype(np.float32), fwd.imag.astype(np.float32),
            inv_r.astype(np.float32), inv_i.astype(np.float32))


def _frame_hop_groups(xp: jnp.ndarray, n_fft: int, hop: int,
                      nfrm: int) -> jnp.ndarray:
    """[B, L] -> [B, nfrm, n_fft] frames WITHOUT a gather: hop | n_fft, so
    tap group j of every frame is a strided reshape of a shifted slice
    (TPU scatters/gathers with ~1e6 indices dominate the whole vocoder;
    reshapes are free layout ops)."""
    groups = [
        xp[:, j * hop: j * hop + hop * nfrm].reshape(-1, nfrm, hop)
        for j in range(n_fft // hop)
    ]
    return jnp.concatenate(groups, axis=-1)


def stft_16(x: jnp.ndarray, n_fft: int, hop: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """torch.stft(center=True, reflect) real/imag, [B, F, TT]."""
    assert n_fft % hop == 0, (n_fft, hop)
    win = jnp.asarray(np.hanning(n_fft + 1)[:-1].astype(np.float32))
    fwd_r, fwd_i, _, _ = _dft_consts(n_fft)
    pad = n_fft // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    nfrm = 1 + (xp.shape[1] - n_fft) // hop
    frames = _frame_hop_groups(xp, n_fft, hop, nfrm) * win
    real = frames @ jnp.asarray(fwd_r)                      # [B, TT, F]
    imag = frames @ jnp.asarray(fwd_i)
    return real.transpose(0, 2, 1), imag.transpose(0, 2, 1)


def istft_16(mag: jnp.ndarray, phase: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """torch.istft(center=True) with hann window: [B, F, TT] -> [B, (TT-1)*hop].

    Overlap-add is a sum of n_fft/hop shifted strided reshapes (the exact
    inverse of _frame_hop_groups) instead of a duplicate-index scatter-add
    — XLA scatters with ~4M colliding indices serialize on TPU and were
    the single largest cost of the vocoder stage.  The window-envelope
    normalizer is a host-side numpy constant (static shapes under jit)."""
    assert n_fft % hop == 0, (n_fft, hop)
    win_np = np.hanning(n_fft + 1)[:-1].astype(np.float32)
    _, _, inv_r, inv_i = _dft_consts(n_fft)
    real = (mag * jnp.cos(phase)).transpose(0, 2, 1)        # [B, TT, F]
    imag = (mag * jnp.sin(phase)).transpose(0, 2, 1)
    frames = (real @ jnp.asarray(inv_r)
              + imag @ jnp.asarray(inv_i)) * win_np         # [B, TT, n_fft]
    b, tt, _ = frames.shape
    out_len = n_fft + hop * (tt - 1)
    sig = None
    for j in range(n_fft // hop):
        g = frames[:, :, j * hop:(j + 1) * hop].reshape(b, tt * hop)
        part = jnp.pad(g, ((0, 0), (j * hop, out_len - j * hop - tt * hop)))
        sig = part if sig is None else sig + part
    pos = (np.arange(tt)[:, None] * hop + np.arange(n_fft)[None, :]).reshape(-1)
    wsum = np.zeros((out_len,), np.float32)
    np.add.at(wsum, pos, np.tile(win_np ** 2, tt))
    sig = sig / jnp.asarray(np.maximum(wsum, 1e-8))
    pad = n_fft // 2
    return sig[:, pad:-pad] if pad else sig


class HiFTGenerator(nn.Module):
    """mel [B, T, 80] -> waveform [B, T*256] (generator.py:214-391).

    `dtype` is the conv compute dtype (serving runs bf16 on the MXU); the
    sine source, magnitude/phase head, and iSTFT stay float32.
    """

    config: HiFTConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mel: jnp.ndarray, rng: jax.Array,
                 deterministic: bool = False) -> jnp.ndarray:
        cfg = self.config
        nfft, hop = cfg.istft_n_fft, cfg.istft_hop_len
        up_total = int(np.prod(cfg.upsample_rates)) * hop
        mel = mel.astype(self.dtype)

        # --- F0 -> harmonic source ---
        f0 = ConvRNNF0Predictor(cfg.f0_predictor_in_channels,
                                cfg.f0_predictor_cond_channels,
                                name="f0_predictor")(mel)   # [B, T]
        f0 = f0.astype(jnp.float32)
        f0_up = jnp.repeat(f0, up_total, axis=1)            # nearest upsample
        rng_src, rng = jax.random.split(rng)
        sines = sine_source(rng_src, f0_up, cfg.sampling_rate, cfg.nb_harmonics,
                            cfg.nsf_alpha, cfg.nsf_sigma,
                            cfg.nsf_voiced_threshold,
                            deterministic=deterministic)    # [B, H+1, Ts]
        merged = jnp.tanh(nn.Dense(1, name="source_linear")(
            sines.transpose(0, 2, 1)))[..., 0]              # [B, Ts]
        s_real, s_imag = stft_16(merged, nfft, hop)
        s_stft = jnp.concatenate([s_real, s_imag], axis=1).transpose(0, 2, 1)
        s_stft = s_stft.astype(self.dtype)
        # [B, TT, nfft+2]

        # --- filter path ---
        x = WNConv(cfg.base_channels, 7, padding=3, name="conv_pre")(mel)
        num_up = len(cfg.upsample_rates)
        downsample_rates = [1] + list(cfg.upsample_rates[::-1][:-1])
        down_cum = np.cumprod(downsample_rates)[::-1]
        for i, (u, k) in enumerate(zip(cfg.upsample_rates,
                                       cfg.upsample_kernel_sizes)):
            ch = cfg.base_channels // (2 ** (i + 1))
            x = nn.leaky_relu(x, cfg.lrelu_slope)
            x = WNConvTranspose(ch, k, u, (k - u) // 2, name=f"ups_{i}")(x)
            if i == num_up - 1:
                # reflection pad (1, 0) on time
                x = jnp.concatenate([x[:, 1:2], x], axis=1)

            u_i = int(down_cum[i])
            if u_i == 1:
                si = WNConv(ch, 1, name=f"source_downs_{i}")(s_stft)
            else:
                si = WNConv(ch, u_i * 2, stride=u_i, padding=u_i // 2,
                            name=f"source_downs_{i}")(s_stft)
            si = ResBlock(ch, cfg.source_resblock_kernel_sizes[i],
                          cfg.source_resblock_dilation_sizes[i],
                          use_pallas=cfg.pallas_conv,
                          name=f"source_resblocks_{i}")(si)
            x = x + si[:, : x.shape[1]]

            acc = None
            for j, (k_r, d_r) in enumerate(zip(cfg.resblock_kernel_sizes,
                                               cfg.resblock_dilation_sizes)):
                r = ResBlock(ch, k_r, d_r, use_pallas=cfg.pallas_conv,
                             name=f"resblocks_{i}_{j}")(x)
                acc = r if acc is None else acc + r
            x = acc / len(cfg.resblock_kernel_sizes)

        x = nn.leaky_relu(x, 0.01)
        x = WNConv(nfft + 2, 7, padding=3, name="conv_post")(x)
        x = x.astype(jnp.float32)   # exp/sin + iSTFT stay f32
        mag = jnp.exp(x[..., : nfft // 2 + 1]).transpose(0, 2, 1)
        mag = jnp.minimum(mag, 1e2)
        phase = jnp.sin(x[..., nfft // 2 + 1:]).transpose(0, 2, 1)
        wav = istft_16(mag, phase, nfft, hop)
        return jnp.clip(wav, -cfg.audio_limit, cfg.audio_limit)
