"""Batched, jittable audio frontend ops.

TPU-first re-design of the reference's per-sample CPU preprocessing
(/root/reference/taste_speech/modules_taste/cosyvoice/whisper_frontend.py:56-113,
processing_taste.py:295-324): everything here is a pure function over fixed
shapes, vmappable over the batch, so the whole frontend compiles into one XLA
program.  Filterbank matrices are host-side numpy constants (closed over as
jnp constants), so mel extraction is a single [n_mels, n_freq] x
[n_freq, n_frames] matmul on the MXU.

Numerics notes
--------------
* Whisper log-mel: hann(400) periodic window, hop 160, center/reflect padding,
  drop-last-frame, |.|^2, slaney-normalized mel filterbank (identical to the
  librosa-generated filters shipped with openai-whisper), clamp 1e-10, log10,
  clip at (global max - 8), then (x+4)/4.
* Kaldi fbank-80: 25 ms povey-windowed frames, 10 ms shift, snip-edges, DC
  removal, pre-emphasis 0.97, FFT padded to 512, HTK mel scale, log with
  epsilon floor — matches torchaudio.compliance.kaldi.fbank(num_mel_bins=80,
  dither=0) used for the CAM++ speaker embedding
  (/root/reference/taste_speech/processing_taste.py:298-303).
* Resampling: Kaiser-free windowed-sinc polyphase (hann-windowed sinc,
  lowpass_filter_width=6, rolloff 0.99) equivalent to torchaudio's default
  `Resample`, expressed as a strided conv so XLA maps it onto the MXU.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Mel filterbanks (host-side constants)
# ---------------------------------------------------------------------------


def _hz_to_mel_slaney(f: np.ndarray) -> np.ndarray:
    """librosa (slaney/auditory-toolbox) mel scale: linear below 1 kHz."""
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = f >= min_log_hz
    mels = np.where(log_region, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mels)
    return mels


def _mel_to_hz_slaney(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = m >= min_log_mel
    freqs = np.where(log_region, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)
    return freqs


@functools.lru_cache(maxsize=8)
def mel_filterbank_slaney(sr: int = 16000, n_fft: int = 400, n_mels: int = 128,
                          fmin: float = 0.0, fmax: Optional[float] = None) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, identical to
    librosa.filters.mel(htk=False, norm='slaney') which generated the
    whisper-shipped mel_filters asset.  Returns [n_mels, 1 + n_fft//2]."""
    if fmax is None:
        fmax = sr / 2.0
    n_freqs = 1 + n_fft // 2
    fft_freqs = np.linspace(0.0, sr / 2.0, n_freqs)
    mel_pts = np.linspace(_hz_to_mel_slaney(np.array(fmin)),
                          _hz_to_mel_slaney(np.array(fmax)), n_mels + 2)
    hz_pts = _mel_to_hz_slaney(mel_pts)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts.reshape(-1, 1) - fft_freqs.reshape(1, -1)
    lower = -ramps[:-2] / fdiff[:-1].reshape(-1, 1)
    upper = ramps[2:] / fdiff[1:].reshape(-1, 1)
    weights = np.maximum(0.0, np.minimum(lower, upper))
    # slaney normalization: each filter has ~equal area
    enorm = 2.0 / (hz_pts[2: n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm.reshape(-1, 1)
    return weights.astype(np.float32)


def _hz_to_mel_htk(f):
    return 1127.0 * np.log(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz_htk(m):
    return 700.0 * (np.exp(np.asarray(m, dtype=np.float64) / 1127.0) - 1.0)


@functools.lru_cache(maxsize=8)
def mel_filterbank_kaldi(sr: int = 16000, padded_n_fft: int = 512, n_mels: int = 80,
                         low_freq: float = 20.0, high_freq: float = 0.0) -> np.ndarray:
    """Kaldi-style mel banks (HTK scale, un-normalized triangles) over the
    padded FFT bins, matching torchaudio.compliance.kaldi.get_mel_banks.
    Returns [n_mels, padded_n_fft//2]  (kaldi drops the nyquist bin)."""
    if high_freq <= 0.0:
        high_freq = sr / 2.0 + high_freq
    n_bins = padded_n_fft // 2
    fft_bin_width = sr / padded_n_fft
    mel_low = _hz_to_mel_htk(low_freq)
    mel_high = _hz_to_mel_htk(high_freq)
    mel_delta = (mel_high - mel_low) / (n_mels + 1)
    bins = np.arange(n_bins, dtype=np.float64) * fft_bin_width
    mel_of_bin = _hz_to_mel_htk(bins)
    out = np.zeros((n_mels, n_bins), dtype=np.float64)
    for m in range(n_mels):
        left, center, right = (mel_low + m * mel_delta,
                               mel_low + (m + 1) * mel_delta,
                               mel_low + (m + 2) * mel_delta)
        up = (mel_of_bin - left) / (center - left)
        down = (right - mel_of_bin) / (right - center)
        out[m] = np.maximum(0.0, np.minimum(up, down))
    return out.astype(np.float32)


# ---------------------------------------------------------------------------
# STFT / framing
# ---------------------------------------------------------------------------


def hann_window(n: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic hann window (torch.hann_window default)."""
    k = jnp.arange(n, dtype=jnp.float32)
    return (0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * k / n)).astype(dtype)


def povey_window(n: int, dtype=jnp.float32) -> jnp.ndarray:
    """Kaldi 'povey' window: hann(symmetric)**0.85."""
    k = jnp.arange(n, dtype=jnp.float32)
    hann_sym = 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * k / (n - 1))
    return (hann_sym ** 0.85).astype(dtype)


def frame_signal(x: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """[..., T] -> [..., n_frames, frame_length] via gather of a strided index
    grid (static shapes; XLA lowers this to an efficient gather)."""
    t = x.shape[-1]
    n_frames = 1 + (t - frame_length) // hop
    idx = (np.arange(n_frames)[:, None] * hop + np.arange(frame_length)[None, :])
    return x[..., idx]


def stft_mag2(x: jnp.ndarray, n_fft: int = 400, hop: int = 160,
              window: Optional[jnp.ndarray] = None, drop_last: bool = True) -> jnp.ndarray:
    """Power spectrogram matching torch.stft(center=True, pad_mode='reflect').

    x: [..., T] -> [..., n_freq, n_frames]  with n_frames = T//hop (+1 if not
    drop_last).  Whisper drops the final frame (whisper_frontend.py:64-66).
    """
    if window is None:
        window = hann_window(n_fft, x.dtype)
    pad = n_fft // 2
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    frames = frame_signal(xp, n_fft, hop) * window
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    mag2 = (spec.real ** 2 + spec.imag ** 2)
    mag2 = jnp.moveaxis(mag2, -1, -2)  # [..., n_freq, n_frames]
    if drop_last:
        mag2 = mag2[..., :-1]
    return mag2


# ---------------------------------------------------------------------------
# Whisper log-mel
# ---------------------------------------------------------------------------


def pad_or_trim(x: jnp.ndarray, n_samples: int) -> jnp.ndarray:
    """Pad with zeros / trim to exactly n_samples along the last axis."""
    t = x.shape[-1]
    if t >= n_samples:
        return x[..., :n_samples]
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, n_samples - t)])


def whisper_log_mel(audio: jnp.ndarray, n_mels: int = 128, sr: int = 16000,
                    n_fft: int = 400, hop: int = 160,
                    do_pad_trim: bool = True, n_samples: int = 480000) -> jnp.ndarray:
    """Whisper log-mel spectrogram, batched.

    audio: [B, T] float32 in [-1, 1] at 16 kHz -> [B, n_mels, n_frames].
    Matches /root/reference/taste_speech/modules_taste/cosyvoice/
    whisper_frontend.py:56-85 (incl. the global-max clip being computed over
    the padded 30 s window, as the reference does after pad_or_trim).
    """
    if audio.ndim == 1:
        audio = audio[None]
    if do_pad_trim:
        audio = pad_or_trim(audio, n_samples)
    mag2 = stft_mag2(audio.astype(jnp.float32), n_fft, hop, drop_last=True)
    mel_fb = jnp.asarray(mel_filterbank_slaney(sr, n_fft, n_mels))
    mel = jnp.einsum("mf,bft->bmt", mel_fb, mag2)
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    gmax = jnp.max(log_spec, axis=(-2, -1), keepdims=True)
    log_spec = jnp.maximum(log_spec, gmax - 8.0)
    return (log_spec + 4.0) / 4.0


def mel_frame_length(sample_length: jnp.ndarray, hop: int = 160) -> jnp.ndarray:
    """Valid mel frames for a given sample count (whisper_frontend.py:73-74)."""
    return sample_length // hop


def flow_mel(audio: jnp.ndarray, sr: int = 22050, n_fft: int = 1024,
             hop: int = 256, n_mels: int = 80, fmin: float = 0.0,
             fmax: float = 8000.0) -> jnp.ndarray:
    """CosyVoice/Matcha mel for flow-matching training targets.

    audio: [B, T] float32 in [-1, 1] at 22.05 kHz -> [B, T//hop, n_mels]
    (time-major, the layout MaskedDiffWithXvec consumes).  Matches
    matcha.utils.audio.mel_spectrogram with the CosyVoice train config
    (n_fft 1024, hop 256, win 1024, 80 mels, fmax 8000, center=False after
    an (n_fft-hop)/2 reflect pad; sqrt(power + 1e-9) magnitude; slaney
    filterbank; log(clamp(., 1e-5)) dynamic-range compression) —
    third_party/Matcha-TTS/matcha/utils/audio.py:44-80,
    cosyvoice/dataset/.local/config_for_test.yaml:32-40."""
    if audio.ndim == 1:
        audio = audio[None]
    pad = (n_fft - hop) // 2
    xp = jnp.pad(audio.astype(jnp.float32), [(0, 0), (pad, pad)],
                 mode="reflect")
    frames = frame_signal(xp, n_fft, hop) * hann_window(n_fft)
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    mag = jnp.sqrt(spec.real ** 2 + spec.imag ** 2 + 1e-9)
    fb = jnp.asarray(mel_filterbank_slaney(sr, n_fft, n_mels, fmin, fmax))
    mel = jnp.einsum("mf,btf->btm", fb, mag)
    return jnp.log(jnp.maximum(mel, 1e-5))


# ---------------------------------------------------------------------------
# Kaldi fbank (speaker-embedding path)
# ---------------------------------------------------------------------------


def kaldi_fbank(audio: jnp.ndarray, sr: int = 16000, n_mels: int = 80,
                frame_length_ms: float = 25.0, frame_shift_ms: float = 10.0,
                preemphasis: float = 0.97, remove_dc: bool = True) -> jnp.ndarray:
    """Log mel-filterbank features a la torchaudio.compliance.kaldi.fbank
    (dither=0).  audio: [B, T] float32 (kaldi scale: +-2**15 or normalized;
    scale only shifts the log features by a constant).

    Returns [B, n_frames, n_mels] with n_frames = 1 + (T - 400)//160
    (snip_edges=True).
    """
    if audio.ndim == 1:
        audio = audio[None]
    win = int(sr * frame_length_ms / 1000.0)   # 400
    hop = int(sr * frame_shift_ms / 1000.0)    # 160
    padded_n_fft = 1 << (win - 1).bit_length()  # 512
    frames = frame_signal(audio.astype(jnp.float32), win, hop)  # [B,N,400]
    if remove_dc:
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    if preemphasis:
        prev = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
        frames = frames - preemphasis * prev
    frames = frames * povey_window(win)
    spec = jnp.fft.rfft(frames, n=padded_n_fft, axis=-1)
    power = spec.real ** 2 + spec.imag ** 2
    power = power[..., : padded_n_fft // 2]  # kaldi drops nyquist bin
    mel_fb = jnp.asarray(mel_filterbank_kaldi(sr, padded_n_fft, n_mels))
    mel = jnp.einsum("mf,bnf->bnm", mel_fb, power)
    return jnp.log(jnp.maximum(mel, jnp.finfo(jnp.float32).eps))


def speaker_fbank_features(audio: jnp.ndarray) -> jnp.ndarray:
    """CAM++ input features: fbank-80 with per-utterance mean subtraction
    (/root/reference/taste_speech/processing_taste.py:298-303)."""
    feats = kaldi_fbank(audio)
    return feats - jnp.mean(feats, axis=1, keepdims=True)


# ---------------------------------------------------------------------------
# Resampling
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=16)
def _resample_kernel_np(orig_freq: int, new_freq: int,
                        lowpass_filter_width: int = 6,
                        rolloff: float = 0.99) -> Tuple[np.ndarray, int, int, int]:
    """Polyphase windowed-sinc kernel (torchaudio sinc_interp_hann semantics).

    Returns (kernel [new/gcd, 1, width], orig_freq/gcd, new_freq/gcd, width).
    """
    g = math.gcd(orig_freq, new_freq)
    orig, new = orig_freq // g, new_freq // g
    # anti-aliasing cutoff (in the gcd-reduced rate grid)
    base_freq_hz = min(orig, new) / 2.0 * rolloff
    width = int(np.ceil(lowpass_filter_width * orig / base_freq_hz))
    idx = np.arange(-width, width + orig, dtype=np.float64)[None] / orig  # [1, K]
    t = np.arange(0, -new, -1, dtype=np.float64)[:, None] / new + idx  # [new, K]
    t = t * base_freq_hz
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)
    window = np.cos(t * np.pi / lowpass_filter_width / 2) ** 2
    scale = base_freq_hz / orig
    kernel = np.where(t == 0, 1.0, np.sinc(t)) * window * scale
    return kernel.astype(np.float32)[:, None, :], orig, new, width


def resample(audio: jnp.ndarray, orig_freq: int, new_freq: int) -> jnp.ndarray:
    """Windowed-sinc resampling matching torchaudio.transforms.Resample
    defaults, as one grouped conv (MXU-friendly).  audio: [B, T] -> [B, T'].
    """
    if orig_freq == new_freq:
        return audio
    kernel, orig, new, width = _resample_kernel_np(orig_freq, new_freq)
    b, t = audio.shape
    audio_f = audio.astype(jnp.float32)
    padded = jnp.pad(audio_f, ((0, 0), (width, width + orig)))
    out = jax.lax.conv_general_dilated(
        padded[:, None, :], jnp.asarray(kernel),
        window_strides=(orig,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )  # [B, new, frames]
    out = jnp.transpose(out, (0, 2, 1)).reshape(b, -1)
    target_len = int(math.ceil(new * t / orig))
    return out[:, :target_len]
