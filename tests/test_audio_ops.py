"""Golden tests for the audio frontend.

The whisper log-mel path is checked end-to-end against a torch.stft-based
mirror of the reference pipeline
(/root/reference/taste_speech/modules_taste/cosyvoice/whisper_frontend.py:56-85);
the kaldi fbank path against an independent per-frame numpy implementation.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from taste_spokenlm_tpu.ops import audio as A


def _rand_audio(b=2, t=16000 * 2, seed=0):
    rng = np.random.RandomState(seed)
    return (rng.randn(b, t) * 0.1).astype(np.float32)


# ---------------------------------------------------------------------------
# STFT vs torch golden
# ---------------------------------------------------------------------------


def test_stft_matches_torch():
    torch = pytest.importorskip("torch")
    x = _rand_audio(2, 8000)
    ours = np.asarray(A.stft_mag2(jnp.asarray(x), n_fft=400, hop=160, drop_last=True))
    window = torch.hann_window(400)
    ref = torch.stft(torch.from_numpy(x), 400, 160, window=window, return_complex=True)
    ref = (ref[..., :-1].abs() ** 2).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_whisper_log_mel_matches_torch_pipeline():
    torch = pytest.importorskip("torch")
    x = _rand_audio(2, 16000)  # 1 s; will be padded to 30 s
    ours = np.asarray(A.whisper_log_mel(jnp.asarray(x), n_mels=128))
    assert ours.shape == (2, 128, 3000)

    # torch mirror of the reference formula, sharing only the filterbank matrix
    xt = torch.from_numpy(x)
    xt = torch.nn.functional.pad(xt, (0, 480000 - xt.shape[-1]))
    window = torch.hann_window(400)
    stft = torch.stft(xt, 400, 160, window=window, return_complex=True)
    mag = stft[..., :-1].abs() ** 2
    filters = torch.from_numpy(A.mel_filterbank_slaney(16000, 400, 128))
    mel = filters @ mag
    log_spec = torch.clamp(mel, min=1e-10).log10()
    log_spec = torch.maximum(log_spec, log_spec.amax(dim=(-2, -1), keepdim=True) - 8.0)
    ref = ((log_spec + 4.0) / 4.0).numpy()
    # float32 fft accumulation differences get amplified by log10 in
    # near-silent bins; 1e-3 in the normalized feature is well below any
    # perceptual / model-input significance.
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)


def test_mel_filterbank_slaney_properties():
    fb = A.mel_filterbank_slaney(16000, 400, 128)
    assert fb.shape == (128, 201)
    assert (fb >= 0).all()
    # every filter is non-empty and unimodal coverage spans the spectrum
    assert (fb.sum(axis=1) > 0).all()
    # slaney normalization: peak value of filter m ~ 2/(width_hz)
    assert fb.max() < 0.1


# ---------------------------------------------------------------------------
# Kaldi fbank vs independent numpy reference
# ---------------------------------------------------------------------------


def _kaldi_fbank_ref(x, n_mels=80):
    """Per-frame loop implementation of kaldi fbank (dither=0, snip_edges)."""
    win, hop, nfft = 400, 160, 512
    n = 1 + (len(x) - win) // hop
    # povey window
    k = np.arange(win)
    w = (0.5 - 0.5 * np.cos(2 * np.pi * k / (win - 1))) ** 0.85
    fb = A.mel_filterbank_kaldi(16000, nfft, n_mels)
    out = np.zeros((n, n_mels))
    for i in range(n):
        f = x[i * hop: i * hop + win].astype(np.float64).copy()
        f -= f.mean()
        f = f - 0.97 * np.concatenate([[f[0]], f[:-1]])
        f *= w
        spec = np.abs(np.fft.rfft(f, nfft)) ** 2
        out[i] = np.log(np.maximum(fb @ spec[:256], np.finfo(np.float32).eps))
    return out


def test_kaldi_fbank_matches_reference_loop():
    x = _rand_audio(1, 3200)[0]
    ours = np.asarray(A.kaldi_fbank(jnp.asarray(x)[None]))[0]
    ref = _kaldi_fbank_ref(x)
    assert ours.shape == ref.shape == (1 + (3200 - 400) // 160, 80)
    # reference loop runs in float64; low-energy log-mel bins differ at ~5e-3
    np.testing.assert_allclose(ours, ref, rtol=1e-2, atol=1e-2)


def test_speaker_features_mean_normalized():
    x = jnp.asarray(_rand_audio(2, 16000))
    feats = A.speaker_fbank_features(x)
    np.testing.assert_allclose(np.asarray(feats.mean(axis=1)), 0.0, atol=1e-5)


# ---------------------------------------------------------------------------
# Resampling
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("orig,new", [(22050, 16000), (16000, 22050), (44100, 16000)])
def test_resample_preserves_sine(orig, new):
    t = np.arange(int(orig * 0.5)) / orig
    freq = 440.0
    x = np.sin(2 * np.pi * freq * t).astype(np.float32)[None]
    y = np.asarray(A.resample(jnp.asarray(x), orig, new))[0]
    expected_len = int(np.ceil(new * x.shape[1] / orig))
    assert len(y) == expected_len
    # compare against ideal sine at the new rate, ignoring filter edges
    t2 = np.arange(expected_len) / new
    ref = np.sin(2 * np.pi * freq * t2)
    margin = 200
    err = np.abs(y[margin:-margin] - ref[margin:-margin]).max()
    assert err < 5e-3, err


def test_resample_identity():
    x = jnp.asarray(_rand_audio(1, 1000))
    y = A.resample(x, 16000, 16000)
    assert y is x


def test_pad_or_trim():
    x = jnp.ones((2, 100))
    assert A.pad_or_trim(x, 50).shape == (2, 50)
    padded = A.pad_or_trim(x, 200)
    assert padded.shape == (2, 200)
    assert float(padded[:, 100:].sum()) == 0.0


def test_flow_mel_matches_torch_matcha_recipe():
    """flow_mel vs a torch re-statement of matcha.utils.audio.mel_spectrogram
    (reflect pad (n_fft-hop)/2, torch.stft center=False, sqrt(pow+1e-9),
    slaney mel, log(clamp 1e-5)) — the CosyVoice flow training target
    (third_party/Matcha-TTS/matcha/utils/audio.py:44-80)."""
    torch = pytest.importorskip("torch")
    n_fft, hop, n_mels, sr = 1024, 256, 80, 22050
    x = _rand_audio(2, sr, seed=3)

    y = torch.from_numpy(x)
    pad = (n_fft - hop) // 2
    y = torch.nn.functional.pad(y.unsqueeze(1), (pad, pad),
                                mode="reflect").squeeze(1)
    spec = torch.stft(y, n_fft, hop_length=hop, win_length=n_fft,
                      window=torch.hann_window(n_fft), center=False,
                      normalized=False, onesided=True, return_complex=True)
    spec = torch.sqrt(spec.abs().pow(2) + 1e-9)
    fb = torch.from_numpy(A.mel_filterbank_slaney(sr, n_fft, n_mels,
                                                  0.0, 8000.0))
    ref = torch.log(torch.clamp(fb @ spec, min=1e-5)).transpose(1, 2).numpy()

    ours = np.asarray(A.flow_mel(jnp.asarray(x)))
    assert ours.shape == ref.shape == (2, sr // hop, n_mels)
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-4)
