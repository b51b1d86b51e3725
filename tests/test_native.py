"""Native C++ audio library vs the JAX ops (same math, two implementations)."""

import os
import shutil
import wave

import numpy as np
import pytest
import jax.numpy as jnp

from taste_spokenlm_tpu.ops import audio as A

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no C++ toolchain")

from taste_spokenlm_tpu.data import native  # noqa: E402


def test_native_resample_matches_jax():
    rng = np.random.RandomState(0)
    x = (rng.randn(22050) * 0.3).astype(np.float32)
    ours = native.resample(x, 22050, 16000)
    ref = np.asarray(A.resample(jnp.asarray(x)[None], 22050, 16000))[0]
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_native_resample_batch_threads():
    rng = np.random.RandomState(1)
    sigs = [(rng.randn(n) * 0.1).astype(np.float32)
            for n in (16000, 8000, 12345)]
    outs = native.resample_batch(sigs, 16000, 22050, num_threads=3)
    for s, o in zip(sigs, outs):
        ref = np.asarray(A.resample(jnp.asarray(s)[None], 16000, 22050))[0]
        np.testing.assert_allclose(o, ref, atol=2e-5)


def test_wav_read_pcm16_stereo_mixdown(tmp_path):
    sr = 16000
    t = np.arange(sr) / sr
    left = np.sin(2 * np.pi * 440 * t)
    right = np.sin(2 * np.pi * 440 * t) * 0.5
    inter = np.stack([left, right], 1).reshape(-1)
    pcm = (inter * 32767).astype("<i2")
    path = str(tmp_path / "test.wav")
    with wave.open(path, "wb") as f:
        f.setnchannels(2)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(pcm.tobytes())

    wav, got_sr = native.wav_read(path)
    assert got_sr == sr
    assert len(wav) == sr
    np.testing.assert_allclose(wav, (left + right) / 2, atol=1e-3)


def test_wav_read_missing_file():
    with pytest.raises(RuntimeError):
        native.wav_read("/nonexistent/file.wav")


def _write_raw_wav(path, data_bytes, fmt, channels, sr, bits):
    """Hand-rolled RIFF writer (stdlib `wave` cannot write float/24-bit)."""
    import struct
    fmt_chunk = struct.pack("<HHIIHH", fmt, channels, sr,
                            sr * channels * bits // 8,
                            channels * bits // 8, bits)
    body = (b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
            + b"data" + struct.pack("<I", len(data_bytes)) + data_bytes)
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body)


def _sine(sr=8000, hz=220.0, n=None):
    t = np.arange(n or sr) / sr
    return (0.6 * np.sin(2 * np.pi * hz * t)).astype(np.float32)


def _encode(x, kind):
    if kind == "pcm16":
        return (np.clip(x, -1, 1) * 32767).astype("<i2").tobytes(), 1, 16
    if kind == "pcm24":
        s = (np.clip(x, -1, 1) * 8388607).astype(np.int64)
        b = np.zeros((len(s), 3), np.uint8)
        b[:, 0] = s & 0xFF
        b[:, 1] = (s >> 8) & 0xFF
        b[:, 2] = (s >> 16) & 0xFF
        return b.tobytes(), 1, 24
    if kind == "pcm32":
        return (np.clip(x, -1, 1) * 2147483647).astype("<i4").tobytes(), 1, 32
    if kind == "f32":
        return x.astype("<f4").tobytes(), 3, 32
    if kind == "f64":
        return x.astype("<f8").tobytes(), 3, 64
    raise ValueError(kind)


@pytest.mark.parametrize("kind,native_too", [
    ("pcm16", True), ("pcm24", True), ("pcm32", True), ("f32", True),
    ("f64", False),   # f64 is python-fallback-only
])
def test_wav_read_formats_both_readers(tmp_path, kind, native_too):
    """VERDICT r4 #10: every uncompressed wav layout the reference's
    torchaudio `load_wav` accepts (processing_taste.py:25-31) decodes
    through BOTH the C++ reader and the pure-python fallback."""
    sr = 8000
    x = _sine(sr)
    data, fmt, bits = _encode(x, kind)
    path = str(tmp_path / f"{kind}.wav")
    _write_raw_wav(path, data, fmt, 1, sr, bits)
    tol = {"pcm16": 1e-4, "pcm24": 1e-6, "pcm32": 1e-7,
           "f32": 0.0, "f64": 1e-7}[kind]
    got, got_sr = native.py_wav_read(path)
    assert got_sr == sr and len(got) == len(x)
    np.testing.assert_allclose(got, x, atol=max(tol, 1e-7))
    if native_too:
        got_c, sr_c = native.wav_read(path)
        assert sr_c == sr
        np.testing.assert_allclose(got_c, x, atol=max(tol, 1e-7))


def test_py_wav_read_stereo_and_extensible(tmp_path):
    import struct
    sr = 8000
    x = _sine(sr, n=4000)
    inter = np.stack([x, 0.5 * x], 1).reshape(-1)
    data, fmt, bits = _encode(inter, "pcm16")
    path = str(tmp_path / "st.wav")
    _write_raw_wav(path, data, fmt, 2, sr, bits)
    got, _ = native.py_wav_read(path)
    np.testing.assert_allclose(got, 0.75 * x, atol=1e-3)
    # WAVE_FORMAT_EXTENSIBLE wrapper around float32
    d32, _, _ = _encode(x, "f32")
    ext = struct.pack("<HHIIHH", 0xFFFE, 1, sr, sr * 4, 4, 32)
    # cbSize=22, wValidBitsPerSample, dwChannelMask, then the sub-format
    # GUID whose first 2 bytes carry the real format tag (3 = IEEE float)
    ext += struct.pack("<HHIH", 22, 32, 1 << 2, 3) + b"\x00" * 14
    body = (b"fmt " + struct.pack("<I", len(ext)) + ext
            + b"data" + struct.pack("<I", len(d32)) + d32)
    pe = str(tmp_path / "ext.wav")
    with open(pe, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body)
    got_e, _ = native.py_wav_read(pe)
    np.testing.assert_allclose(got_e, x, atol=1e-7)


def test_py_wav_read_rejects_compressed(tmp_path):
    import struct
    path = str(tmp_path / "bad.wav")
    _write_raw_wav(path, b"\x00" * 64, 85, 1, 8000, 0)  # fmt 85 = mp3
    with pytest.raises(ValueError, match="arrow shards"):
        native.py_wav_read(path)


def test_cli_load_audio_formats(tmp_path):
    """generate_audio.load_audio end-to-end over every wav layout,
    including the resample leg."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "generate_audio", os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
            "scripts", "generate_audio.py"))
    ga = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ga)
    sr = 8000
    x = _sine(sr)
    for kind in ("pcm16", "pcm24", "pcm32", "f32"):
        data, fmt, bits = _encode(x, kind)
        path = str(tmp_path / f"cli_{kind}.wav")
        _write_raw_wav(path, data, fmt, 1, sr, bits)
        out = ga.load_audio(path, sr)
        np.testing.assert_allclose(out, x, atol=1e-3)
        res = ga.load_audio(path, 16000)
        assert abs(len(res) - 2 * len(x)) <= 2
        assert np.isfinite(res).all()
