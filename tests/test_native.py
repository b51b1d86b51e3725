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
