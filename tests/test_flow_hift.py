"""Flow-matching + HiFT vocoder tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from taste_spokenlm_tpu.config import FlowConfig, HiFTConfig
from taste_spokenlm_tpu.models.flow import (MaskedDiffWithXvec,
                                            nearest_interpolate)
from taste_spokenlm_tpu.models.hift import (HiFTGenerator, conv_transpose1d,
                                            istft_16, stft_16)
from taste_spokenlm_tpu.models.generator import VoiceGenerator

torch = pytest.importorskip("torch")


def test_nearest_interpolate_matches_torch():
    x = np.random.RandomState(0).randn(2, 7, 3).astype(np.float32)
    out = np.asarray(nearest_interpolate(jnp.asarray(x), 19))
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x).permute(0, 2, 1), size=19, mode="nearest"
    ).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_conv_transpose_matches_torch():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 11, 4).astype(np.float32)
    for k, s, p in [(16, 8, 4), (4, 2, 1), (8, 4, 2)]:
        w = rng.randn(k, 6, 4).astype(np.float32)  # [k, out, in]
        b = rng.randn(6).astype(np.float32)
        ours = np.asarray(conv_transpose1d(jnp.asarray(x), jnp.asarray(w),
                                           jnp.asarray(b), s, p))
        conv = torch.nn.ConvTranspose1d(4, 6, k, s, padding=p)
        with torch.no_grad():
            conv.weight.copy_(torch.from_numpy(w).permute(2, 1, 0))  # [in,out,k]
            conv.bias.copy_(torch.from_numpy(b))
            ref = conv(torch.from_numpy(x).permute(0, 2, 1)).permute(0, 2, 1).numpy()
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_stft_istft_roundtrip_matches_torch():
    rng = np.random.RandomState(2)
    x = rng.randn(2, 400).astype(np.float32)
    re, im = (np.asarray(a) for a in stft_16(jnp.asarray(x), 16, 4))
    win = torch.hann_window(16)
    ref = torch.stft(torch.from_numpy(x), 16, 4, 16, window=win,
                     return_complex=True)
    np.testing.assert_allclose(re, ref.real.numpy(), atol=1e-4)
    np.testing.assert_allclose(im, ref.imag.numpy(), atol=1e-4)

    # istft round trip
    mag = np.abs(ref.numpy())
    phase = np.angle(ref.numpy())
    wav = np.asarray(istft_16(jnp.asarray(mag), jnp.asarray(phase), 16, 4))
    ref_wav = torch.istft(ref, 16, 4, 16, window=win).numpy()
    assert wav.shape == ref_wav.shape
    np.testing.assert_allclose(wav, ref_wav, atol=1e-4)


@pytest.fixture(scope="module")
def tiny_voicegen():
    fc, hc = FlowConfig.tiny(), HiFTConfig.tiny()
    model = VoiceGenerator(fc, hc)
    rng = np.random.RandomState(0)
    b, t = 2, 12
    tokens = jnp.asarray(rng.randint(0, fc.vocab_size, (b, t)))
    lens = jnp.asarray([12, 8])
    spk = jnp.asarray(rng.randn(b, fc.spk_embed_dim), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jax.random.PRNGKey(1),
                           tokens, lens, spk, 32)
    return model, variables, (tokens, lens, spk)


def test_voice_generator_end_to_end(tiny_voicegen):
    model, variables, (tokens, lens, spk) = tiny_voicegen
    hop_total = 16 * 4  # tiny: upsample 4*4, istft hop 4
    wav, wav_lens = model.apply(variables, jax.random.PRNGKey(2), tokens,
                                lens, spk, 32)
    assert wav.shape == (2, 32 * hop_total)
    assert bool(jnp.isfinite(wav).all())
    assert float(jnp.abs(wav).max()) <= 0.99 + 1e-6
    # mel lengths follow len/50*22050/256
    expect = (np.asarray(lens) / 50 * 22050 / 256).astype(int)
    np.testing.assert_array_equal(np.asarray(wav_lens),
                                  np.minimum(expect, 32) * hop_total)


def test_flow_training_loss(tiny_voicegen):
    model, variables, (tokens, lens, spk) = tiny_voicegen
    fc = FlowConfig.tiny()
    rng = np.random.RandomState(3)
    feat = jnp.asarray(rng.randn(2, 20, fc.output_size), jnp.float32)
    flow = MaskedDiffWithXvec(fc)
    fvars = {"params": variables["params"]["flow"]}
    out = flow.apply(fvars, jax.random.PRNGKey(4), tokens, lens, feat,
                     jnp.asarray([20, 15]), spk)
    assert np.isfinite(float(out["loss"]))
    # loss responds to params (gradient flows)
    def loss_fn(p):
        return flow.apply({"params": p}, jax.random.PRNGKey(4), tokens, lens,
                          feat, jnp.asarray([20, 15]), spk)["loss"]
    g = jax.grad(loss_fn)(fvars["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_voice_generator_bf16_serving_dtype(tiny_voicegen):
    """bf16 compute dtype (serving layout) stays close to the f32 vocoder.

    The ODE state and iSTFT head are f32 by design; only the estimator /
    conv compute drops to bf16, so the waveform should track the f32 one
    within bf16 tolerance on the same (f32-valued) weights.
    """
    model, variables, (tokens, lens, spk) = tiny_voicegen
    wav32, _ = model.apply(variables, jax.random.PRNGKey(2), tokens,
                           lens, spk, 32)
    model16 = VoiceGenerator(FlowConfig.tiny(), HiFTConfig.tiny(),
                             dtype=jnp.bfloat16)
    wav16, lens16 = model16.apply(variables, jax.random.PRNGKey(2), tokens,
                                  lens, spk, 32)
    assert bool(jnp.isfinite(wav16).all())
    a = np.asarray(wav32, np.float64).ravel()
    b = np.asarray(wav16, np.float64).ravel()
    rel = np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-9)
    corr = float(np.dot(a, b) / max(np.linalg.norm(a) * np.linalg.norm(b),
                                    1e-9))
    assert rel < 0.35 and corr > 0.93, (rel, corr)
