"""Pallas tap-loop conv1d (ops/pallas/conv1d.py): parity vs the lax conv
and the HiFT routing flag.  Runs in interpret mode on CPU."""

import numpy as np
import jax
import jax.numpy as jnp

from taste_spokenlm_tpu.config import HiFTConfig
from taste_spokenlm_tpu.models.hift import HiFTGenerator, conv1d
from taste_spokenlm_tpu.ops.pallas.conv1d import conv1d_same


def test_conv1d_same_matches_lax():
    rng = np.random.RandomState(0)
    for (b, t, cin, cout, k, d) in [(1, 300, 128, 128, 7, 3),
                                    (2, 97, 128, 256, 3, 1),
                                    (1, 513, 256, 128, 11, 5)]:
        x = jnp.asarray(rng.randn(b, t, cin), jnp.float32)
        w = jnp.asarray(rng.randn(k, cin, cout) * 0.1, jnp.float32)
        bias = jnp.asarray(rng.randn(cout), jnp.float32)
        ref = conv1d(x, w, bias, padding=(k - 1) * d // 2, dilation=d)
        got = conv1d_same(x, w, bias, dilation=d, tile=128)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4, rtol=2e-4)


def test_hift_pallas_conv_routing_matches():
    """pallas_conv=True must not change the waveform (eligible stages are
    re-expressed, ineligible ones keep the lax conv)."""
    cfg = HiFTConfig.tiny().replace(base_channels=256)  # stage-0 ch = 128
    rng = np.random.RandomState(1)
    mel = jnp.asarray(rng.randn(1, 24, cfg.in_channels) * 0.2, jnp.float32)
    gen_ref = HiFTGenerator(cfg)
    variables = gen_ref.init(jax.random.PRNGKey(0), mel, jax.random.PRNGKey(1))
    wav_ref = gen_ref.apply(variables, mel, jax.random.PRNGKey(2),
                            deterministic=True)
    gen_pl = HiFTGenerator(cfg.replace(pallas_conv=True))
    wav_pl = gen_pl.apply(variables, mel, jax.random.PRNGKey(2),
                          deterministic=True)
    np.testing.assert_allclose(np.asarray(wav_pl), np.asarray(wav_ref),
                               atol=5e-4, rtol=1e-3)
