"""Audio tower tests: shapes, jit-compile as one graph, word pooling effect."""

import numpy as np
import jax
import jax.numpy as jnp

from taste_spokenlm_tpu.config import AudioTowerConfig
from taste_spokenlm_tpu.models.audio_tower import TasteAudioTower


import pytest


@pytest.fixture(scope="module")
def setup():
    return _setup()


def _setup(seed=0):
    cfg = AudioTowerConfig.tiny()
    tower = TasteAudioTower(cfg)
    rng = np.random.RandomState(seed)
    b, t_tok = 2, 8
    t_mel = cfg.whisper.max_source_positions * 2  # conv stride 2
    mel = jnp.asarray(rng.randn(b, cfg.whisper.n_mels, t_mel), jnp.float32)
    ids = jnp.asarray(rng.randint(0, cfg.whisper.vocab_size, (b, t_tok)))
    lens = jnp.asarray([8, 5])
    word_ids = jnp.asarray([[0, 0, 1, 1, 1, 2, 3, 3],
                            [0, 1, 1, 2, 2, 0, 0, 0]])
    variables = tower.init(jax.random.PRNGKey(0), mel, ids, lens, word_ids)
    return cfg, tower, variables, (mel, ids, lens, word_ids)


def test_tower_shapes_and_jit(setup):
    cfg, tower, variables, (mel, ids, lens, word_ids) = setup

    @jax.jit
    def run(v, mel, ids, lens, word_ids):
        return tower.apply(v, mel, ids, lens, word_ids)

    out = run(variables, mel, ids, lens, word_ids)
    d = cfg.whisper.d_model
    assert out["audio_unit_embeds"].shape == (2, 8, d)
    assert out["quantized_indices"].shape == (2, 8, cfg.quantizer.num_quantizers)
    assert np.asarray(out["audio_unit_lengths"]).tolist() == [8, 5]
    assert bool(jnp.isfinite(out["audio_unit_embeds"]).all())


def test_word_level_pooling_equalizes_subwords(setup):
    cfg, tower, variables, (mel, ids, lens, word_ids) = setup
    feats = tower.apply(variables, mel, ids, lens, word_ids,
                        method=lambda m, *a: m._segment(*a))
    f = np.asarray(feats)
    # tokens 0,1 share word 0 in sample 0 -> identical pooled features
    np.testing.assert_allclose(f[0, 0], f[0, 1], atol=1e-5)
    np.testing.assert_allclose(f[0, 2], f[0, 3], atol=1e-5)
    np.testing.assert_allclose(f[0, 2], f[0, 4], atol=1e-5)
    # tokens of different words differ
    assert np.abs(f[0, 0] - f[0, 2]).max() > 1e-4


def test_tower_uses_split_kv(setup):
    """Perturbing the layer-6 (value-source) path must change the output even
    when the final encoder hidden is held fixed — i.e. the split-KV path is
    live."""
    cfg, tower, variables, (mel, ids, lens, word_ids) = setup
    seg = lambda v: np.asarray(tower.apply(  # noqa: E731
        v, mel, ids, lens, word_ids, method=lambda m, *a: m._segment(*a)))
    out1 = seg(variables)

    # V comes from the layer-6 (target) hidden, K from the final hidden.
    # Perturb an encoder layer AFTER the target layer: target_hidden (V
    # source) is unchanged, K changes -> attention weights, hence output,
    # must still change (proves the K path is the final hidden).
    import flax
    flat = flax.traverse_util.flatten_dict(variables["params"])
    # bump the last encoder layer's fc2 kernel (affects last_hidden only;
    # target layer for tiny config collects before layer index 1... ensure we
    # change a layer >= target_hidden_layer)
    key = ("encoder", f"layers_{cfg.whisper.encoder_layers - 1}", "fc2", "kernel")
    flat2 = dict(flat)
    # random perturbation (a constant bump would be cancelled by LayerNorm)
    flat2[key] = flat[key] + 0.05 * np.random.RandomState(9).randn(*flat[key].shape)
    v2 = {"params": flax.traverse_util.unflatten_dict(flat2),
          "quantizer": variables["quantizer"]}
    out2 = seg(v2)
    assert np.abs(out1 - out2).max() > 1e-6


def test_skip_vq_returns_continuous(setup):
    cfg, tower, variables, (mel, ids, lens, word_ids) = setup
    out = tower.apply(variables, mel, ids, lens, word_ids, False, None, True)
    assert "quantized_indices" not in out
    assert out["audio_unit_embeds"].shape == (2, 8, cfg.whisper.d_model)
