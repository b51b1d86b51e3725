"""Residual VQ tests: round-trips, EMA learning, dropout, extension APIs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from taste_spokenlm_tpu.config import QuantizerConfig
from taste_spokenlm_tpu.models.quantizer import ResidualVQ, kmeans


def _cfg(**kw):
    base = dict(dim=32, codebook_dim=8, codebook_size=16, num_quantizers=3,
                kmeans_iters=8)
    base.update(kw)
    return QuantizerConfig(**base)


def _make(cfg=None, seed=0, init_samples=None):
    cfg = cfg or _cfg()
    rvq = ResidualVQ(cfg)
    x = jnp.asarray(np.random.RandomState(seed).randn(2, 6, cfg.dim), jnp.float32)
    variables = rvq.init(jax.random.PRNGKey(seed), x)
    if init_samples is not None:
        proj = variables["params"].get("project_in") if cfg.codebook_dim != cfg.dim else None
        z = init_samples
        if proj is not None:
            z = z @ proj["kernel"] + proj["bias"]
        qstate = rvq.apply(variables, jax.random.PRNGKey(1), z.reshape(-1, cfg.codebook_dim),
                           method=ResidualVQ.init_codebook_state)
        variables = {"params": variables.get("params", {}), "quantizer": qstate}
    return rvq, variables, x


def test_kmeans_clusters_separable_data():
    rng = np.random.RandomState(0)
    centers = rng.randn(4, 8) * 10
    pts = np.concatenate([centers[i] + 0.01 * rng.randn(50, 8) for i in range(4)])
    c, sizes = kmeans(jax.random.PRNGKey(0), jnp.asarray(pts, jnp.float32), 4, 20)
    # every true center is within 0.1 of some learned centroid
    d = np.linalg.norm(np.asarray(c)[None] - centers[:, None], axis=-1).min(1)
    assert (d < 0.1).all(), d
    assert float(jnp.asarray(sizes).sum()) == 200


def test_forward_shapes_and_roundtrip():
    rvq, variables, x = _make(init_samples=jnp.asarray(
        np.random.RandomState(0).randn(2, 6, 32), jnp.float32))
    out = rvq.apply(variables, x)
    assert out["quantized_feats"].shape == (2, 6, 32)
    assert out["quantized_indices"].shape == (2, 6, 3)
    assert out["commit_loss"].shape == ()
    # decode from indices must reproduce the quantized output exactly
    decoded = rvq.apply(variables, out["quantized_indices"],
                        method=ResidualVQ.get_output_from_indices)
    # straight-through output = z + sg(q - z); decode = project_out(q):
    # compare in codebook space instead
    code = rvq.apply(variables, out["quantized_indices"],
                     method=ResidualVQ.get_code_from_indices)
    reenc = rvq.apply(variables, code, method=ResidualVQ.get_indices_from_code)
    np.testing.assert_array_equal(np.asarray(reenc),
                                  np.asarray(out["quantized_indices"]))
    assert decoded.shape == (2, 6, 32)


def test_quantization_reduces_error_with_depth():
    """More RVQ levels => smaller reconstruction error (on the init batch)."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(8, 32, 32), jnp.float32)
    errs = []
    for nq in (1, 2, 4):
        cfg = _cfg(num_quantizers=nq, codebook_size=32, kmeans_iters=20)
        rvq, variables, _ = _make(cfg, init_samples=x)
        out = rvq.apply(variables, x)
        z_in = x @ variables["params"]["project_in"]["kernel"] + \
            variables["params"]["project_in"]["bias"]
        code = rvq.apply(variables, out["quantized_indices"],
                         method=ResidualVQ.get_code_from_indices)
        errs.append(float(jnp.mean((code - z_in) ** 2)))
    assert errs[0] > errs[1] > errs[2], errs


def test_ema_update_moves_codebook():
    cfg = _cfg()
    rvq, variables, x = _make(cfg, init_samples=jnp.asarray(
        np.random.RandomState(2).randn(2, 6, 32), jnp.float32))
    out, mutated = rvq.apply(variables, x, None, True, jax.random.PRNGKey(7),
                             mutable=["quantizer"])
    # cluster_size and embed must change under training
    assert not np.allclose(np.asarray(mutated["quantizer"]["cluster_size"]),
                           np.asarray(variables["quantizer"]["cluster_size"]))
    # dropout: some indices should be -1 at levels above the sampled cutoff
    idx = np.asarray(out["quantized_indices"])
    assert (idx >= -1).all() and (idx < cfg.codebook_size).all()


def test_quantize_dropout_masks_levels():
    cfg = _cfg(quantize_dropout=True, quantize_dropout_cutoff_index=1)
    rvq, variables, x = _make(cfg)
    seen_minus1 = False
    for s in range(6):
        out, _ = rvq.apply(variables, x, None, True, jax.random.PRNGKey(s),
                           mutable=["quantizer"])
        idx = np.asarray(out["quantized_indices"])
        assert (idx[..., 0] >= 0).all()  # level 0 never dropped (cutoff 1)
        if (idx == -1).any():
            seen_minus1 = True
            # dropped levels are a suffix
            dropped_levels = sorted(set(np.where(idx == -1)[2]))
            assert dropped_levels == list(range(dropped_levels[0], cfg.num_quantizers))
    assert seen_minus1


def test_get_codes_from_indices_handles_dropped():
    rvq, variables, x = _make()
    out = rvq.apply(variables, x)
    idx = out["quantized_indices"].at[..., 2].set(-1)
    codes = rvq.apply(variables, idx, method=ResidualVQ.get_codes_from_indices)
    assert codes.shape == (3, 2, 6, 8)
    np.testing.assert_allclose(np.asarray(codes[2]), 0.0)


def test_get_distributed_codes():
    rvq, variables, x = _make()
    logits = jnp.asarray(np.random.RandomState(0).randn(2, 6, 3, 16), jnp.float32)
    soft = rvq.apply(variables, logits, method=ResidualVQ.get_distributed_codes)
    assert soft.shape == (2, 6, 3, 8)
    # extreme logits ~ hard one-hot lookup
    hard_idx = jnp.argmax(logits, -1)
    soft2 = rvq.apply(variables, logits * 1e4, method=ResidualVQ.get_distributed_codes)
    ref = np.stack([np.asarray(variables["quantizer"]["embed"])[q][np.asarray(hard_idx)[..., q]]
                    for q in range(3)], axis=2)
    np.testing.assert_allclose(np.asarray(soft2), ref, atol=1e-5)


def test_commit_loss_gradient_flows_to_input():
    rvq, variables, x = _make()

    def loss_fn(xin):
        out = rvq.apply(variables, xin)
        return out["commit_loss"]

    g = jax.grad(loss_fn)(x)
    assert np.abs(np.asarray(g)).max() > 0


def test_dead_code_expiry_reseeds():
    """Codes with EMA usage below the threshold are re-seeded from batch
    vectors during training updates (expire_codes_ semantics)."""
    cfg = _cfg(quantize_dropout=False).replace(threshold_ema_dead_code=2)
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(4, 8, cfg.dim), jnp.float32)
    rvq, variables, _ = _make(cfg, init_samples=x)
    # mark half the level-0 codes as dead (tiny EMA size)
    q = dict(variables["quantizer"])
    size = np.asarray(q["cluster_size"]).copy()
    size[0, : cfg.codebook_size // 2] = 0.0
    q["cluster_size"] = jnp.asarray(size)
    variables = {"params": variables["params"], "quantizer": q}
    before = np.asarray(q["embed"])[0, : cfg.codebook_size // 2].copy()
    _, mutated = rvq.apply(variables, x, None, True, jax.random.PRNGKey(3),
                           mutable=["quantizer"])
    after = np.asarray(mutated["quantizer"]["embed"])[0, : cfg.codebook_size // 2]
    # dead codes moved substantially (reseeded), and their size reset to >= 1
    assert np.abs(after - before).max() > 1e-3
    new_size = np.asarray(mutated["quantizer"]["cluster_size"])[0]
    assert (new_size[: cfg.codebook_size // 2] >= 0.9).all()


# ---------------------------------------------------------------------------
# GroupedResidualVQ (reference residual_vq.py:494-560)
# ---------------------------------------------------------------------------


def test_grouped_rvq_matches_per_group_rvq():
    """Each group must reproduce a standalone ResidualVQ on its feature
    slice exactly (same deterministic codebook init, no projection)."""
    from taste_spokenlm_tpu.models.quantizer import GroupedResidualVQ

    cfg = QuantizerConfig(dim=32, codebook_dim=16, codebook_size=16,
                          num_quantizers=2, groups=2, kmeans_iters=4)
    g = GroupedResidualVQ(cfg)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 5, 32), jnp.float32)
    vars_g = g.init(jax.random.PRNGKey(0), x)
    out = g.apply(vars_g, x)
    assert out["quantized_feats"].shape == (2, 5, 32)
    assert out["quantized_indices"].shape == (2, 5, 2, 2)

    sub = cfg.replace(dim=16, groups=1)
    for gi in range(2):
        rvq = ResidualVQ(sub)
        xg = x[..., gi * 16:(gi + 1) * 16]
        vars_s = rvq.init(jax.random.PRNGKey(0), xg)
        out_s = rvq.apply(vars_s, xg)
        np.testing.assert_array_equal(
            np.asarray(out["quantized_indices"][:, :, gi]),
            np.asarray(out_s["quantized_indices"]))
        np.testing.assert_allclose(
            np.asarray(out["quantized_feats"][..., gi * 16:(gi + 1) * 16]),
            np.asarray(out_s["quantized_feats"]), atol=1e-6)


def test_grouped_rvq_output_from_indices_roundtrip():
    from taste_spokenlm_tpu.models.quantizer import GroupedResidualVQ

    cfg = QuantizerConfig(dim=32, codebook_dim=16, codebook_size=16,
                          num_quantizers=2, groups=2, kmeans_iters=4)
    g = GroupedResidualVQ(cfg)
    x = jnp.asarray(np.random.RandomState(1).randn(1, 4, 32), jnp.float32)
    variables = g.init(jax.random.PRNGKey(0), x)
    out = g.apply(variables, x)
    rec = g.apply(variables, out["quantized_indices"],
                  method=GroupedResidualVQ.get_output_from_indices)
    # eval-mode straight-through equals the quantized value exactly
    np.testing.assert_allclose(np.asarray(rec),
                               np.asarray(out["quantized_feats"]), atol=1e-6)
    codes = g.apply(variables, out["quantized_indices"],
                    method=GroupedResidualVQ.get_codes_from_indices)
    assert codes.shape == (2, 2, 1, 4, 16)


def test_grouped_rvq_train_updates_all_groups():
    from taste_spokenlm_tpu.models.quantizer import GroupedResidualVQ

    cfg = QuantizerConfig(dim=32, codebook_dim=16, codebook_size=16,
                          num_quantizers=2, groups=2, kmeans_iters=4,
                          quantize_dropout=False, threshold_ema_dead_code=0)
    g = GroupedResidualVQ(cfg)
    x = jnp.asarray(np.random.RandomState(2).randn(2, 6, 32), jnp.float32)
    variables = g.init(jax.random.PRNGKey(0), x)
    out, mut = g.apply(variables, x, train=True,
                       dropout_rng=jax.random.PRNGKey(3),
                       mutable=["quantizer"])
    assert np.isfinite(float(out["commit_loss"]))
    for gi in range(2):
        before = variables["quantizer"][f"rvq_{gi}"]["embed"]
        after = mut["quantizer"][f"rvq_{gi}"]["embed"]
        assert float(jnp.abs(after - before).max()) > 0


# ---------------------------------------------------------------------------
# Stochastic (gumbel) code sampling (vector_quantize_pytorch.py:86-105)
# ---------------------------------------------------------------------------


def test_stochastic_sampling_properties():
    cfg = _cfg(stochastic_sample_codes=True, sample_codebook_temp=10.0,
               quantize_dropout=False, threshold_ema_dead_code=0)
    rvq, variables, x = _make(cfg)
    rng = jax.random.PRNGKey(5)
    out1, _ = rvq.apply(variables, x, None, True, rng, mutable=["quantizer"])
    out2, _ = rvq.apply(variables, x, None, True, rng, mutable=["quantizer"])
    idx1 = np.asarray(out1["quantized_indices"])
    # deterministic given the rng
    np.testing.assert_array_equal(idx1, np.asarray(out2["quantized_indices"]))
    assert (idx1 >= 0).all() and (idx1 < cfg.codebook_size).all()
    # at high temperature the sampled trajectory must differ from greedy
    greedy = np.asarray(rvq.apply(variables, x)["quantized_indices"])
    assert (idx1 != greedy).any()
    # eval stays greedy even with the flag on (reference: training-only)
    ev = np.asarray(rvq.apply(variables, x)["quantized_indices"])
    np.testing.assert_array_equal(ev, greedy)
    assert np.isfinite(float(out1["commit_loss"]))


def test_stochastic_low_temp_matches_greedy():
    cfg = _cfg(stochastic_sample_codes=True, sample_codebook_temp=1e-6,
               quantize_dropout=False, threshold_ema_dead_code=0)
    rvq, variables, x = _make(cfg)
    out, _ = rvq.apply(variables, x, None, True, jax.random.PRNGKey(5),
                       mutable=["quantizer"])
    greedy = np.asarray(rvq.apply(variables, x)["quantized_indices"])
    np.testing.assert_array_equal(np.asarray(out["quantized_indices"]),
                                  greedy)
