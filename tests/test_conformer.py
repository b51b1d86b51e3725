"""Tests for the rel-pos Transformer/Conformer encoder stack."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from taste_spokenlm_tpu.config import EncoderStackConfig
from taste_spokenlm_tpu.models.conformer import (
    ConformerEncoder, RelPositionAttention, espnet_rel_pos_table)


def _cfg(**kw):
    base = dict(output_size=32, attention_heads=2, linear_units=64,
                num_blocks=2, input_size=16, static_chunk_size=1)
    base.update(kw)
    return EncoderStackConfig(**base)


def test_rel_attention_matches_naive():
    """Skew-trick scores == direct per-pair relative-position computation."""
    d, h, t = 32, 2, 7
    attn = RelPositionAttention(d, h)
    x = jnp.asarray(np.random.RandomState(0).randn(2, t, d), jnp.float32)
    table = jnp.asarray(espnet_rel_pos_table(d, 64))
    pe = jax.lax.dynamic_slice_in_dim(table, 64 - t, 2 * t - 1, axis=0)
    params = attn.init(jax.random.PRNGKey(0), x, pe)
    out, _ = attn.apply(params, x, pe)

    # naive: recompute bd by explicit gather of the rel-pos vector per (i, j)
    p = attn.apply(params, method=lambda m, pe_: m.linear_pos(pe_), pe_=pe)
    p = np.asarray(p).reshape(2 * t - 1, h, d // h)
    qkv = attn.apply(params, method=lambda m, x_: m._qkv(x_), x_=x)
    q, k, v = (np.asarray(a) for a in qkv)
    u = np.asarray(params["params"]["pos_bias_u"])
    vb = np.asarray(params["params"]["pos_bias_v"])
    dk = d // h
    out_ref = np.zeros((2, t, h, dk), np.float32)
    for b in range(2):
        for head in range(h):
            scores = np.zeros((t, t), np.float32)
            for i in range(t):
                for j in range(t):
                    ac = (q[b, i, head] + u[head]) @ k[b, j, head]
                    # rel = i - j -> table entry (t-1) - (i-j)... our pe slice
                    # entry p corresponds to rel = (t-1) - p
                    bd = (q[b, i, head] + vb[head]) @ p[(t - 1) - (i - j), head]
                    scores[i, j] = (ac + bd) / np.sqrt(dk)
            probs = np.exp(scores - scores.max(-1, keepdims=True))
            probs /= probs.sum(-1, keepdims=True)
            out_ref[b, :, head] = probs @ v[b, :, head]
    w_out = np.asarray(params["params"]["linear_out"]["kernel"])
    b_out = np.asarray(params["params"]["linear_out"]["bias"])
    out_ref = out_ref.reshape(2, t, d) @ w_out + b_out
    np.testing.assert_allclose(np.asarray(out), out_ref, atol=1e-4)


def test_causal_encoder_is_causal():
    cfg = _cfg()
    enc = ConformerEncoder(cfg, max_len=64)
    rng = np.random.RandomState(0)
    x = rng.randn(1, 10, 16).astype(np.float32)
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y1 = enc.apply(params, jnp.asarray(x))
    x2 = x.copy()
    x2[:, 7:] += 10.0  # perturb the future
    y2 = enc.apply(params, jnp.asarray(x2))
    np.testing.assert_allclose(np.asarray(y1[:, :7]), np.asarray(y2[:, :7]),
                               atol=1e-5)
    assert np.abs(np.asarray(y1[:, 7:]) - np.asarray(y2[:, 7:])).max() > 1e-3


def test_full_attention_mode():
    cfg = _cfg(static_chunk_size=0)
    enc = ConformerEncoder(cfg, max_len=64)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 10, 16), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), x)
    y1 = enc.apply(params, x)
    x2 = x.at[:, 7:].add(10.0)
    y2 = enc.apply(params, x2)
    # bidirectional: early positions DO change
    assert np.abs(np.asarray(y1[:, :7]) - np.asarray(y2[:, :7])).max() > 1e-3


def test_decode_step_matches_full_forward():
    cfg = _cfg()
    enc = ConformerEncoder(cfg, max_len=64)
    rng = np.random.RandomState(3)
    t = 9
    x = jnp.asarray(rng.randn(2, t, 16), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), x)
    full = enc.apply(params, x)

    caches = enc.apply(params, 2, 16, method=ConformerEncoder.init_cache)
    outs = []
    for i in range(t):
        y, caches = enc.apply(params, x[:, i:i + 1], caches, jnp.int32(i),
                              method=ConformerEncoder.decode_step)
        outs.append(y)
    stepped = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(stepped), np.asarray(full), atol=2e-4)


def test_legacy_input_layer_applies_relu():
    x = jnp.asarray(np.random.RandomState(0).randn(1, 5, 16), jnp.float32)
    out = {}
    for layer in ["linear", "linear_legacy"]:
        enc = ConformerEncoder(_cfg(input_layer=layer), max_len=64)
        params = enc.init(jax.random.PRNGKey(0), x)
        out[layer] = enc.apply(params, method=lambda m, x_: m._embed(x_), x_=x)
    assert float(jnp.min(out["linear_legacy"])) >= 0.0
    assert float(jnp.min(out["linear"])) < 0.0


def test_length_mask_blocks_padding():
    cfg = _cfg(static_chunk_size=0)
    enc = ConformerEncoder(cfg, max_len=64)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 8, 16), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), x)
    y1 = enc.apply(params, x, jnp.asarray([5]))
    x2 = x.at[:, 5:].set(99.0)  # garbage in padding
    y2 = enc.apply(params, x2, jnp.asarray([5]))
    np.testing.assert_allclose(np.asarray(y1[:, :5]), np.asarray(y2[:, :5]),
                               atol=1e-5)


def test_conv_module_matches_torch_golden():
    """ConvolutionModule numerics == the reference torch module
    (convolution.py:25-145) with copied weights, both causal and not."""
    import torch

    C, K, B, T = 8, 5, 2, 11
    rng = np.random.RandomState(0)
    x_np = rng.randn(B, T, C).astype(np.float32)

    for causal in (False, True):
        from taste_spokenlm_tpu.models.conformer import ConvolutionModule
        m = ConvolutionModule(channels=C, kernel_size=K, activation="swish",
                              norm_type="layer_norm", causal=causal)
        variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x_np))
        p = variables["params"]

        # torch reimplementation of the reference forward
        pw1_w = torch.tensor(np.asarray(p["pointwise_conv1"]["kernel"]))
        pw1_b = torch.tensor(np.asarray(p["pointwise_conv1"]["bias"]))
        dw_w = torch.tensor(np.asarray(p["depthwise_conv"]["kernel"]))
        dw_b = torch.tensor(np.asarray(p["depthwise_conv"]["bias"]))
        pw2_w = torch.tensor(np.asarray(p["pointwise_conv2"]["kernel"]))
        pw2_b = torch.tensor(np.asarray(p["pointwise_conv2"]["bias"]))
        ln_s = torch.tensor(np.asarray(p["norm"]["scale"]))
        ln_b = torch.tensor(np.asarray(p["norm"]["bias"]))

        xt = torch.tensor(x_np).transpose(1, 2)      # [B, C, T]
        if causal:
            xt = torch.nn.functional.pad(xt, (K - 1, 0))
        else:
            xt = torch.nn.functional.pad(xt, ((K - 1) // 2, (K - 1) // 2))
        # pointwise1: flax kernel [1, C, 2C] -> torch conv1d [2C, C, 1]
        xt = torch.nn.functional.conv1d(
            xt, pw1_w.permute(2, 1, 0), pw1_b)
        xt = torch.nn.functional.glu(xt, dim=1)
        # depthwise: flax kernel [K, 1, C] -> torch [C, 1, K]
        xt = torch.nn.functional.conv1d(
            xt, dw_w.permute(2, 1, 0), dw_b, groups=C)
        xt = xt.transpose(1, 2)
        xt = torch.nn.functional.layer_norm(xt, (C,), ln_s, ln_b, eps=1e-5)
        xt = xt * torch.sigmoid(xt)                  # swish
        xt = torch.nn.functional.conv1d(
            xt.transpose(1, 2), pw2_w.permute(2, 1, 0), pw2_b).transpose(1, 2)

        out = np.asarray(m.apply(variables, jnp.asarray(x_np)))
        np.testing.assert_allclose(out, xt.numpy(), rtol=1e-4, atol=1e-5,
                                   err_msg=f"causal={causal}")


def test_conformer_with_cnn_and_macaron():
    """Full conformer block (macaron + conv module) forward: finite, shaped,
    and padded positions do not influence valid ones."""
    cfg = _cfg(use_cnn_module=True, macaron_style=True,
               cnn_module_norm="layer_norm", cnn_causal=True,
               static_chunk_size=1)
    enc = ConformerEncoder(cfg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 10, 16), jnp.float32)
    lengths = jnp.asarray([10, 6])
    variables = enc.init(jax.random.PRNGKey(0), x, lengths)
    out = enc.apply(variables, x, lengths)
    assert out.shape == (2, 10, 32)
    assert np.isfinite(np.asarray(out)).all()
    # causal conv + causal attention: corrupting the padding tail of row 1
    # must not change its valid prefix
    x2 = x.at[1, 6:].set(100.0)
    out2 = enc.apply(variables, x2, lengths)
    np.testing.assert_allclose(np.asarray(out[1, :6]), np.asarray(out2[1, :6]),
                               rtol=1e-4, atol=1e-5)


def test_conformer_cnn_batch_norm_collection():
    """batch_norm variant: init creates batch_stats; train=True updates them
    via mutable, eval stays pure."""
    cfg = _cfg(use_cnn_module=True, cnn_module_norm="batch_norm")
    enc = ConformerEncoder(cfg)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 16), jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0), x)
    assert "batch_stats" in variables
    out, updates = enc.apply(variables, x, train=True, mutable=["batch_stats"])
    assert np.isfinite(np.asarray(out)).all()
    leaves = jax.tree_util.tree_leaves(updates["batch_stats"])
    assert any(np.abs(np.asarray(l)).sum() > 0 for l in leaves)
    out_eval = enc.apply(variables, x)   # pure eval path
    assert np.isfinite(np.asarray(out_eval)).all()


def test_conv1d2_subsampling_matches_torch():
    """conv1d2 stem (subsampling.py:116-170): conv3/p1 -> GELU -> conv3/s2/p1
    -> GELU, golden vs torch with copied weights."""
    import torch
    from taste_spokenlm_tpu.models.conformer import ConformerEncoder

    cfg = _cfg(input_layer="conv1d2", input_size=12, output_size=32)
    enc = ConformerEncoder(cfg)
    rng = np.random.RandomState(0)
    x = rng.randn(2, 21, 12).astype(np.float32)
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x))
    p = variables["params"]

    sub = enc.bind(variables)
    got = np.asarray(sub._embed(jnp.asarray(x)))

    c0w = torch.tensor(np.asarray(p["conv_0"]["kernel"]))  # [3, 12, 32]
    c0b = torch.tensor(np.asarray(p["conv_0"]["bias"]))
    c2w = torch.tensor(np.asarray(p["conv_2"]["kernel"]))
    c2b = torch.tensor(np.asarray(p["conv_2"]["bias"]))
    xt = torch.tensor(x).transpose(1, 2)
    xt = torch.nn.functional.gelu(
        torch.nn.functional.conv1d(xt, c0w.permute(2, 1, 0), c0b, padding=1))
    xt = torch.nn.functional.gelu(
        torch.nn.functional.conv1d(xt, c2w.permute(2, 1, 0), c2b, stride=2,
                                   padding=1))
    want = xt.transpose(1, 2).numpy() * np.sqrt(32, dtype=np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    assert got.shape[1] == enc.subsampled_length(21) == 11


def test_conv2d4_subsampling_matches_torch():
    """conv2d stem (Conv2dSubsampling4, subsampling.py:173-227) golden vs
    torch, incl. the c-major (c*f) flatten order."""
    import torch
    from taste_spokenlm_tpu.models.conformer import ConformerEncoder

    cfg = _cfg(input_layer="conv2d", input_size=11, output_size=16)
    enc = ConformerEncoder(cfg)
    rng = np.random.RandomState(1)
    x = rng.randn(2, 30, 11).astype(np.float32)
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x))
    p = variables["params"]
    got = np.asarray(enc.bind(variables)._embed(jnp.asarray(x)))

    c0w = torch.tensor(np.asarray(p["conv_0"]["kernel"]))  # [3,3,1,16]
    c2w = torch.tensor(np.asarray(p["conv_2"]["kernel"]))  # [3,3,16,16]
    ow = torch.tensor(np.asarray(p["out_0"]["kernel"]))
    ob = torch.tensor(np.asarray(p["out_0"]["bias"]))
    xt = torch.tensor(x).unsqueeze(1)                       # [b,1,t,f]
    xt = torch.relu(torch.nn.functional.conv2d(
        xt, c0w.permute(3, 2, 0, 1),
        torch.tensor(np.asarray(p["conv_0"]["bias"])), stride=2))
    xt = torch.relu(torch.nn.functional.conv2d(
        xt, c2w.permute(3, 2, 0, 1),
        torch.tensor(np.asarray(p["conv_2"]["bias"])), stride=2))
    b, c, t, f = xt.shape
    flat = xt.transpose(1, 2).contiguous().view(b, t, c * f)
    want = (flat @ ow + ob).numpy() * np.sqrt(16, dtype=np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    assert got.shape[1] == enc.subsampled_length(30) == t


def test_subsampling_length_mapping_matches_reference_mask():
    """_subsample_lengths == the reference's x_mask slicing arithmetic."""
    from taste_spokenlm_tpu.models.conformer import ConformerEncoder

    for il, slicer in [
        ("conv1d2", lambda m, t: m[(t + 1) % 2::2]),
        ("conv2d", lambda m, t: m[2::2][2::2]),
        ("conv2d6", lambda m, t: m[2::2][4::3]),
        ("conv2d8", lambda m, t: m[2::2][2::2][2::2]),
    ]:
        cfg = _cfg(input_layer=il, input_size=11, output_size=16)
        enc = ConformerEncoder(cfg)
        for t in (20, 31, 47):
            t_out = enc.subsampled_length(t)
            for n in (3, t // 2, t):
                mask = np.arange(t) < n
                want = int(slicer(mask, t)[:t_out].sum())
                got = int(np.asarray(enc._subsample_lengths(
                    jnp.asarray([n]), t, t_out))[0])
                assert got == want, (il, t, n, got, want)


def test_conformer_forward_with_conv2d_stem():
    cfg = _cfg(input_layer="conv2d", input_size=11, output_size=32,
               static_chunk_size=0)
    from taste_spokenlm_tpu.models.conformer import ConformerEncoder
    enc = ConformerEncoder(cfg)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 40, 11), jnp.float32)
    lengths = jnp.asarray([40, 25])
    variables = enc.init(jax.random.PRNGKey(0), x, lengths)
    out = enc.apply(variables, x, lengths)
    assert out.shape == (2, enc.subsampled_length(40), 32)
    assert np.isfinite(np.asarray(out)).all()
