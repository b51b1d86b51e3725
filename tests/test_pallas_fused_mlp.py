"""Fused-MLP Pallas kernels vs dequantized float references.

The kernels must match a float computation over the DEQUANTIZED weights
(separating kernel correctness from quantization noise, same policy as
tests/test_quant.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from taste_spokenlm_tpu.ops.pallas.fused_mlp import (
    gated_mlp_int8, gated_mlp_int4, ffn_int8,
    quantize_int4_tiled, dequantize_int4_tiled)
from taste_spokenlm_tpu.ops.pallas.int4_matmul import (
    quantize_int4, dequantize_int4)


def _q8(r, d_in, d_out):
    w = r.randn(d_in, d_out).astype(np.float32) * 0.05
    s = np.abs(w).max(0) / 127.0
    q = np.clip(np.round(w / s), -127, 127).astype(np.int8)
    return jnp.asarray(q), jnp.asarray(s.astype(np.float32))


def _deq8(q, s):
    return q.astype(jnp.float32) * s[None, :]


@pytest.mark.parametrize("M,H,I,block", [(1, 256, 1024, 256),
                                         (4, 256, 768, 256),
                                         (1, 128, 512, 512)])
def test_gated_mlp_int8_matches_dequant(M, H, I, block):
    r = np.random.RandomState(0)
    wg, sg = _q8(r, H, I)
    wu, su = _q8(r, H, I)
    wd, sd = _q8(r, I, H)
    x = jnp.asarray(r.randn(M, H).astype(np.float32))
    y = gated_mlp_int8(x, wg, sg, wu, su, wd, sd, block_i=block)
    g = x @ _deq8(wg, sg)
    u = x @ _deq8(wu, su)
    y_ref = (jax.nn.silu(g) * u) @ _deq8(wd, sd)
    err = float(jnp.max(jnp.abs(y - y_ref)) /
                (jnp.max(jnp.abs(y_ref)) + 1e-9))
    assert err < 2e-2, err


def test_gated_mlp_int8_leading_dims():
    r = np.random.RandomState(1)
    H, I = 128, 512
    wg, sg = _q8(r, H, I)
    wu, su = _q8(r, H, I)
    wd, sd = _q8(r, I, H)
    x = jnp.asarray(r.randn(2, 3, H).astype(np.float32))
    y = gated_mlp_int8(x, wg, sg, wu, su, wd, sd, block_i=256)
    assert y.shape == (2, 3, H)
    y_flat = gated_mlp_int8(x.reshape(6, H), wg, sg, wu, su, wd, sd,
                            block_i=256)
    np.testing.assert_allclose(np.asarray(y).reshape(6, H),
                               np.asarray(y_flat), rtol=0, atol=0)


def test_quantize_int4_tiled_roundtrip():
    r = np.random.RandomState(2)
    I, H, tile = 1024, 128, 256
    w = jnp.asarray(r.randn(I, H).astype(np.float32) * 0.05)
    wp, sc = quantize_int4_tiled(w, tile)
    assert wp.shape == (I // 2, H)
    w_tiled = dequantize_int4_tiled(wp, sc, tile)
    # tile-wise quantization == whole-matrix quantization restricted to
    # the tile (groups never straddle a tile boundary at these sizes)
    for t in range(I // tile):
        ref_p, ref_s = quantize_int4(w[t * tile:(t + 1) * tile])
        got = w_tiled[t * tile:(t + 1) * tile]
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(dequantize_int4(ref_p, ref_s)),
                                   rtol=0, atol=0)


@pytest.mark.parametrize("M,H,I,block", [(1, 256, 1024, 256),
                                         (2, 256, 512, 256)])
def test_gated_mlp_int4_matches_dequant(M, H, I, block):
    r = np.random.RandomState(3)
    wg_f = jnp.asarray(r.randn(H, I).astype(np.float32) * 0.05)
    wu_f = jnp.asarray(r.randn(H, I).astype(np.float32) * 0.05)
    wd_f = jnp.asarray(r.randn(I, H).astype(np.float32) * 0.05)
    wg, sg = quantize_int4(wg_f)
    wu, su = quantize_int4(wu_f)
    wd, sd = quantize_int4_tiled(wd_f, block)
    x = jnp.asarray(r.randn(M, H).astype(np.float32))
    y = gated_mlp_int4(x, wg, sg, wu, su, wd, sd, block_i=block)
    g = x @ dequantize_int4(wg, sg)
    u = x @ dequantize_int4(wu, su)
    y_ref = (jax.nn.silu(g) * u) @ dequantize_int4_tiled(wd, sd, block)
    err = float(jnp.max(jnp.abs(y - y_ref)) /
                (jnp.max(jnp.abs(y_ref)) + 1e-9))
    assert err < 2e-2, err


@pytest.mark.parametrize("M,D,I,act", [(1, 256, 1024, "swish"),
                                       (3, 128, 512, "relu")])
def test_ffn_int8_matches_dequant(M, D, I, act):
    r = np.random.RandomState(4)
    w1, s1 = _q8(r, D, I)
    w2, s2 = _q8(r, I, D)
    b1 = jnp.asarray(r.randn(I).astype(np.float32) * 0.1)
    b2 = jnp.asarray(r.randn(D).astype(np.float32) * 0.1)
    x = jnp.asarray(r.randn(M, D).astype(np.float32))
    y = ffn_int8(x, w1, s1, b1, w2, s2, b2, activation=act, block_i=256)
    h = x @ _deq8(w1, s1) + b1[None, :]
    a = jax.nn.silu(h) if act == "swish" else jnp.maximum(h, 0)
    y_ref = a @ _deq8(w2, s2) + b2[None, :]
    err = float(jnp.max(jnp.abs(y - y_ref)) /
                (jnp.max(jnp.abs(y_ref)) + 1e-9))
    assert err < 2e-2, err


# ---------------------------------------------------------------------------
# model-level: fused_mlp_serving == unfused quantized serving
# ---------------------------------------------------------------------------

from taste_spokenlm_tpu.config import LlamaConfig
from taste_spokenlm_tpu.models.llama import LlamaModel
from taste_spokenlm_tpu.utils.quant import quantize_llama_params


def _llama_trees(mode):
    cfg = LlamaConfig.tiny()
    lm = LlamaModel(cfg)
    rng = jax.random.PRNGKey(7)
    ids = jax.random.randint(rng, (1, 5), 0, cfg.vocab_size)
    v = lm.init(rng, input_ids=ids)
    return cfg, v, ids


@pytest.mark.parametrize("mode", ["int8", "int4"])
def test_llama_fused_mlp_matches_unfused(mode):
    """fused_mlp_serving must reproduce the unfused quantized forward on
    the SAME quantized tree semantics (int8: identical tree; int4: the
    tiled down_proj packing is a reordering of the same values)."""
    cfg, v, ids = _llama_trees(mode)
    q_plain = quantize_llama_params(v["params"], mode=mode)
    q_fused = quantize_llama_params(v["params"], mode=mode, fused_mlp=True)
    if mode == "int8":
        # int8 fused layout IS the standard layout
        chex = jax.tree_util.tree_all(jax.tree_util.tree_map(
            lambda a, b: bool((jnp.asarray(a) == jnp.asarray(b)).all()),
            q_plain, q_fused))
        assert chex

    lm_u = LlamaModel(cfg.replace(quantized_serving=mode))
    lm_f = LlamaModel(cfg.replace(quantized_serving=mode,
                                  fused_mlp_serving=True))
    out_u = lm_u.apply({"params": q_plain}, input_ids=ids)
    out_f = lm_f.apply({"params": q_fused}, input_ids=ids)
    a = np.asarray(out_u["last_hidden"])
    b = np.asarray(out_f["last_hidden"])
    err = np.abs(a - b).max() / max(np.abs(a).max(), 1e-6)
    # same math, different accumulation grouping -> tiny numeric drift
    assert err < 2e-2, err


def test_llama_fused_mlp_prefill_matches_decode_path():
    """The >256-row XLA fallback and the Pallas decode path must agree on
    the same fused-layout params."""
    cfg, v, _ = _llama_trees("int4")
    q_fused = quantize_llama_params(v["params"], mode="int4", fused_mlp=True)
    lm_f = LlamaModel(cfg.replace(quantized_serving="int4",
                                  fused_mlp_serving=True))
    rng = jax.random.PRNGKey(8)
    T = 300  # > FUSED_MLP_MAX_ROWS -> prefill fallback
    ids = jax.random.randint(rng, (1, T), 0, cfg.vocab_size)
    out_pre = lm_f.apply({"params": q_fused}, input_ids=ids)
    # decode path: single-token cached steps over the same prompt prefix
    cache = lm_f.apply({"params": q_fused}, 1, T, method=lm_f.init_cache)
    for t in range(3):
        out = lm_f.apply({"params": q_fused}, input_ids=ids[:, t:t + 1],
                         caches=cache, cache_index=t, position_offset=t)
        cache = out["caches"]
        a = np.asarray(out_pre["last_hidden"][:, t])
        b = np.asarray(out["last_hidden"][:, 0])
        err = np.abs(a - b).max() / max(np.abs(a).max(), 1e-6)
        assert err < 2e-2, (t, err)


def test_encoder_fused_mlp_matches_unfused():
    from taste_spokenlm_tpu.config import EncoderStackConfig
    from taste_spokenlm_tpu.models.conformer import ConformerEncoder
    from taste_spokenlm_tpu.utils.quant import quantize_encoder_params

    cfg = EncoderStackConfig.tiny().replace(
        macaron_style=True, use_cnn_module=True, activation_type="swish")
    enc = ConformerEncoder(cfg)
    rng = jax.random.PRNGKey(9)
    x = jax.random.normal(rng, (1, 12, cfg.input_size))
    lens = jnp.array([12])
    v = enc.init(rng, x, lens)
    params = v["params"] if "params" in v else v
    for mode in ("int8", "int4"):
        qt = quantize_encoder_params(params, mode=mode, fused_mlp=True)
        enc_u = ConformerEncoder(cfg.replace(quantized_serving=mode))
        enc_f = ConformerEncoder(cfg.replace(quantized_serving=mode,
                                             fused_mlp_serving=True))
        qt_u = quantize_encoder_params(params, mode=mode)
        vv_u = dict(v); vv_u["params"] = qt_u
        vv_f = dict(v); vv_f["params"] = qt
        out_u = enc_u.apply(vv_u, x, lens)
        out_f = enc_f.apply(vv_f, x, lens)
        a = np.asarray(out_u[0]); b = np.asarray(out_f[0])
        err = np.abs(a - b).max() / max(np.abs(a).max(), 1e-6)
        assert err < 2e-2, (mode, err)
