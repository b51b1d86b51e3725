"""Pallas causal rel-pos flash attention vs the XLA skew path.

The kernel (ops/pallas/relpos_attention.py) must reproduce the espnet
rel-pos attention of models/conformer.py RelPositionAttention — the same
math as the torch reference (CosyVoice cosyvoice/transformer/attention.py:
207-245) — for values AND all five gradients, including ragged key lengths,
and through the full ConformerEncoder causal stack (TASTE_FORCE_RELPOS_FLASH
path used in training on TPU).
"""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from taste_spokenlm_tpu.ops.pallas import relpos_attention as RP


def _ref_attn(q_u, q_v, k, v, p, lengths):
    """Straight-line espnet rel-pos causal attention (the XLA path's math)."""
    b, t, h, dk = q_u.shape
    ac = jnp.einsum("bqhd,bkhd->bhqk", q_u, k)
    x = jnp.einsum("bqhd,phd->bhqp", q_v, p)        # [B, H, T, 2T-1]
    idx = (t - 1 - jnp.arange(t))[:, None] + jnp.arange(t)[None, :]
    bd = jnp.take_along_axis(
        x, jnp.broadcast_to(idx[None, None], (b, h, t, t)), axis=-1)
    s = (ac + bd) / math.sqrt(dk)
    i = jnp.arange(t)[:, None]
    j = jnp.arange(t)[None, :]
    mask = (j <= i)[None, None] & \
        (j[None] < lengths[:, None, None])[:, None]
    s = jnp.where(mask, s, jnp.finfo(jnp.float32).min / 2)
    probs = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


@pytest.fixture(autouse=True)
def _interpret_kernel():
    RP._INTERPRET[0] = True
    yield
    RP._INTERPRET[0] = False


def _make_inputs(b=2, t=200, h=2, dk=128, seed=0, dtype=jnp.float32):
    r = np.random.RandomState(seed)
    mk = lambda *s: jnp.asarray(r.randn(*s) * 0.3, dtype)
    return (mk(b, t, h, dk), mk(b, t, h, dk), mk(b, t, h, dk),
            mk(b, t, h, dk), mk(2 * t - 1, h, dk))


def test_forward_matches_xla_path():
    q_u, q_v, k, v, p = _make_inputs()
    lengths = jnp.asarray([200, 150], jnp.int32)
    o_ref = _ref_attn(q_u, q_v, k, v, p, lengths)
    o_ker = RP.relpos_causal_attention(q_u, q_v, k, v, p, lengths)
    assert o_ker.dtype == q_u.dtype
    np.testing.assert_allclose(np.asarray(o_ref), np.asarray(o_ker),
                               atol=2e-5, rtol=1e-5)


def test_forward_default_lengths():
    q_u, q_v, k, v, p = _make_inputs(b=1, t=130)
    o_ref = _ref_attn(q_u, q_v, k, v, p, jnp.asarray([130], jnp.int32))
    o_ker = RP.relpos_causal_attention(q_u, q_v, k, v, p)
    np.testing.assert_allclose(np.asarray(o_ref), np.asarray(o_ker),
                               atol=2e-5, rtol=1e-5)


def test_gradients_match_xla_path():
    q_u, q_v, k, v, p = _make_inputs()
    lengths = jnp.asarray([200, 150], jnp.int32)
    w = jnp.asarray(np.random.RandomState(7).randn(2, 200, 2, 128),
                    jnp.float32)

    def loss_ref(*a):
        return jnp.sum(_ref_attn(*a, lengths) * w)

    def loss_ker(*a):
        return jnp.sum(RP.relpos_causal_attention(*a, lengths) * w)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q_u, q_v, k, v, p)
    g_ker = jax.grad(loss_ker, argnums=(0, 1, 2, 3, 4))(q_u, q_v, k, v, p)
    for name, a, b in zip("q_u q_v k v p".split(), g_ref, g_ker):
        scale = float(jnp.max(jnp.abs(a))) + 1e-9
        err = float(jnp.max(jnp.abs(a - b)))
        assert err < 3e-4 * max(1.0, scale), (name, err, scale)


def test_multichunk_clamped_window():
    """T large enough that a q block spans several BK-wide pruning chunks and
    the last chunk's kv window is clamped left of its logical range (tp=640,
    BK=512: chunk j=1 of q block 4 reads window start 128 for logical columns
    [512, 640) — the dedup mask must drop the overlap)."""
    t = 630
    q_u, q_v, k, v, p = _make_inputs(b=1, t=t, h=1)
    lengths = jnp.asarray([600], jnp.int32)
    o_ref = _ref_attn(q_u, q_v, k, v, p, lengths)
    o_ker = RP.relpos_causal_attention(q_u, q_v, k, v, p, lengths)
    np.testing.assert_allclose(np.asarray(o_ref), np.asarray(o_ker),
                               atol=2e-5, rtol=1e-5)
    w = jnp.asarray(np.random.RandomState(3).randn(1, t, 1, 128), jnp.float32)
    g_ref = jax.grad(lambda *a: jnp.sum(_ref_attn(*a, lengths) * w),
                     argnums=(0, 1, 2, 3, 4))(q_u, q_v, k, v, p)
    g_ker = jax.grad(
        lambda *a: jnp.sum(RP.relpos_causal_attention(*a, lengths) * w),
        argnums=(0, 1, 2, 3, 4))(q_u, q_v, k, v, p)
    for name, a, b in zip("q_u q_v k v p".split(), g_ref, g_ker):
        scale = float(jnp.max(jnp.abs(a))) + 1e-9
        err = float(jnp.max(jnp.abs(a - b)))
        assert err < 3e-4 * max(1.0, scale), (name, err, scale)


def test_bf16_forward_close():
    q_u, q_v, k, v, p = _make_inputs(dtype=jnp.bfloat16)
    lengths = jnp.asarray([200, 180], jnp.int32)
    o_ref = _ref_attn(*(a.astype(jnp.float32) for a in (q_u, q_v, k, v, p)),
                      lengths)
    o_ker = RP.relpos_causal_attention(q_u, q_v, k, v, p, lengths)
    assert o_ker.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(o_ref),
                               np.asarray(o_ker.astype(jnp.float32)),
                               atol=3e-2, rtol=3e-2)


@pytest.mark.slow
def test_conformer_stack_flash_vs_xla(monkeypatch):
    """Full causal ConformerEncoder: flash path (forced) vs XLA path, value
    and parameter-gradient agreement at a kernel-eligible length."""
    from taste_spokenlm_tpu.config import EncoderStackConfig
    from taste_spokenlm_tpu.models.conformer import ConformerEncoder

    cfg = EncoderStackConfig(
        input_size=64, output_size=256, attention_heads=2, linear_units=128,
        num_blocks=2, static_chunk_size=1, use_cnn_module=False,
        input_layer="linear", dropout_rate=0.0, positional_dropout_rate=0.0,
        attention_dropout_rate=0.0)
    enc = ConformerEncoder(cfg, dtype=jnp.float32)
    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(2, 300, 64) * 0.3, jnp.float32)
    lens = jnp.asarray([300, 250])
    variables = enc.init(jax.random.PRNGKey(0), x, lens)

    def run():
        out = enc.apply(variables, x, lens)
        grads = jax.grad(
            lambda p_: jnp.sum(enc.apply({"params": p_}, x, lens) ** 2)
        )(variables["params"])
        return out, grads

    monkeypatch.setenv("TASTE_DISABLE_FLASH", "1")
    o_xla, g_xla = run()
    monkeypatch.delenv("TASTE_DISABLE_FLASH")
    monkeypatch.setenv("TASTE_FORCE_RELPOS_FLASH", "1")
    o_fl, g_fl = run()

    np.testing.assert_allclose(np.asarray(o_xla), np.asarray(o_fl),
                               atol=5e-5, rtol=1e-4)
    flat_x = jax.tree_util.tree_leaves_with_path(g_xla)
    flat_f = jax.tree_util.tree_leaves(g_fl)
    for (path, a), b in zip(flat_x, flat_f):
        scale = float(jnp.max(jnp.abs(a))) + 1e-9
        err = float(jnp.max(jnp.abs(a - b)))
        assert err < 1e-3 * max(1.0, scale), (jax.tree_util.keystr(path),
                                              err, scale)
