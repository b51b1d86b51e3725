"""Pallas int8 weight-only matmuls vs the XLA fused-convert formulation
(interpret mode — the kernels target the TPU decode hot path)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from taste_spokenlm_tpu.ops.pallas.int8_matmul import logits_int8, matmul_int8


def _xla_logits(x, w_q, scale):
    y = jax.lax.dot_general(
        x.astype(jnp.bfloat16), w_q.astype(jnp.bfloat16),
        (((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    return y * scale


@pytest.mark.parametrize("m,v,d", [(1, 512, 128), (4, 1024, 256)])
def test_logits_int8_matches_xla(m, v, d):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(m, d) * 0.1, jnp.bfloat16)
    w_q = jnp.asarray(rng.randint(-127, 128, (v, d)), jnp.int8)
    scale = jnp.asarray(np.abs(rng.randn(v)) * 0.01 + 1e-3, jnp.float32)

    out = logits_int8(x, w_q, scale, block_v=256, interpret=True)
    ref = _xla_logits(x, w_q, scale)
    assert out.shape == (m, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-3, rtol=1e-3)
    # argmax (the value that matters for greedy decode) must agree exactly
    np.testing.assert_array_equal(np.argmax(np.asarray(out), -1),
                                  np.argmax(np.asarray(ref), -1))


def test_logits_int8_leading_dims():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 3, 128) * 0.1, jnp.bfloat16)
    w_q = jnp.asarray(rng.randint(-127, 128, (512, 128)), jnp.int8)
    scale = jnp.asarray(np.ones(512), jnp.float32)
    out = logits_int8(x, w_q, scale, block_v=128, interpret=True)
    assert out.shape == (2, 3, 512)
    ref = _xla_logits(x, w_q, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-3, rtol=1e-3)


@pytest.mark.parametrize("m,d,n", [(1, 128, 512), (8, 256, 384)])
def test_matmul_int8_matches_xla(m, d, n):
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(m, d) * 0.1, jnp.bfloat16)
    w_q = jnp.asarray(rng.randint(-127, 128, (d, n)), jnp.int8)
    scale = jnp.asarray(np.abs(rng.randn(n)) * 0.01 + 1e-3, jnp.float32)

    out = matmul_int8(x, w_q, scale, block_n=128, interpret=True)
    ref = jax.lax.dot_general(
        x, w_q.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    assert out.shape == (m, n)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-3, rtol=1e-3)
