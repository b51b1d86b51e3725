"""Pallas flash attention vs reference einsum attention (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from taste_spokenlm_tpu.ops.attention import multi_head_attention
from taste_spokenlm_tpu.ops.pallas.flash_attention import (can_use_flash,
                                                           flash_attention)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_matches_reference(causal):
    rng = np.random.RandomState(0)
    b, t, h, d = 2, 256, 4, 64
    q = jnp.asarray(rng.randn(b, t, h, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, t, h, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, t, h, d), jnp.float32)

    out = flash_attention(q, k, v, causal=causal, interpret=True)

    mask = None
    if causal:
        mask = jnp.tril(jnp.ones((t, t), bool))[None, None]
    ref = multi_head_attention(q, k, v, mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_flash_odd_head_dim_padded():
    rng = np.random.RandomState(1)
    b, t, h, d = 1, 128, 2, 48  # d < 128 -> padded internally
    q = jnp.asarray(rng.randn(b, t, h, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, t, h, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, t, h, d), jnp.float32)
    out = flash_attention(q, k, v, interpret=True)
    ref = multi_head_attention(q, k, v)
    assert out.shape == (b, t, h, d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_can_use_flash():
    assert can_use_flash(1536, 1536)
    assert can_use_flash(1500, 1500)
    assert not can_use_flash(64, 64)


def test_flash_unaligned_length_padded():
    rng = np.random.RandomState(3)
    b, t, h, d = 1, 300, 2, 64  # 300 pads to 384
    q = jnp.asarray(rng.randn(b, t, h, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, t, h, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, t, h, d), jnp.float32)
    out = flash_attention(q, k, v, interpret=True)
    ref = multi_head_attention(q, k, v)
    assert out.shape == (b, t, h, d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_padded_flash_per_example_key_mask():
    """padded_flash_attention: mask-as-a-free-lane == einsum with key mask.

    Exercises the flow U-Net's serving configuration (per-example mel
    lengths shorter than the padded buffer) at a length that pads up to
    the kernel block grid."""
    from taste_spokenlm_tpu.ops.attention import padded_flash_attention
    rng = np.random.RandomState(5)
    b, t, h, d = 2, 300, 4, 64
    q = jnp.asarray(rng.randn(b, t, h, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, t, h, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, t, h, d), jnp.float32)
    lens = jnp.asarray([300, 173])
    key_valid = jnp.arange(t)[None, :] < lens[:, None]

    out = padded_flash_attention(q, k, v, key_valid, interpret=True)
    ref = multi_head_attention(q, k, v, mask=key_valid[:, None, None, :])
    assert out.shape == (b, t, h, d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_padded_flash_bf16_mask_lane():
    """The -30000/scale mask-lane constant must survive bf16 casts."""
    from taste_spokenlm_tpu.ops.attention import padded_flash_attention
    rng = np.random.RandomState(6)
    b, t, h, d = 1, 256, 2, 64
    q = jnp.asarray(rng.randn(b, t, h, d), jnp.bfloat16)
    k = jnp.asarray(rng.randn(b, t, h, d), jnp.bfloat16)
    v = jnp.asarray(rng.randn(b, t, h, d), jnp.bfloat16)
    key_valid = jnp.arange(t)[None, :] < 200

    out = padded_flash_attention(q, k, v, key_valid, interpret=True)
    ref = multi_head_attention(q, k, v, mask=key_valid[:, None, None, :])
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=3e-2, rtol=3e-2)
