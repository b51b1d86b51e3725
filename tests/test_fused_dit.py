"""Fused CFM U-Net transformer block (ops/pallas/fused_dit.py) vs the XLA
`BasicTransformerBlock` path — same params, same output, including ragged
key lengths (padded query rows are junk-by-contract in both paths and are
excluded, models/flow.py `_key_valid`)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from taste_spokenlm_tpu.ops.pallas import fused_dit as FD
from taste_spokenlm_tpu.models.flow import BasicTransformerBlock


@pytest.fixture(autouse=True)
def _interpret_kernel(monkeypatch):
    FD._INTERPRET[0] = True
    monkeypatch.setenv("TASTE_FORCE_FUSED_DIT", "1")
    yield
    FD._INTERPRET[0] = False


@pytest.mark.parametrize("t,lens", [(200, (200, 150)), (130, (130, 130))])
def test_fused_block_matches_xla(t, lens):
    b, c, h, dh = 2, 256, 8, 64
    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(b, t, c) * 0.3, jnp.float32)
    kv = jnp.arange(t)[None, :] < jnp.asarray(lens)[:, None]

    blk = BasicTransformerBlock(c, h, dh, fused=False)
    v = blk.init(jax.random.PRNGKey(0), x, kv)
    y_ref = blk.apply(v, x, kv)
    y_fus = BasicTransformerBlock(c, h, dh, fused=True).apply(v, x, kv)
    assert y_fus.dtype == x.dtype
    for bi, ln in enumerate(lens):
        err = float(jnp.max(jnp.abs(y_ref[bi, :ln] - y_fus[bi, :ln])))
        assert err < 3e-5, (bi, err)


def test_fused_block_bf16():
    b, t, c, h, dh = 2, 160, 256, 8, 64
    r = np.random.RandomState(1)
    x32 = jnp.asarray(r.randn(b, t, c) * 0.3, jnp.float32)
    kv = jnp.arange(t)[None, :] < jnp.asarray([t, t - 40])[:, None]
    blk = BasicTransformerBlock(c, h, dh, fused=False)
    v = blk.init(jax.random.PRNGKey(0), x32, kv)
    y_ref = blk.apply(v, x32, kv)
    v16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), v)
    y_fus = BasicTransformerBlock(c, h, dh, fused=True).apply(
        v16, x32.astype(jnp.bfloat16), kv)
    assert y_fus.dtype == jnp.bfloat16
    err = float(jnp.max(jnp.abs(y_ref[0] - y_fus[0].astype(jnp.float32))))
    assert err < 5e-2, err


def test_init_and_training_path_unaffected():
    """fused=True must create the identical param tree (init runs the XLA
    path) and the flag must not engage without the force env off-TPU."""
    b, t, c, h, dh = 1, 64, 256, 4, 64
    x = jnp.zeros((b, t, c))
    kv = jnp.ones((b, t), bool)
    v1 = BasicTransformerBlock(c, h, dh, fused=False).init(
        jax.random.PRNGKey(0), x, kv)
    v2 = BasicTransformerBlock(c, h, dh, fused=True).init(
        jax.random.PRNGKey(0), x, kv)
    assert jax.tree_util.tree_structure(v1) == jax.tree_util.tree_structure(v2)
    os.environ.pop("TASTE_FORCE_FUSED_DIT", None)
    # off-TPU without the force env: falls back to XLA (t=64 is also below
    # no eligibility constraint — exercise the backend gate)
    y = BasicTransformerBlock(c, h, dh, fused=True).apply(v1, x, kv)
    assert y.shape == (b, t, c)
