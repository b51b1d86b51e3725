"""Integer payloads routed through segment ops must be bit-exact under
DEFAULT matmul precision.

On TPU, default-precision matmuls feed bf16 to the MXU; bf16 cannot
represent odd integers > 256, so routing codebook ids through a one-hot
einsum silently corrupts them (e.g. 511 -> 510/512).  The conftest pins
`jax_default_matmul_precision=highest` globally, which would hide the bug —
these tests drop the pin AND structurally assert the lowered HLO contains no
dot/convolution at all (the gather formulation is exact on any platform).

Reference semantics: modeling_taste.py:1859-1881 (extract_vq word-start
remap) and :1014-1020 (valid-row compaction).
"""

import contextlib

import numpy as np
import jax
import jax.numpy as jnp

from taste_spokenlm_tpu.ops.segment import (compact_valid_rows, remap_gather,
                                            word_start_remap)


@contextlib.contextmanager
def default_matmul_precision():
    old = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "default")
    try:
        yield
    finally:
        jax.config.update("jax_default_matmul_precision", old)


def _no_dot_hlo(fn, *args):
    hlo = jax.jit(fn).lower(*args).compiler_ir(dialect="stablehlo")
    text = str(hlo)
    assert "dot_general" not in text and "convolution" not in text, \
        "integer routing lowered to a matmul/conv"


def test_remap_gather_exact_large_ids():
    rng = np.random.RandomState(0)
    b, ta, tl, l = 2, 12, 9, 4
    # ids spanning the bf16-dangerous range (odd values > 256)
    asr_indices = jnp.asarray(
        rng.randint(257, 512, (b, ta, l)) | 1, jnp.int32)
    asr_word_ids = jnp.asarray(
        np.sort(rng.randint(0, 5, (b, ta)), axis=1))
    llm_word_ids = jnp.asarray(
        np.sort(rng.randint(0, 5, (b, tl)), axis=1))
    asr_lens = jnp.asarray([ta, ta - 3])
    llm_lens = jnp.asarray([tl, tl - 2])

    m = word_start_remap(asr_word_ids, asr_lens, llm_word_ids, llm_lens)
    with default_matmul_precision():
        out = jax.jit(remap_gather)(m, asr_indices)
        _no_dot_hlo(remap_gather, m, asr_indices)

    # oracle: per-row python lookup
    mn = np.asarray(m)
    vals = np.asarray(asr_indices)
    want = np.full((b, tl, l), -1, np.int32)
    for i in range(b):
        for t in range(tl):
            nz = np.nonzero(mn[i, t])[0]
            if len(nz):
                want[i, t] = vals[i, nz[0]]
    np.testing.assert_array_equal(np.asarray(out), want)


def test_compact_valid_rows_exact_large_ids():
    rng = np.random.RandomState(1)
    b, t, c, w = 2, 10, 4, 6
    x = jnp.asarray(rng.randint(257, 512, (b, t, c)) | 1, jnp.int32)
    valid = jnp.asarray(rng.rand(b, t) < 0.5)

    with default_matmul_precision():
        out = jax.jit(compact_valid_rows,
                      static_argnames=("out_len",))(x, valid, out_len=w)
        _no_dot_hlo(lambda a, v: compact_valid_rows(a, v, w), x, valid)

    xv = np.asarray(x)
    vv = np.asarray(valid)
    for i in range(b):
        rows = xv[i][vv[i]][:w]
        np.testing.assert_array_equal(np.asarray(out)[i, :len(rows)], rows)
        assert (np.asarray(out)[i, len(rows):] == 0).all()
