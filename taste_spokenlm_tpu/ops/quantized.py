"""Int8 weight-only Dense for HBM-bound serving paths.

`QDense` stores its kernel as int8 with a per-output-channel f32 scale and
dequantizes inside the matmul, so XLA fuses the convert+scale into the
dot's operand load — an AR decode loop reads int8 from HBM instead of
bf16/f32 (see utils/quant for the tree transforms and measured numbers).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class QDense(nn.Module):
    """Drop-in int8-kernel Dense: params kernel_q int8 [in, out],
    scale f32 [out], bias f32 [out] (when use_bias)."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        q = self.param("kernel_q", nn.initializers.zeros,
                       (x.shape[-1], self.features), jnp.int8)
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        y = (x.astype(self.dtype) @ q.astype(self.dtype)) \
            * scale.astype(self.dtype)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(y.dtype)
        return y


# decode-vs-prefill crossover for the int4 path: at <=256 rows the
# VMEM-unpacking Pallas kernel wins (weight-read bound); above it a
# one-shot in-graph unpack + XLA matmul wins (compute bound)
INT4_PALLAS_MAX_ROWS = 256


def int4_apply(x, wp, scale, dtype):
    """Shared int4 weight-only matmul dispatch (QDense4 + LoraDense):
    x [..., D] @ dequant(wp [D//2, N] packed, scale [D/g, N]) -> [..., N]."""
    from taste_spokenlm_tpu.ops.pallas.int4_matmul import (
        dequantize_int4, matmul_int4)
    rows = 1
    for s in x.shape[:-1]:
        rows *= s
    if rows <= INT4_PALLAS_MAX_ROWS:
        return matmul_int4(x, wp, scale).astype(dtype)
    w = dequantize_int4(wp, scale).astype(dtype)
    return x.astype(dtype) @ w


def int4_param_shapes(in_dim: int, features: int, group=None):
    """(packed kernel shape, scale shape) for the int4 serving layout."""
    from taste_spokenlm_tpu.ops.pallas.int4_matmul import _group
    n_scales = in_dim // _group(in_dim, group)
    return (in_dim // 2, features), (n_scales, features)


def qmode(flag) -> "str | None":
    """Normalize a quantized_serving flag: False/None -> None, True ->
    'int8', 'int8'/'int4' pass through."""
    if not flag:
        return None
    if flag is True:
        return "int8"
    assert flag in ("int8", "int4"), flag
    return flag


class QDense4(nn.Module):
    """Int4 weight-only Dense: kernel packed two-nibbles-per-byte along the
    contraction dim (ops/pallas/int4_matmul layout) + per-output-channel
    f32 scale.  Decode-sized calls (<=256 rows) run the Pallas kernel that
    unpacks in VMEM — the AR loop streams HALF the bytes of int8; larger
    (prefill) calls unpack once in-graph and take the XLA matmul."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        wp_shape, s_shape = int4_param_shapes(x.shape[-1], self.features)
        wp = self.param("kernel_q4", nn.initializers.zeros,
                        wp_shape, jnp.uint8)
        scale = self.param("scale", nn.initializers.ones,
                           s_shape, jnp.float32)
        y = int4_apply(x, wp, scale, self.dtype)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(y.dtype)
        return y


def dense(features: int, quantized=False, use_bias: bool = True,
          dtype: Any = jnp.float32, name=None):
    """nn.Dense / QDense / QDense4 depending on the serving flag
    (False | True=='int8' | 'int8' | 'int4')."""
    mode = qmode(quantized)
    if mode == "int4":
        return QDense4(features, use_bias=use_bias, dtype=dtype, name=name)
    if mode == "int8":
        return QDense(features, use_bias=use_bias, dtype=dtype, name=name)
    return nn.Dense(features, use_bias=use_bias, dtype=dtype, name=name)


class QEmbed(nn.Module):
    """Int8 embedding table with per-row scales.  Lookups gather int8 rows
    and dequantize; a tied lm_head reads the int8 table through the logits
    matmul (logits = (h @ q^T) * scale), halving the 0.5 GB/step the
    Llama-1B tied head re-reads per decoded token.

    head_mode="int4" additionally stores the TRANSPOSED table nibble-packed
    with group-wise scales ([D//2, V] uint8 + [D//g*2, V] f32,
    ops/pallas/int4_matmul layout) and serves `logits` through the Pallas
    int4 kernel — the tied head is the single biggest weight read of the
    decode step (V*D bytes), and one kernel call avoids the per-call
    overhead that sinks full-backbone int4.  Lookups still gather int8."""

    num_embeddings: int
    features: int
    dtype: Any = jnp.float32
    head_mode: str = "int8"          # "int8" | "int4"
    int4_group: int = 128

    def setup(self):
        self.embedding_q = self.param(
            "embedding_q", nn.initializers.zeros,
            (self.num_embeddings, self.features), jnp.int8)
        self.embedding_scale = self.param(
            "embedding_scale", nn.initializers.ones,
            (self.num_embeddings,), jnp.float32)
        if self.head_mode == "int4":
            from taste_spokenlm_tpu.ops.pallas.int4_matmul import _group
            g = _group(self.features, self.int4_group)
            self.head_q4 = self.param(
                "head_q4", nn.initializers.zeros,
                (self.features // 2, self.num_embeddings), jnp.uint8)
            self.head_scale4 = self.param(
                "head_scale4", nn.initializers.ones,
                (self.features // g, self.num_embeddings), jnp.float32)

    def __call__(self, ids):
        rows = jnp.take(self.embedding_q, ids, axis=0).astype(self.dtype)
        return rows * jnp.take(self.embedding_scale, ids,
                               axis=0)[..., None].astype(self.dtype)

    def logits(self, hidden):
        """Tied-head projection against the int8 table.

        bf16 operands + f32 MXU accumulation: the int8->f32 convert of a
        [V, D] table costs 4x the HBM traffic of the int8 read when XLA
        materializes it; bf16 keeps the convert fusable into the dot and
        the accumulator stays f32 via preferred_element_type."""
        if self.head_mode == "int4":
            from taste_spokenlm_tpu.ops.pallas.int4_matmul import matmul_int4
            return matmul_int4(hidden, self.head_q4, self.head_scale4)
        h = hidden.astype(jnp.bfloat16)
        logits = jax.lax.dot_general(
            h, self.embedding_q.astype(jnp.bfloat16),
            (((h.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return logits * self.embedding_scale.astype(jnp.float32)[None, None, :]
