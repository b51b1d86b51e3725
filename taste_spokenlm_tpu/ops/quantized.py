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


# fused-MLP kernels hold the [M, out] f32 accumulator block in VMEM across
# the whole grid; past ~256 rows prefill is compute-bound anyway
FUSED_MLP_MAX_ROWS = 256


class QProjParams(nn.Module):
    """Declares one quantized projection's params (no forward) so the
    fused-MLP dispatch can read the raw leaves.  `names` matches the
    surrounding module family: ("base_q", "base_scale", "base_q4") mirrors
    llama.LoraDense(quantized), ("kernel_q", "scale", "kernel_q4") mirrors
    QDense/QDense4 — the param tree stays identical to the unfused layout,
    so utils/quant transforms and converters are unchanged."""

    in_dim: int
    features: int
    mode: str                       # 'int8' | 'int4'
    names: tuple = ("base_q", "base_scale", "base_q4")
    use_bias: bool = False

    @nn.compact
    def __call__(self):
        if self.mode == "int4":
            wp_shape, s_shape = int4_param_shapes(self.in_dim, self.features)
            wp = self.param(self.names[2], nn.initializers.zeros,
                            wp_shape, jnp.uint8)
            scale = self.param(self.names[1], nn.initializers.ones,
                               s_shape, jnp.float32)
        else:
            wp = self.param(self.names[0], nn.initializers.zeros,
                            (self.in_dim, self.features), jnp.int8)
            scale = self.param(self.names[1], nn.initializers.ones,
                               (self.features,), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        return wp, scale, bias


def _rows(x) -> int:
    rows = 1
    for s in x.shape[:-1]:
        rows *= s
    return rows


def fused_gated_mlp_apply(x, gate, up, down, mode: str, dtype,
                          activation: str = "silu"):
    """Gated-MLP dispatch over (wp, scale, _) triples from QProjParams:
    decode rows -> ONE Pallas call (ops/pallas/fused_mlp); prefill rows ->
    unfused XLA math over the same params."""
    from taste_spokenlm_tpu.ops.pallas.fused_mlp import (
        gated_mlp_int4, gated_mlp_int8, mlp_tile, dequantize_int4_tiled)
    I = (gate[0].shape[1])
    tile = mlp_tile(I)
    if _rows(x) <= FUSED_MLP_MAX_ROWS:
        fn = gated_mlp_int4 if mode == "int4" else gated_mlp_int8
        return fn(x, gate[0], gate[1], up[0], up[1], down[0], down[1],
                  activation=activation, block_i=tile).astype(dtype)
    act = nn.silu if activation in ("silu", "swish") else nn.relu
    if mode == "int4":
        g = int4_apply(x, gate[0], gate[1], dtype)
        u = int4_apply(x, up[0], up[1], dtype)
        wd = dequantize_int4_tiled(down[0], down[1], tile).astype(dtype)
        return (act(g) * u).astype(dtype) @ wd
    g = (x.astype(dtype) @ gate[0].astype(dtype)) * gate[1].astype(dtype)
    u = (x.astype(dtype) @ up[0].astype(dtype)) * up[1].astype(dtype)
    return ((act(g) * u) @ down[0].astype(dtype)) * down[1].astype(dtype)


def fused_ffn_apply(x, w1, w2, mode: str, dtype, activation: str = "swish"):
    """Plain-FFN dispatch over (wp, scale, bias) triples (conformer
    positionwise FFN): decode rows -> ONE Pallas call; prefill -> XLA."""
    from taste_spokenlm_tpu.ops.pallas.fused_mlp import (
        ffn_int4, ffn_int8, mlp_tile, dequantize_int4_tiled)
    I = w1[0].shape[1]
    tile = mlp_tile(I)
    if _rows(x) <= FUSED_MLP_MAX_ROWS:
        fn = ffn_int4 if mode == "int4" else ffn_int8
        return fn(x, w1[0], w1[1], w1[2], w2[0], w2[1], w2[2],
                  activation=activation, block_i=tile).astype(dtype)
    act = nn.silu if activation in ("silu", "swish") else nn.relu
    if mode == "int4":
        h = int4_apply(x, w1[0], w1[1], dtype) + w1[2].astype(dtype)
        wd = dequantize_int4_tiled(w2[0], w2[1], tile).astype(dtype)
        return act(h).astype(dtype) @ wd + w2[2].astype(dtype)
    h = (x.astype(dtype) @ w1[0].astype(dtype)) * w1[1].astype(dtype) \
        + w1[2].astype(dtype)
    return (act(h) @ w2[0].astype(dtype)) * w2[1].astype(dtype) \
        + w2[2].astype(dtype)


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
