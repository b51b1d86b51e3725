"""Int8 weight-only Dense for HBM-bound serving paths.

`QDense` stores its kernel as int8 with a per-output-channel f32 scale and
dequantizes inside the matmul, so XLA fuses the convert+scale into the
dot's operand load — an AR decode loop reads int8 from HBM instead of
bf16/f32 (see utils/quant for the tree transforms and measured numbers).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
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


def dense(features: int, quantized: bool, use_bias: bool = True,
          dtype: Any = jnp.float32, name=None):
    """nn.Dense or QDense depending on the serving flag."""
    if quantized:
        return QDense(features, use_bias=use_bias, dtype=dtype, name=name)
    return nn.Dense(features, use_bias=use_bias, dtype=dtype, name=name)
