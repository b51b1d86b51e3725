"""Precision-pinned pallas_call.

Every kernel in this package fixes its own numerics: bf16/int operands on
the MXU with f32 accumulation via `preferred_element_type`.  An ambient
`jax_default_matmul_precision=highest` (set e.g. by parity scripts for
trustworthy f32 reference paths) would leak into the kernel trace and
request fp32-contract bf16 matmuls, which Mosaic rejects with
"Bad lhs type".  This wrapper traces the kernel under DEFAULT matmul
precision so the kernels' declared numerics are authoritative regardless
of global flags.
"""

from __future__ import annotations

import functools

import jax
from jax.experimental import pallas as pl


def pallas_call(*args, **kwargs):
    inner = pl.pallas_call(*args, **kwargs)

    @functools.wraps(inner)
    def run(*a, **k):
        with jax.default_matmul_precision("default"):
            return inner(*a, **k)

    return run
