"""Pallas same-padding (dilated) conv1d for narrow-channel vocoder stacks.

XLA's conv lowering runs the HiFT ResBlock convs (C=64..512, B=1, very long
T) at ~3-6 TF/s on v5e — the conv is expressed over a [T, C] operand whose
output width (C_out <= 512) leaves the MXU mostly idle under XLA's
schedule.  This kernel streams T in large VMEM tiles and expresses the
conv as a K-tap loop of [TS, C_in] @ [C_in, C_out] MXU matmuls with an f32
accumulator — exactly one halo'd DMA per tile, weights resident in VMEM.

Semantics match torch Conv1d(C_in, C_out, K, dilation=D,
padding=(K-1)*D//2) on channels-last input, i.e. `models/hift.conv1d`
with that padding (generator.py ResBlock taps).  Odd (K-1)*D is rejected
(torch 'same' would be asymmetric); every vocoder tap has odd K.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from taste_spokenlm_tpu.ops.pallas._precision import pallas_call as _pcall
from jax.experimental.pallas import tpu as pltpu


def _kernel(xp_ref, w_ref, out_ref, x_scratch, sem, *, tile: int, K: int,
            D: int, out_dtype):
    i = pl.program_id(0)
    dma = pltpu.make_async_copy(
        xp_ref.at[pl.ds(i * tile, x_scratch.shape[0]), :], x_scratch, sem)
    dma.start()
    dma.wait()
    acc = None
    for k in range(K):
        part = jax.lax.dot_general(
            x_scratch[pl.ds(k * D, tile), :], w_ref[k],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    out_ref[...] = acc.astype(out_dtype)


def conv1d_same(x: jnp.ndarray, w: jnp.ndarray,
                b: Optional[jnp.ndarray] = None, *, dilation: int = 1,
                tile: int = 1024,
                interpret: Optional[bool] = None) -> jnp.ndarray:
    """x [B, T, C_in], w [K, C_in, C_out] -> [B, T, C_out] (same padding).

    bf16 in / bf16 out with f32 accumulation; bias (f32/[C_out]) is added
    outside the kernel (XLA fuses it into the output write).  On CPU the
    kernel runs in interpret mode (tests / parity)."""
    if interpret is None:
        # "axon" is this machine's TPU PJRT plugin name (utils/platform.py)
        interpret = jax.default_backend() not in ("tpu", "axon")
    return _conv1d_same(x, w, b, dilation=dilation, tile=tile,
                        interpret=interpret)


@functools.partial(jax.jit, static_argnames=("dilation", "tile", "interpret"))
def _conv1d_same(x, w, b, *, dilation, tile, interpret):
    B, T, Cin = x.shape
    K, _, Cout = w.shape
    D = dilation
    pad = (K - 1) * D
    assert pad % 2 == 0, "asymmetric same-padding not supported"
    # DMA slice length (tile + halo) must be sublane-aligned (16 for bf16)
    halo = -(-pad // 16) * 16
    n_tiles = -(-T // tile)
    T_pad = n_tiles * tile
    xp = jnp.pad(x, ((0, 0),
                     (pad // 2, (halo - pad // 2) + (T_pad - T)), (0, 0)))

    run = _pcall(
        functools.partial(_kernel, tile=tile, K=K, D=D, out_dtype=x.dtype),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),         # xp: manual halo DMA
            pl.BlockSpec(memory_space=pltpu.VMEM),     # weights resident
        ],
        out_specs=pl.BlockSpec((tile, Cout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T_pad, Cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile + halo, Cin), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )
    y = jax.vmap(lambda xb: run(xb, w))(xp)[:, :T]
    if b is not None:
        y = y + b.astype(y.dtype)
    return y
