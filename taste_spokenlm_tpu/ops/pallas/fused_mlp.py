"""Pallas fused MLP kernels for HBM-bound decode steps.

One kernel call runs the ENTIRE MLP — both projections and the
activation — streaming the quantized weights through VMEM exactly once:

    gated (llama):    y = (silu(x @ Wg) * (x @ Wu)) @ Wd
    plain (conformer): y = act(x @ W1 + b1) @ W2 + b2

Why: the AR decode loops are bound by HBM weight reads plus per-op
launch overhead.  The S3 conformer decode spends ~0.17 ms/step on
overhead across ~30 HLOs (scripts/profile_s3dec.py), and the llama MLP
is ~70% of the backbone's weight bytes.  Fusing each MLP's two (three
logical) GEMVs into ONE `pallas_call` halves the kernel count on the
dominant projections and keeps the intermediate activation `a = act(.)`
in VMEM — it never exists in HBM.

Grid layout: 1-D over tiles of the intermediate dimension I.  Step `i`
loads W1/Wg/Wu columns [i*bi, (i+1)*bi) and W2/Wd rows of the same
range, computes the tile's activation in-register, and accumulates the
tile's contribution `a_i @ W2[tile_i]` into the [M, out] f32 output
block, which stays resident in VMEM across the whole grid (the classic
k-loop revisiting pattern).  Weight bytes moved = the quantized
matrices exactly once; activation bytes = zero.

Quantization: int8 per-output-channel scales (utils/quant layout) or
int4 nibble-packed group-wise scales (ops/pallas/int4_matmul layout —
the bf16 unpack documented there).  MXU operands are bf16, accumulation
f32, scales applied on the f32 accumulator.

Replaces the fused/liger MLP kernels the reference stack gets on CUDA
(SURVEY.md §2.4 item 5; reference hot loops
/root/reference/taste_speech/modeling_taste.py:1112-1117 and the
CosyVoice conformer FFNs).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from taste_spokenlm_tpu.ops.pallas._precision import pallas_call as _pcall

_ACTS: dict = {
    "silu": jax.nn.silu,
    "swish": jax.nn.silu,
    "relu": lambda v: jnp.maximum(v, 0),
    "gelu": jax.nn.gelu,
}


def _default_interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _pick_block(I: int, block_i: int) -> int:
    bi = min(block_i, I)
    while I % bi:
        bi //= 2
    return max(bi, 1)


MLP_TILE = 512


def mlp_tile(I: int) -> int:
    """Canonical intermediate-dim tile: the fused kernels' grid block AND
    the per-tile int4 packing stride of the second projection — quantizer
    (utils/quant) and dispatch (ops/quantized) must agree on this."""
    return _pick_block(I, MLP_TILE)


# ---------------------------------------------------------------------------
# int8 gated MLP (llama): y = (silu(x @ Wg) * (x @ Wu)) @ Wd
# ---------------------------------------------------------------------------

def _gated_kernel_i8(x_ref, wg_ref, sg_ref, wu_ref, su_ref, wd_ref, sd_ref,
                     out_ref, *, act: Callable):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    x = x_ref[...]
    g = jax.lax.dot_general(
        x, wg_ref[...].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * sg_ref[0, :][None, :]
    u = jax.lax.dot_general(
        x, wu_ref[...].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * su_ref[0, :][None, :]
    a = (act(g) * u).astype(jnp.bfloat16)
    part = jax.lax.dot_general(
        a, wd_ref[...].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[...] += part * sd_ref[0, :][None, :]


def gated_mlp_int8(x: jnp.ndarray,
                   wg: jnp.ndarray, sg: jnp.ndarray,
                   wu: jnp.ndarray, su: jnp.ndarray,
                   wd: jnp.ndarray, sd: jnp.ndarray,
                   *, activation: str = "silu", block_i: int = 512,
                   interpret: Optional[bool] = None) -> jnp.ndarray:
    """x [..., H]; wg/wu [H, I] int8 (scales [I]); wd [I, H] int8
    (scales [H]) -> [..., H] f32.  One pallas_call for the whole MLP."""
    if interpret is None:
        interpret = _default_interpret()
    lead, H = x.shape[:-1], x.shape[-1]
    I = wg.shape[1]
    assert wg.shape == (H, I) and wu.shape == (H, I) and wd.shape == (I, H)
    M = 1
    for s in lead:
        M *= s
    xm = x.reshape(M, H).astype(jnp.bfloat16)
    bi = _pick_block(I, block_i)
    out = _pcall(
        functools.partial(_gated_kernel_i8, act=_ACTS[activation]),
        grid=(I // bi,),
        in_specs=[
            pl.BlockSpec((M, H), lambda i: (0, 0)),
            pl.BlockSpec((H, bi), lambda i: (0, i)),
            pl.BlockSpec((1, bi), lambda i: (0, i)),
            pl.BlockSpec((H, bi), lambda i: (0, i)),
            pl.BlockSpec((1, bi), lambda i: (0, i)),
            pl.BlockSpec((bi, H), lambda i: (i, 0)),
            pl.BlockSpec((1, H), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((M, H), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((M, H), jnp.float32),
        interpret=interpret,
    )(xm, wg, sg.reshape(1, I).astype(jnp.float32),
      wu, su.reshape(1, I).astype(jnp.float32),
      wd, sd.reshape(1, H).astype(jnp.float32))
    return out.reshape(*lead, H)


# ---------------------------------------------------------------------------
# int4 gated MLP — nibble-packed weights (ops/pallas/int4_matmul layout)
# ---------------------------------------------------------------------------

def _unpack_nibbles_bf16(wp):
    """[Dh, n] uint8 -> (lo, hi) bf16 planes in [-8, 7] (exact; shared
    i32 pure-shift formulation — see int4_matmul.unpack_nibbles_bf16 for
    which ops this chip's Mosaic legalizes)."""
    from taste_spokenlm_tpu.ops.pallas.int4_matmul import unpack_nibbles_bf16
    return unpack_nibbles_bf16(wp)


def _dot_int4(x, wp_ref, s_ref, group):
    """x [M, D] bf16, wp [D//2, bn] packed, s [n_scales, bn] -> [M, bn] f32.

    Same group-accumulate structure as int4_matmul._kernel."""
    w_lo, w_hi = _unpack_nibbles_bf16(wp_ref[...])
    half = x.shape[-1] // 2
    n_g = half // group
    acc = None
    for plane, w_pl in ((0, w_lo), (1, w_hi)):
        for g in range(n_g):
            r0 = g * group
            part = jax.lax.dot_general(
                x[:, plane * half + r0: plane * half + r0 + group],
                w_pl[r0: r0 + group, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            part = part * s_ref[plane * n_g + g, :].astype(jnp.float32)
            acc = part if acc is None else acc + part
    return acc


def _gated_kernel_i4(x_ref, wg_ref, sg_ref, wu_ref, su_ref, wd_ref, sd_ref,
                     out_ref, *, act: Callable, group_in: int,
                     group_mid: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    x = x_ref[...]
    g = _dot_int4(x, wg_ref, sg_ref, group_in)
    u = _dot_int4(x, wu_ref, su_ref, group_in)
    a = (act(g) * u).astype(jnp.bfloat16)
    # sd block is [1, sc_pad, H] (tile-indexed, rows padded to a sublane
    # multiple — see _tile_scales); [0] yields the tile's 2-D scale rows
    out_ref[...] += _dot_int4(a, wd_ref, sd_ref[0], group_mid)


def gated_mlp_int4(x: jnp.ndarray,
                   wg: jnp.ndarray, sg: jnp.ndarray,
                   wu: jnp.ndarray, su: jnp.ndarray,
                   wd: jnp.ndarray, sd: jnp.ndarray,
                   *, activation: str = "silu", block_i: int = 512,
                   interpret: Optional[bool] = None) -> jnp.ndarray:
    """int4 variant: wg/wu packed [H//2, I] (scales [H//group, I]),
    wd packed [I//2, H] (scales [I//group, H]).

    NOTE the down-projection streams its FULL packed matrix every grid
    step would be wasteful — instead its contraction dim I is the grid
    axis, so each step needs rows [i*bi//2 ...] of BOTH nibble planes.
    To keep one contiguous block per step, wd must be packed PER-TILE:
    pack_int4 applied tile-by-tile along I (see pack_int4_tiled)."""
    if interpret is None:
        interpret = _default_interpret()
    lead, H = x.shape[:-1], x.shape[-1]
    I = wg.shape[1]
    n_sc_in = sg.shape[0]
    group_in = (H // 2) // (n_sc_in // 2)
    M = 1
    for s in lead:
        M *= s
    xm = x.reshape(M, H).astype(jnp.bfloat16)
    bi = _pick_block(I, block_i)
    n_sc_mid = sd.shape[0]
    # wd scales are laid out per tile: [n_tiles, n_per_tile, H]
    n_tiles = I // bi
    assert n_sc_mid % n_tiles == 0, (n_sc_mid, n_tiles)
    sc_per_tile = n_sc_mid // n_tiles
    group_mid = (bi // 2) // (sc_per_tile // 2)
    sd3, sc_pad = _tile_scales(sd, n_tiles, sc_per_tile)
    out = _pcall(
        functools.partial(_gated_kernel_i4, act=_ACTS[activation],
                          group_in=group_in, group_mid=group_mid),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((M, H), lambda i: (0, 0)),
            pl.BlockSpec((H // 2, bi), lambda i: (0, i)),
            pl.BlockSpec((n_sc_in, bi), lambda i: (0, i)),
            pl.BlockSpec((H // 2, bi), lambda i: (0, i)),
            pl.BlockSpec((n_sc_in, bi), lambda i: (0, i)),
            pl.BlockSpec((bi // 2, H), lambda i: (i, 0)),
            pl.BlockSpec((1, sc_pad, H), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((M, H), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((M, H), jnp.float32),
        interpret=interpret,
    )(xm, wg, sg.astype(jnp.float32), wu, su.astype(jnp.float32),
      wd, sd3)
    return out.reshape(*lead, H)


def _tile_scales(s: jnp.ndarray, n_tiles: int, sc_per_tile: int):
    """[n_tiles*sc_per_tile, H] -> ([n_tiles, sc_pad, H] f32, sc_pad).

    Mosaic requires a block's last-two dims be (8k, 128k)-aligned; a flat
    per-tile scale slice of e.g. 4 rows violates the sublane rule, so the
    tile axis becomes a leading unit-blocked dim and the rows are
    zero-padded up to a sublane multiple (padding rows are never indexed:
    the kernel reads rows [0, sc_per_tile))."""
    H = s.shape[-1]
    s3 = s.astype(jnp.float32).reshape(n_tiles, sc_per_tile, H)
    sc_pad = -(-sc_per_tile // 8) * 8
    if sc_pad != sc_per_tile:
        s3 = jnp.pad(s3, ((0, 0), (0, sc_pad - sc_per_tile), (0, 0)))
    return s3, sc_pad


def quantize_int4_tiled(w: jnp.ndarray, tile: int,
                        group: Optional[int] = None):
    """Quantize+pack [I, H] tile-by-tile along I so gated_mlp_int4 can
    stream contiguous per-tile blocks: returns packed [I//2, H] where
    rows [t*tile//2, (t+1)*tile//2) hold tile t's lo/hi planes, and
    scales [I//tile * n_scales_per_tile, H] in tile order."""
    from taste_spokenlm_tpu.ops.pallas.int4_matmul import quantize_int4
    I, H = w.shape
    assert I % tile == 0
    packs, scales = [], []
    for t in range(I // tile):
        p, s = quantize_int4(w[t * tile:(t + 1) * tile], group)
        packs.append(p)
        scales.append(s)
    return jnp.concatenate(packs, 0), jnp.concatenate(scales, 0)


def dequantize_int4_tiled(wp: jnp.ndarray, scale: jnp.ndarray, tile: int):
    """Inverse of quantize_int4_tiled (test helper)."""
    from taste_spokenlm_tpu.ops.pallas.int4_matmul import dequantize_int4
    Ih, H = wp.shape
    n_tiles = (Ih * 2) // tile
    th = tile // 2
    sc_per_tile = scale.shape[0] // n_tiles
    outs = []
    for t in range(n_tiles):
        outs.append(dequantize_int4(
            wp[t * th:(t + 1) * th],
            scale[t * sc_per_tile:(t + 1) * sc_per_tile]))
    return jnp.concatenate(outs, 0)


# ---------------------------------------------------------------------------
# int4 plain FFN (conformer positionwise): y = act(x @ W1 + b1) @ W2 + b2
# ---------------------------------------------------------------------------

def _ffn_kernel_i4(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
                   out_ref, *, act: Callable, group_in: int, group_mid: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        out_ref[...] = jnp.broadcast_to(
            b2_ref[0, :][None, :], out_ref.shape).astype(jnp.float32)

    x = x_ref[...]
    h = _dot_int4(x, w1_ref, s1_ref, group_in) + b1_ref[0, :][None, :]
    a = act(h).astype(jnp.bfloat16)
    out_ref[...] += _dot_int4(a, w2_ref, s2_ref[0], group_mid)


def ffn_int4(x: jnp.ndarray,
             w1: jnp.ndarray, s1: jnp.ndarray, b1: jnp.ndarray,
             w2: jnp.ndarray, s2: jnp.ndarray, b2: jnp.ndarray,
             *, activation: str = "swish", block_i: int = 512,
             interpret: Optional[bool] = None) -> jnp.ndarray:
    """int4 FFN: w1 packed [D//2, I] (standard int4_matmul layout), w2
    packed PER-TILE [I//2, D] (quantize_int4_tiled with tile=block_i)."""
    if interpret is None:
        interpret = _default_interpret()
    lead, D = x.shape[:-1], x.shape[-1]
    I = w1.shape[1]
    n_sc_in = s1.shape[0]
    group_in = (D // 2) // (n_sc_in // 2)
    M = 1
    for s in lead:
        M *= s
    xm = x.reshape(M, D).astype(jnp.bfloat16)
    bi = _pick_block(I, block_i)
    n_tiles = I // bi
    n_sc_mid = s2.shape[0]
    assert n_sc_mid % n_tiles == 0, (n_sc_mid, n_tiles)
    sc_per_tile = n_sc_mid // n_tiles
    group_mid = (bi // 2) // (sc_per_tile // 2)
    s23, sc_pad = _tile_scales(s2, n_tiles, sc_per_tile)
    out = _pcall(
        functools.partial(_ffn_kernel_i4, act=_ACTS[activation],
                          group_in=group_in, group_mid=group_mid),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((M, D), lambda i: (0, 0)),
            pl.BlockSpec((D // 2, bi), lambda i: (0, i)),
            pl.BlockSpec((n_sc_in, bi), lambda i: (0, i)),
            pl.BlockSpec((1, bi), lambda i: (0, i)),
            pl.BlockSpec((bi // 2, D), lambda i: (i, 0)),
            pl.BlockSpec((1, sc_pad, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((M, D), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((M, D), jnp.float32),
        interpret=interpret,
    )(xm, w1, s1.astype(jnp.float32), b1.reshape(1, I).astype(jnp.float32),
      w2, s23, b2.reshape(1, D).astype(jnp.float32))
    return out.reshape(*lead, D)


# ---------------------------------------------------------------------------
# int8 plain FFN (conformer positionwise): y = act(x @ W1 + b1) @ W2 + b2
# ---------------------------------------------------------------------------

def _ffn_kernel_i8(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
                   out_ref, *, act: Callable):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        # bias of the second projection folds into the init value
        out_ref[...] = jnp.broadcast_to(
            b2_ref[0, :][None, :], out_ref.shape).astype(jnp.float32)

    x = x_ref[...]
    h = jax.lax.dot_general(
        x, w1_ref[...].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    h = h * s1_ref[0, :][None, :] + b1_ref[0, :][None, :]
    a = act(h).astype(jnp.bfloat16)
    part = jax.lax.dot_general(
        a, w2_ref[...].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[...] += part * s2_ref[0, :][None, :]


def ffn_int8(x: jnp.ndarray,
             w1: jnp.ndarray, s1: jnp.ndarray, b1: jnp.ndarray,
             w2: jnp.ndarray, s2: jnp.ndarray, b2: jnp.ndarray,
             *, activation: str = "swish", block_i: int = 512,
             interpret: Optional[bool] = None) -> jnp.ndarray:
    """x [..., D]; w1 [D, I] int8 (scales [I], bias [I]); w2 [I, D] int8
    (scales [D], bias [D]) -> [..., D] f32, one pallas_call."""
    if interpret is None:
        interpret = _default_interpret()
    lead, D = x.shape[:-1], x.shape[-1]
    I = w1.shape[1]
    assert w1.shape == (D, I) and w2.shape == (I, D)
    M = 1
    for s in lead:
        M *= s
    xm = x.reshape(M, D).astype(jnp.bfloat16)
    bi = _pick_block(I, block_i)
    out = _pcall(
        functools.partial(_ffn_kernel_i8, act=_ACTS[activation]),
        grid=(I // bi,),
        in_specs=[
            pl.BlockSpec((M, D), lambda i: (0, 0)),
            pl.BlockSpec((D, bi), lambda i: (0, i)),
            pl.BlockSpec((1, bi), lambda i: (0, i)),
            pl.BlockSpec((1, bi), lambda i: (0, i)),
            pl.BlockSpec((bi, D), lambda i: (i, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((M, D), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((M, D), jnp.float32),
        interpret=interpret,
    )(xm, w1, s1.reshape(1, I).astype(jnp.float32),
      b1.reshape(1, I).astype(jnp.float32),
      w2, s2.reshape(1, D).astype(jnp.float32),
      b2.reshape(1, D).astype(jnp.float32))
    return out.reshape(*lead, D)
