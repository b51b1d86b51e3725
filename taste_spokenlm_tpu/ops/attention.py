"""Attention cores.

One attention implementation for the whole framework (replacing the
reference's eager/SDPA/FlashAttention-2 triplication in
/root/reference/taste_speech/modules_taste/cosyvoice/customized_whisper.py):
an einsum-based multi-head attention with fp32 logits that XLA fuses onto the
MXU, plus a Pallas flash-attention path for long sequences on TPU
(ops/pallas/flash_attention.py).  The split-KV cross-attention used by the
TASTE segmenter (K from the encoder's final hidden, V from layer-6 hidden —
customized_whisper.py:360-366) falls out naturally: callers simply pass
different `key`/`value` source tensors.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def multi_head_attention(
    q: jnp.ndarray,  # [B, Tq, H, D]
    k: jnp.ndarray,  # [B, Tk, H, D]
    v: jnp.ndarray,  # [B, Tk, H, D]
    bias: Optional[jnp.ndarray] = None,   # broadcastable to [B, H, Tq, Tk]
    mask: Optional[jnp.ndarray] = None,   # bool, broadcastable to [B, H, Tq, Tk]
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Returns [B, Tq, H, D].  Softmax in fp32 regardless of input dtype."""
    dtype = q.dtype
    d = q.shape[-1]
    if scale is None:
        scale = d ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * jnp.asarray(scale, jnp.float32)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.asarray(jnp.finfo(jnp.float32).min / 2))
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(dtype)


def padded_flash_attention(
    q: jnp.ndarray,  # [B, Tq, H, D]
    k: jnp.ndarray,  # [B, Tk, H, D]
    v: jnp.ndarray,  # [B, Tk, H, D]
    key_valid: jnp.ndarray,  # bool [B, Tk]
    scale: Optional[float] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Flash attention with a per-example key padding mask.

    The Pallas kernel (ops/pallas/flash_attention.py) has no mask operand —
    it zero-pads the head dim up to the 128-lane tile anyway, so the mask is
    smuggled into the dot product through one of those free lanes: q gets a
    constant-1 lane and k gets 0 (valid) / -30000/scale (padded), making the
    padded keys' logits -30000 after the kernel's scale multiply — exp -> 0
    in the kernel's f32 softmax.  Cost over unmasked flash: one extra lane
    that was already being padded.

    Rows whose keys are ALL padded get a uniform softmax over junk — callers
    mask padded query positions downstream (the flow U-Net multiplies by the
    frame mask before every conv), exactly as with the einsum path, whose
    all--inf rows also produce junk."""
    b, tq, h, d = q.shape
    tk = k.shape[1]
    if scale is None:
        scale = d ** -0.5
    from taste_spokenlm_tpu.ops.pallas.flash_attention import flash_attention
    lane_q = jnp.ones((b, tq, h, 1), q.dtype)
    lane_k = jnp.where(key_valid, 0.0, -30000.0 / scale).astype(k.dtype)
    lane_k = jnp.broadcast_to(lane_k[:, :, None, None], (b, tk, h, 1))
    lane_v = jnp.zeros((b, tk, h, 1), v.dtype)
    out = flash_attention(
        jnp.concatenate([q, lane_q], axis=-1),
        jnp.concatenate([k, lane_k], axis=-1),
        jnp.concatenate([v, lane_v], axis=-1),
        scale=scale, interpret=interpret)
    return out[..., :d]


def gqa_attention(
    q: jnp.ndarray,  # [B, Tq, Hq, D]
    k: jnp.ndarray,  # [B, Tk, Hkv, D]
    v: jnp.ndarray,  # [B, Tk, Hkv, D]
    mask: Optional[jnp.ndarray] = None,   # bool, broadcastable to [B, 1|H, Tq, Tk]
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Grouped-query attention (Llama-3 style, Hq a multiple of Hkv)."""
    b, tq, hq, d = q.shape
    hkv = k.shape[2]
    group = hq // hkv
    if scale is None:
        scale = d ** -0.5
    qg = q.reshape(b, tq, hkv, group, d)
    logits = jnp.einsum("bqhgd,bkhd->bhgqk", qg, k, preferred_element_type=jnp.float32)
    logits = logits * jnp.asarray(scale, jnp.float32)
    if mask is not None:
        if mask.ndim == 4:  # [B, 1|H, Tq, Tk] -> [B, H_kv, g, Tq, Tk]
            if mask.shape[1] == 1:
                mask = mask[:, :, None]
            else:
                mask = mask.reshape(b, hkv, group, *mask.shape[2:])
        logits = jnp.where(mask, logits, jnp.asarray(jnp.finfo(jnp.float32).min / 2))
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhgqk,bkhd->bqhgd", probs.astype(q.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.reshape(b, tq, hq, d).astype(q.dtype)
