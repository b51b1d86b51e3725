"""Optimizers, LR schedules, and freeze/unfreeze masks.

Replaces the reference's NeMo-derived scheduler zoo
(/root/reference/STAGE1_TRAIN/CosyVoice/cosyvoice/utils/scheduler.py:27-739)
with optax schedules, and HF-Trainer freeze-by-regex
(/root/reference/scripts/run.py:278-305) with an optax.masked wrapper.
"""

from __future__ import annotations

import re
from typing import Any, Optional, Sequence

import jax
import optax


# ---------------------------------------------------------------------------
# schedules
# ---------------------------------------------------------------------------


def warmup_lr(lr: float, warmup_steps: int) -> optax.Schedule:
    """ESPnet WarmupLR: lr * w^0.5 * min(step^-0.5, step * w^-1.5)
    (scheduler.py:27-60); equals Noam with the peak at `warmup_steps`."""
    def schedule(step):
        s = jax.numpy.maximum(step, 1).astype(jax.numpy.float32)
        return lr * warmup_steps ** 0.5 * jax.numpy.minimum(
            s ** -0.5, s * warmup_steps ** -1.5)
    return schedule


def constant_warmup_lr(lr: float, warmup_steps: int) -> optax.Schedule:
    return optax.linear_schedule(0.0, lr, warmup_steps)


def cosine_lr(lr: float, warmup_steps: int, total_steps: int,
              min_lr: float = 0.0) -> optax.Schedule:
    """Linear warmup + cosine decay (HF Trainer 'cosine', used by stage-1
    configs: lr 2e-4 cosine, stage1-1_text_only.yml:28-44)."""
    return optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup_steps, max(total_steps, warmup_steps + 1), min_lr)


def square_annealing_lr(lr: float, warmup_steps: int, total_steps: int,
                        min_lr: float = 1e-5) -> optax.Schedule:
    """Linear warmup then lr * ((max-step)/max)^2 (scheduler.py:384-388,
    444-470)."""
    def schedule(step):
        s = step.astype(jax.numpy.float32) if hasattr(step, "astype") \
            else jax.numpy.float32(step)
        warm = lr * jax.numpy.minimum(s / max(warmup_steps, 1), 1.0)
        frac = jax.numpy.clip(
            (total_steps - s) / max(total_steps - warmup_steps, 1), 0.0, 1.0)
        anneal = jax.numpy.maximum(lr * frac ** 2, min_lr)
        return jax.numpy.where(s < warmup_steps, warm, anneal)
    return schedule


def noam_hold_lr(lr: float, warmup_steps: int, hold_steps: int = 0,
                 decay_rate: float = 0.5, min_lr: float = 0.0
                 ) -> optax.Schedule:
    """NoamHoldAnnealing (scheduler.py:433-441, 624-739): linear warmup,
    optional hold at peak, then lr * (warmup^d) / ((step-hold)^d)."""
    def schedule(step):
        s = jax.numpy.maximum(step, 1).astype(jax.numpy.float32)
        warm = lr * jax.numpy.minimum(s / max(warmup_steps, 1), 1.0)
        decay_steps = jax.numpy.maximum(s - hold_steps, 1.0)
        decay = lr * max(1.0, warmup_steps ** decay_rate) / \
            decay_steps ** decay_rate
        out = jax.numpy.where(s < warmup_steps + hold_steps, warm,
                              jax.numpy.maximum(decay, min_lr))
        return out
    return schedule


SCHEDULES = {
    "warmuplr": warmup_lr,
    "constantlr": lambda lr, warmup: constant_warmup_lr(lr, warmup),
    "cosine": cosine_lr,
    "square_annealing": square_annealing_lr,
    "noam_hold": noam_hold_lr,
}


# ---------------------------------------------------------------------------
# freeze / unfreeze by regex
# ---------------------------------------------------------------------------


def trainable_mask(params: Any, unfreeze_patterns: Optional[Sequence[str]] = None,
                   freeze_patterns: Optional[Sequence[str]] = None) -> Any:
    """Bool pytree: True = trainable.

    Matches the reference semantics (run.py:278-305): if `unfreeze_patterns`
    given, ONLY matching paths train; `freeze_patterns` then force-freezes.
    Paths are '/'-joined param paths like
    'audio_tower/decoder/layers_0/self_attn/q_proj/kernel'.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(path):
        return "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                        for p in path)

    def decide(p):
        train = True
        if unfreeze_patterns is not None:
            train = any(re.search(pat, p) for pat in unfreeze_patterns)
        if freeze_patterns is not None and any(re.search(pat, p)
                                               for pat in freeze_patterns):
            train = False
        return train

    leaves = [decide(path_str(p)) for p, _ in flat]
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params), leaves)


def lora_only_mask(params: Any) -> Any:
    """Stage-2 default: train LoRA adapters + bridges + pad embeds, freeze
    the base llama (reference stage2 configs + peft)."""
    return trainable_mask(params, unfreeze_patterns=[
        r"lora_a$", r"lora_b$", r"fuse_for_bridge_in_llm",
        r"extract_for_bridge_out_llm", r"pad_text_unit_embed",
        r"pad_audio_unit_embed"])


def make_optimizer(
    learning_rate,
    mask: Optional[Any] = None,
    weight_decay: float = 0.0,
    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
    grad_clip: Optional[float] = None,
) -> optax.GradientTransformation:
    """AdamW with optional global-norm clipping (reference: adam lr 1.6e-4
    grad_clip 5 for stage-1, conf/taste.yaml:295-307) and trainable mask."""
    chain = []
    if grad_clip:
        chain.append(optax.clip_by_global_norm(grad_clip))
    if weight_decay:
        chain.append(optax.adamw(learning_rate, b1=b1, b2=b2, eps=eps,
                                 weight_decay=weight_decay))
    else:
        chain.append(optax.adam(learning_rate, b1=b1, b2=b2, eps=eps))
    tx = optax.chain(*chain)
    if mask is not None:
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()},
            jax.tree_util.tree_map(lambda t: "train" if t else "freeze", mask))
    return tx
