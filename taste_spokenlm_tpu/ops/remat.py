"""Gradient-checkpoint policy selection for the rematable stacks.

The `remat` config fields accept ``False | True | "dots" | "dots_no_batch"``:

* ``True`` — recompute everything in the backward (minimum activation
  memory; the behavior of the reference's ``gradient_checkpointing: true``,
  configs/training/stage1-1_text_only.yml:40).
* ``"dots"`` — save MXU dot/conv outputs across the checkpoint boundary and
  recompute only the cheap elementwise tail
  (``jax.checkpoint_policies.checkpoint_dots``): more HBM, fewer recompute
  FLOPs — usually faster when the batch still fits.
* ``"dots_no_batch"`` — save only dots with no batch dimensions (weights-
  like contractions); a middle ground.

Any truthy value turns per-layer ``nn.remat`` on; the policy only shapes
WHAT the backward recomputes, never the math — gradients are identical
(tests/test_train.py pins full-vs-dots equivalence).
"""

from typing import Any, Optional

VALID_REMAT = (False, True, "dots", "dots_no_batch")


def parse_remat(value: str) -> Any:
    """Parse a CLI/env remat string to a config field value; raises
    ValueError on unknown names (early, at the parse site)."""
    rm = {"1": True, "true": True, "full": True, "on": True,
          "0": False, "false": False, "off": False}.get(value.lower(), value)
    if rm not in VALID_REMAT:
        raise ValueError(f"unknown remat policy {value!r} "
                         "(off | full | dots | dots_no_batch)")
    return rm


def apply_remat(cfg, rm):
    """Set the remat policy on every stack gradients flow through in the
    stage-1/stage-2 train steps (whisper tower, speech-decoder encoders +
    LM, spoken-LM llama).  The single place the fan-out lives — bench.py,
    scripts/train.py and the tests all thread the flag through here."""
    return cfg.replace(
        audio_tower=cfg.audio_tower.replace(
            whisper=cfg.audio_tower.whisper.replace(remat=rm)),
        speech_decoder=cfg.speech_decoder.replace(
            text_encoder=cfg.speech_decoder.text_encoder.replace(remat=rm),
            audio_encoder=cfg.speech_decoder.audio_encoder.replace(remat=rm),
            llm=cfg.speech_decoder.llm.replace(remat=rm)),
        spoken_lm=cfg.spoken_lm.replace(
            llama=cfg.spoken_lm.llama.replace(remat=rm)))


def remat_policy(remat: Any) -> Optional[Any]:
    if remat == "dots":
        import jax
        return jax.checkpoint_policies.checkpoint_dots
    if remat == "dots_no_batch":
        import jax
        return jax.checkpoint_policies.checkpoint_dots_with_no_batch_dims
    if remat in (True, False, None):
        return None
    raise ValueError(f"unknown remat policy {remat!r} "
                     "(False | True | 'dots' | 'dots_no_batch')")
