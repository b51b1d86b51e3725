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
