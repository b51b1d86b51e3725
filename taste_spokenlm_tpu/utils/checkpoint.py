"""Checkpoint / resume via orbax, with best-k tracking.

Replaces the reference's three checkpoint mechanisms (SURVEY.md §5): HF
Trainer save_steps/save_state (scripts/run.py:403-442), CosyVoice rank-0
torch.save + yaml sidecar (train_utils.py:156-175), and best-k variant
tracking (STAGE1_TRAIN/SpokenLM/scripts/train_taslm.py:179-198) — with a
single orbax CheckpointManager:

* sharded, async-capable saves of the full TrainState (params + ZeRO-sharded
  optimizer state + VQ EMA collection + step + rng);
* resume restores with the target shardings (resumable on a different mesh);
* best-k per metric via orbax's best-mode options.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5,
                 best_metric: Optional[str] = None, best_mode: str = "min"):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            best_fn=(lambda m: m[best_metric]) if best_metric else None,
            best_mode=best_mode,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any, metrics: Optional[Dict] = None):
        metrics = {k: float(v) for k, v in (metrics or {}).items()}
        self._mgr.save(step, args=ocp.args.StandardSave(state),
                       metrics=metrics or None)

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def best_step(self) -> Optional[int]:
        return self._mgr.best_step()

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()


def save_params(path: str, params: Any):
    """One-shot params save (for converted pretrained weights).

    StandardCheckpointer is async in recent orbax; wait + close so the save
    is durable before the caller (often a short-lived CLI) exits.
    """
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()
    ckptr.close()


def load_params(path: str, template: Optional[Any] = None) -> Any:
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        out = ckptr.restore(os.path.abspath(path), target=template)
    else:
        out = ckptr.restore(os.path.abspath(path))
    # orbax restores host numpy without a template; hand back jax arrays so
    # downstream traced indexing (e.g. codebook lookups inside while_loop
    # bodies) never hits numpy[tracer]
    import jax.numpy as jnp
    return jax.tree_util.tree_map(jnp.asarray, out)
