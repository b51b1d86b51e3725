"""Training orchestration: steps loop, eval, checkpointing, metrics.

Replaces the reference's HF-Trainer subclasses (scripts/run.py:30-170) and
the CosyVoice Executor epoch loop
(STAGE1_TRAIN/CosyVoice/cosyvoice/utils/executor.py:30-164) with one
step-based loop:

* per-step metrics to TensorBoard/JSONL (loss, lr, grad_norm, acc);
* periodic eval with the reference's metric names (speech_token_accuracy,
  text_accuracy, a0..a{L-1}_accuracy);
* periodic + best-k checkpoints via orbax;
* uneven-host data handled by step budgets rather than the reference's
  gloo `monitored_barrier` escape (train_utils.py:178-196) — every host
  runs the same number of jitted steps by construction.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, Iterable, Iterator, Optional

import jax
import numpy as np

from taste_spokenlm_tpu.train.train_step import TrainState
from taste_spokenlm_tpu.utils.checkpoint import CheckpointManager
from taste_spokenlm_tpu.utils.metrics import MetricWriter, get_logger


@dataclasses.dataclass
class TrainerConfig:
    total_steps: int = 10000
    log_every: int = 50
    eval_every: int = 1000
    save_every: int = 1000
    max_to_keep: int = 5
    best_metric: Optional[str] = "loss"
    workdir: str = "./workdir"


class Trainer:
    def __init__(self, cfg: TrainerConfig, step_fn: Callable,
                 eval_fn: Optional[Callable] = None,
                 schedule: Optional[Callable] = None):
        self.cfg = cfg
        self.step_fn = step_fn
        self.eval_fn = eval_fn
        self.schedule = schedule
        self.logger = get_logger()
        self.writer = MetricWriter(cfg.workdir)
        self.ckpt = CheckpointManager(f"{cfg.workdir}/ckpt",
                                      max_to_keep=cfg.max_to_keep,
                                      best_metric=cfg.best_metric)

    def maybe_resume(self, state: TrainState) -> TrainState:
        if self.ckpt.latest_step() is not None:
            self.logger.info("resuming from step %s", self.ckpt.latest_step())
            return self.ckpt.restore(state)
        return state

    def fit(self, state: TrainState, batches: Iterator[Dict],
            eval_batches: Optional[Callable[[], Iterable[Dict]]] = None
            ) -> TrainState:
        cfg = self.cfg
        start = int(jax.device_get(state.step))
        t0 = time.perf_counter()
        window = []
        for step_idx in range(start, cfg.total_steps):
            batch = next(batches)
            state, metrics = self.step_fn(state, batch)
            window.append(metrics)

            if (step_idx + 1) % cfg.log_every == 0:
                # rank-0 metric writing (the reference's rank==0 TB guard,
                # train_utils.py executor); every process still runs the
                # same jitted steps and checkpoint saves
                if jax.process_index() == 0:
                    avg = {k: float(np.mean([float(jax.device_get(m[k]))
                                             for m in window]))
                           for k in window[0]}
                    if self.schedule is not None:
                        avg["lr"] = float(self.schedule(step_idx))
                    avg["steps_per_s"] = (len(window)
                                          / (time.perf_counter() - t0))
                    self.writer.write(step_idx + 1, avg)
                    self.logger.info("step %d: %s", step_idx + 1,
                                     {k: round(v, 4) for k, v in avg.items()})
                window, t0 = [], time.perf_counter()

            if self.eval_fn and eval_batches and \
                    (step_idx + 1) % cfg.eval_every == 0:
                eval_metrics = self.evaluate(state, eval_batches())
                if jax.process_index() == 0:
                    self.writer.write(
                        step_idx + 1,
                        {f"eval/{k}": v for k, v in eval_metrics.items()})
                    self.logger.info("eval @%d: %s", step_idx + 1,
                                     eval_metrics)

            if (step_idx + 1) % cfg.save_every == 0:
                save_metrics = {"loss": float(jax.device_get(metrics["loss"]))}
                # pass DEVICE arrays: orbax copies device->host synchronously
                # before its async write, and in multi-process runs each
                # process writes exactly the shards it owns (ZeRO opt state
                # included) — a host device_get here would crash on
                # non-addressable multihost arrays
                self.ckpt.save(step_idx + 1, state, metrics=save_metrics)
        self.ckpt.wait()
        return state

    def evaluate(self, state: TrainState, batches: Iterable[Dict]) -> Dict:
        sums: Dict[str, float] = {}
        n = 0
        for batch in batches:
            metrics = self.eval_fn(state, batch)
            for k, v in metrics.items():
                sums[k] = sums.get(k, 0.0) + float(jax.device_get(v))
            n += 1
        return {k: round(v / max(n, 1), 5) for k, v in sums.items()}
