"""Metric logging: TensorBoard-compatible scalar writer + rank-tagged logs.

Replaces the reference's SummaryWriter/TensorBoardCallback usage
(scripts/run.py:421-439, train_utils.py:249-276).  Uses tensorboard's
pure-python writer when available, falling back to a JSONL event log so the
metric names (loss, lr, grad_norm, speech_token_accuracy, a0..a3_accuracy,
audio_mse) are always recorded.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, Optional

import jax


def get_logger(name: str = "taste") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter(
            f"%(asctime)s [host{jax.process_index()}] %(levelname)s %(message)s"))
        logger.addHandler(h)
        logger.setLevel(logging.INFO)
    return logger


class MetricWriter:
    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter  # type: ignore
            self._tb = SummaryWriter(logdir)
        except Exception:
            pass
        self._jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a")

    def write(self, step: int, metrics: Dict[str, float]):
        metrics = {k: float(v) for k, v in metrics.items()}
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(k, v, step)
        self._jsonl.write(json.dumps({"step": int(step), "time": time.time(),
                                      **metrics}) + "\n")
        self._jsonl.flush()

    def close(self):
        if self._tb is not None:
            self._tb.close()
        self._jsonl.close()
