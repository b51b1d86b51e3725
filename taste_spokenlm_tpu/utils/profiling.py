"""Tracing / profiling: jax.profiler hooks + per-stage RTF counters.

The reference's observability is wall-clock prints around llm/flow/hift
(STAGE1_TRAIN/CosyVoice/cosyvoice/cli/model.py:53-90) — here tracing is
first-class (SURVEY.md §5): annotated profiler traces viewable in
TensorBoard/Perfetto and a structured RTF report.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import Dict, Iterator, Optional

import jax


@dataclass
class StageTimer:
    """Accumulates wall time per named stage; reports RTF vs audio seconds."""

    stages: Dict[str, float] = field(default_factory=dict)
    counts: Dict[str, int] = field(default_factory=dict)

    @contextlib.contextmanager
    def stage(self, name: str, block_on=None) -> Iterator[None]:
        with jax.profiler.TraceAnnotation(name):
            t0 = time.perf_counter()
            yield
            if block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
        self.stages[name] = self.stages.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def report(self, audio_seconds: Optional[float] = None) -> Dict:
        total = sum(self.stages.values())
        out = {"total_s": round(total, 4),
               "stages": {k: round(v, 4) for k, v in self.stages.items()}}
        if audio_seconds:
            out["audio_s"] = round(audio_seconds, 3)
            out["rtf"] = round(total / audio_seconds, 4)
            out["stage_rtf"] = {k: round(v / audio_seconds, 4)
                                for k, v in self.stages.items()}
        return out

    def dump(self, path: str, audio_seconds: Optional[float] = None):
        with open(path, "w") as f:
            json.dump(self.report(audio_seconds), f, indent=2)


@contextlib.contextmanager
def profiler_trace(logdir: Optional[str]):
    """Capture a jax profiler trace (TensorBoard `Profile` tab / Perfetto)."""
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
