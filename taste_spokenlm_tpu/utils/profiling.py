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


# ---------------------------------------------------------------------------
# decode roofline accounting (VERDICT r4 #2)
# ---------------------------------------------------------------------------
#
# The AR decode stages are HBM-bandwidth-bound, so MFU is the wrong
# efficiency lens (0.3-0.5% at B=1 is expected, not slack).  The right one
# is bytes READ per generated token vs the chip's HBM bandwidth:
#
#   steps/s (bound) = HBM_BW / bytes_per_step
#   hbm_util        = measured tokens/s * bytes_per_step / HBM_BW
#
# bytes_per_step is computed from the ACTUAL serving param tree (whatever
# mix of bf16 / int8 / packed-int4 leaves it holds), not a formula — the
# quantized layouts change it, and the accounting must follow the layout.

HBM_BW_V5E = 819e9   # bytes/s (TPU v5e peak HBM bandwidth)


def tree_read_bytes(tree) -> int:
    """Total bytes of every array leaf in a param subtree (one full read)."""
    import numpy as np
    leaves = jax.tree_util.tree_leaves(tree)
    return int(sum(leaf.size * np.dtype(leaf.dtype).itemsize
                   for leaf in leaves if hasattr(leaf, "size")))


def _embed_step_bytes(embed_tree) -> int:
    """Per-step bytes of an embedding/tied-head node: the input-side gather
    touches one row (negligible); the LOGITS head reads the full table —
    the nibble-packed int4 copy when present (ops/quantized.QEmbed
    head_mode='int4'), else the int8 copy, else the float table."""
    import numpy as np
    if not isinstance(embed_tree, dict):
        return tree_read_bytes(embed_tree)
    if "head_q4" in embed_tree:
        return tree_read_bytes({k: v for k, v in embed_tree.items()
                                if k in ("head_q4", "head_scale4")})
    if "embedding_q" in embed_tree:
        return tree_read_bytes({k: v for k, v in embed_tree.items()
                                if k in ("embedding_q", "embedding_scale")})
    return tree_read_bytes(embed_tree)


def joint_decode_step_bytes(spoken_lm_params, cfg, ctx_len: int,
                            kv_itemsize: int = 2) -> dict:
    """Bytes read per joint-decode step from the SERVING param tree:
    backbone weights (every projection re-read per token), the lm_head
    table, the taste bridges, and the KV cache at `ctx_len`."""
    lm = dict(spoken_lm_params["language_model"])
    embed = lm.pop("embed_tokens", None)
    weights = tree_read_bytes(lm)
    bridges = tree_read_bytes({k: v for k, v in spoken_lm_params.items()
                               if k != "language_model"})
    head = _embed_step_bytes(embed) if embed is not None else 0
    lc = cfg.spoken_lm.llama
    kv = (2 * lc.num_hidden_layers * lc.num_key_value_heads * lc.head_dim
          * ctx_len * kv_itemsize)
    total = weights + bridges + head + kv
    return {"weights": weights, "head": head, "bridges": bridges,
            "kv": kv, "total": total}


def s3_decode_step_bytes(speech_decoder_params, cfg, ctx_len: int,
                         kv_itemsize: int = 2) -> dict:
    """Bytes read per S3 AR-decode step: the conformer LM stack, the
    logits head, the token embeddings, and the KV cache."""
    sd = dict(speech_decoder_params)
    llm = sd.pop("llm")
    head = tree_read_bytes(sd.pop("llm_decoder"))
    # input-side embeds gather one row each; encoders are prefill-only
    for k in ("audio_token_encoder", "text_encoder", "speech_embedding",
              "llm_embedding", "text_embedding", "spk_embed_affine_layer",
              "audio_embed_affine_layer", "text_encoder_affine_layer",
              "audio_token_encoder_affine_layer", "fuse_weights"):
        sd.pop(k, None)
    weights = tree_read_bytes(llm) + tree_read_bytes(sd)
    lc = cfg.speech_decoder.llm
    dk = lc.output_size // lc.attention_heads
    kv = 2 * lc.num_blocks * lc.attention_heads * dk * ctx_len * kv_itemsize
    total = weights + head + kv
    return {"weights": weights, "head": head, "kv": kv, "total": total}
