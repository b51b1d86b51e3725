"""One-line checkpoint loading — the reference's `from_pretrained`
ergonomics (/root/reference/taste_speech/__init__.py:21-23 registers
TasteConfig/TasteForCausalLM/TasteProcessor for HF Auto* loading;
README.md:35-55 quick start).

A checkpoint directory is what scripts/create_seed_model.py and
scripts/convert_checkpoint.py write:

    <dir>/config.json   TasteConfig.to_json
    <dir>/params        orbax tree {"params": ..., "quantizer": ...}

`from_pretrained` returns the ready triple (model, variables, processor);
pair with `TasteForCausalLM.inference_reconstruction`,
`frontend.api.CompletionPipeline`, or `serving.server.TasteEngine`.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple


def load_config(checkpoint_dir: str):
    from taste_spokenlm_tpu.config import TasteConfig
    with open(os.path.join(checkpoint_dir, "config.json")) as f:
        return TasteConfig.from_dict(json.load(f))


def from_pretrained(
    checkpoint_dir: str,
    *,
    dtype: Any = None,
    config_overrides: Optional[Dict] = None,
    llm_tokenizer: Any = None,
    asr_tokenizer: Any = None,
    speaker_embedder: Any = None,
    s3_tokenizer: Any = None,
    transcriber: Any = None,
) -> Tuple[Any, Any, Any]:
    """Load a converted/seed checkpoint dir -> (model, variables, processor).

    Tokenizers/hooks are pluggable (this image is egress-blocked, so HF
    tokenizer assets must be provided by the caller when available);
    the processor still handles all signal processing without them.
    """
    import jax.numpy as jnp
    from taste_spokenlm_tpu.frontend.processor import TasteProcessor
    from taste_spokenlm_tpu.models.taste import TasteForCausalLM
    from taste_spokenlm_tpu.utils.checkpoint import load_params

    cfg = load_config(checkpoint_dir)
    if config_overrides:
        cfg = cfg.replace(**config_overrides)
    model = TasteForCausalLM(cfg, dtype=dtype if dtype is not None
                             else jnp.float32)
    variables = load_params(os.path.join(checkpoint_dir, "params"))
    processor = TasteProcessor(
        asr_tokenizer=asr_tokenizer, llm_tokenizer=llm_tokenizer,
        speaker_embedder=speaker_embedder, s3_tokenizer=s3_tokenizer,
        transcriber=transcriber, frontend=cfg.frontend)
    return model, variables, processor
