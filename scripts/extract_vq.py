#!/usr/bin/env python
"""Stage-2 data prep: extract llm-aligned taste indices for a dataset.

Equivalent of /root/reference/scripts/extract_vq_for_stage2_training.py:17-185
(which abuses HF Trainer.prediction_step under accelerate and saves
`part-{rank}` HF datasets).  Here: jitted batched extract_vq over the
("data","model") mesh, one output shard per host.

Usage (synthetic smoke):
  python scripts/extract_vq.py --seed-model ./seed --synthetic \
      --num-batches 2 --output ./vq_out
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seed-model", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--num-batches", type=int, default=2)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--platform", default=None,
                   help="cpu | tpu | default (sitecustomize-proof)")
    args = p.parse_args()

    from taste_spokenlm_tpu.utils.platform import force_platform
    force_platform(args.platform)

    import jax
    import jax.numpy as jnp
    from taste_spokenlm_tpu.config import TasteConfig
    from taste_spokenlm_tpu.models.taste import TasteForCausalLM
    from taste_spokenlm_tpu.utils.checkpoint import load_params

    cfg = TasteConfig.from_dict(
        json.load(open(os.path.join(args.seed_model, "config.json"))))
    model = TasteForCausalLM(cfg)
    variables = load_params(os.path.join(args.seed_model, "params"))

    @jax.jit
    def extract(variables, batch):
        return model.apply(
            variables, batch["asr_token_ids"], batch["asr_token_lengths"],
            batch["asr_word_ids"], batch["llm_token_ids"],
            batch["llm_token_lengths"], batch["llm_word_ids"],
            batch["audio_features"], method=TasteForCausalLM.extract_vq)

    if not args.synthetic:
        raise NotImplementedError(
            "arrow input requires tokenizer assets; wire Stage1Dataset here")

    rng = np.random.RandomState(jax.process_index())
    t_tok = 8
    os.makedirs(args.output, exist_ok=True)
    out_rows = []
    for i in range(args.num_batches):
        batch = {
            "asr_token_ids": jnp.asarray(rng.randint(
                5, cfg.audio_tower.whisper.vocab_size,
                (args.batch_size, t_tok))),
            "asr_token_lengths": jnp.full((args.batch_size,), t_tok, jnp.int32),
            "asr_word_ids": jnp.asarray(
                np.tile((np.arange(t_tok) // 2)[None], (args.batch_size, 1))),
            "llm_token_ids": jnp.asarray(rng.randint(
                2, cfg.spoken_lm.llama.vocab_size, (args.batch_size, t_tok))),
            "llm_token_lengths": jnp.full((args.batch_size,), t_tok, jnp.int32),
            "llm_word_ids": jnp.asarray(
                np.tile((np.arange(t_tok) // 2)[None], (args.batch_size, 1))),
            "audio_features": jnp.asarray(rng.randn(
                args.batch_size, cfg.audio_tower.whisper.n_mels,
                cfg.audio_tower.whisper.max_source_positions * 2), jnp.float32),
        }
        asr_idx, llm_idx = extract(variables, batch)
        for bi in range(args.batch_size):
            out_rows.append({
                "asr_indices": np.asarray(asr_idx[bi]).tolist(),
                "llm_indices": np.asarray(llm_idx[bi]).tolist(),
            })

    shard = os.path.join(args.output, f"part-{jax.process_index()}.jsonl")
    with open(shard, "w") as f:
        for row in out_rows:
            f.write(json.dumps(row) + "\n")
    print(f"wrote {len(out_rows)} rows to {shard}")


if __name__ == "__main__":
    main()
