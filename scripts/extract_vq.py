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
    p.add_argument("--data", nargs="*", default=[],
                   help="stage-1 arrow shard files (globs ok)")
    p.add_argument("--asr-tokenizer", default=None)
    p.add_argument("--llm-tokenizer", default=None)
    p.add_argument("--token-budget", type=int, default=2048)
    p.add_argument("--platform", default=None,
                   help="cpu | tpu | default (sitecustomize-proof)")
    args = p.parse_args()

    from taste_spokenlm_tpu.utils.platform import force_platform
    force_platform(args.platform)

    import jax
    import jax.numpy as jnp
    from taste_spokenlm_tpu.models.taste import TasteForCausalLM
    from taste_spokenlm_tpu.pretrained import from_pretrained

    model, variables, _ = from_pretrained(args.seed_model)
    cfg = model.config

    @jax.jit
    def extract(variables, batch):
        return model.apply(
            variables, batch["asr_token_ids"], batch["asr_token_lengths"],
            batch["asr_word_ids"], batch["llm_token_ids"],
            batch["llm_token_lengths"], batch["llm_word_ids"],
            batch["audio_features"], method=TasteForCausalLM.extract_vq)

    if args.synthetic:
        def batch_iter():
            rng = np.random.RandomState(jax.process_index())
            t_tok = 8
            for _ in range(args.num_batches):
                yield {
                    "asr_token_ids": rng.randint(
                        5, cfg.audio_tower.whisper.vocab_size,
                        (args.batch_size, t_tok)).astype("i4"),
                    "asr_token_lengths": np.full((args.batch_size,), t_tok, "i4"),
                    "asr_word_ids": np.tile(
                        (np.arange(t_tok) // 2)[None],
                        (args.batch_size, 1)).astype("i4"),
                    "llm_token_ids": rng.randint(
                        2, cfg.spoken_lm.llama.vocab_size,
                        (args.batch_size, t_tok)).astype("i4"),
                    "llm_token_lengths": np.full((args.batch_size,), t_tok, "i4"),
                    "llm_word_ids": np.tile(
                        (np.arange(t_tok) // 2)[None],
                        (args.batch_size, 1)).astype("i4"),
                    "audio_features": rng.randn(
                        args.batch_size, cfg.audio_tower.whisper.n_mels,
                        cfg.audio_tower.whisper.max_source_positions * 2
                    ).astype("f4"),
                }
    else:
        # real data: one epoch over the same arrow shards + bucketing as
        # stage-1 training (num-batches 0 = the whole shard set)
        import glob as globlib
        import itertools
        from transformers import AutoTokenizer
        from taste_spokenlm_tpu.data.dataset import Stage1Dataset
        from taste_spokenlm_tpu.frontend.processor import TasteProcessor
        if not (args.data and args.asr_tokenizer and args.llm_tokenizer):
            raise SystemExit("--data/--asr-tokenizer/--llm-tokenizer are "
                             "required without --synthetic")
        files = [f for pat in args.data
                 for f in (sorted(globlib.glob(pat)) or [pat])]
        proc = TasteProcessor(
            asr_tokenizer=AutoTokenizer.from_pretrained(args.asr_tokenizer),
            llm_tokenizer=AutoTokenizer.from_pretrained(args.llm_tokenizer))
        ds = Stage1Dataset(
            files, tokenize_fn=lambda text: proc.process_text(text=text),
            host_index=jax.process_index(), host_count=jax.process_count(),
            token_budget=args.token_budget,
            n_mels=cfg.audio_tower.whisper.n_mels,
            mel_frames=2 * cfg.audio_tower.whisper.max_source_positions)

        def batch_iter():
            yield from itertools.islice(ds.batches(epoch=0),
                                        args.num_batches or None)

    os.makedirs(args.output, exist_ok=True)
    out_rows = []
    for batch in batch_iter():
        batch = {k: jnp.asarray(v) for k, v in batch.items()
                 if k in ("asr_token_ids", "asr_token_lengths", "asr_word_ids",
                          "llm_token_ids", "llm_token_lengths", "llm_word_ids",
                          "audio_features")}
        asr_idx, llm_idx = extract(variables, batch)
        lens = np.asarray(batch["llm_token_lengths"])
        ids = np.asarray(batch["llm_token_ids"])
        words = np.asarray(batch["llm_word_ids"])
        for bi in range(ids.shape[0]):
            n = int(lens[bi])
            out_rows.append({
                "asr_indices": np.asarray(asr_idx[bi]).tolist(),
                "llm_indices": np.asarray(llm_idx[bi])[:n].tolist(),
                "llm_token_ids": ids[bi, :n].tolist(),
                "llm_word_ids": words[bi, :n].tolist(),
            })

    shard = os.path.join(args.output, f"part-{jax.process_index()}.jsonl")
    with open(shard, "w") as f:
        for row in out_rows:
            f.write(json.dumps(row) + "\n")
    print(f"wrote {len(out_rows)} rows to {shard}")


if __name__ == "__main__":
    main()
