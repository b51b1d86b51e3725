#!/usr/bin/env python
"""Evaluation CLI: teacher-forcing accuracy + reconstruction metrics.

Covers the reference eval surfaces: TasteEvalTrainer metrics
(speech_token_accuracy / text_accuracy / a0..a3_accuracy,
scripts/run.py:68-155 -> eval.json), bin/eval_audio.py seeded
reconstruction with teacher forcing, and taslm log-likelihood scoring
(SpokenLM/scripts/eval_taslm_loglikelihood.py).  The
`--use-target-speech-token` s3-topline ablation lives in
scripts/generate_audio.py (it generates audio, not metrics).

Usage (synthetic smoke):
  python scripts/eval.py --seed-model ./seed --synthetic --output eval.json
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
    p.add_argument("--output", default="eval.json")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--num-batches", type=int, default=2)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--data", nargs="*", default=[],
                   help="stage-1 arrow shard files (globs ok)")
    p.add_argument("--asr-tokenizer", default=None)
    p.add_argument("--llm-tokenizer", default=None)
    p.add_argument("--token-budget", type=int, default=2048)
    p.add_argument("--selection-data", default=None,
                   help="selection-pair jsonl from "
                        "scripts/prepare_baseline_data.py --selection-out: "
                        "score real vs distractor continuations with the "
                        "spoken LM and report choose-the-real accuracy "
                        "(the reference calculate_log_likelihood protocol, "
                        "taslm/modeling_taslm.py:324-377, closed into a "
                        "round-trip metric)")
    p.add_argument("--platform", default=None,
                   help="cpu | tpu | default (sitecustomize-proof)")
    args = p.parse_args()

    from taste_spokenlm_tpu.utils.platform import force_platform
    force_platform(args.platform)

    import jax
    import jax.numpy as jnp
    from taste_spokenlm_tpu.models.taste import TasteForCausalLM
    from taste_spokenlm_tpu.ops.losses import (masked_accuracy,
                                               masked_log_likelihood)
    from taste_spokenlm_tpu.pretrained import from_pretrained
    from taste_spokenlm_tpu.train.train_step import eval_metrics_stage2

    model, variables, _ = from_pretrained(args.seed_model)
    cfg = model.config

    rng = np.random.RandomState(args.seed)
    t_tok, t_sp = 8, 12

    @jax.jit
    def eval_stage1(variables, batch):
        out = model.apply(
            variables, batch["speaker_embeds"], batch["asr_token_ids"],
            batch["asr_token_lengths"], batch["asr_word_ids"],
            batch["audio_features"], batch["speech_token_ids"],
            batch["speech_token_lengths"],
            method=TasteForCausalLM.forward_speech_autoencoder)
        return {"speech_token_accuracy": out["speech_token_accuracy"],
                "loss": out["loss"]}

    @jax.jit
    def eval_stage2(variables, batch):
        _, llm_idx = model.apply(
            variables, batch["asr_token_ids"], batch["asr_token_lengths"],
            batch["asr_word_ids"], batch["llm_token_ids"],
            batch["llm_token_lengths"], batch["llm_word_ids"],
            batch["audio_features"], method=TasteForCausalLM.extract_vq)
        out = model.apply(
            variables, llm_idx, batch["llm_token_ids"],
            batch["llm_token_lengths"], batch["llm_word_ids"],
            method=TasteForCausalLM.forward_spoken_llm)
        m = eval_metrics_stage2(out, cfg.audio_tower.quantizer.num_quantizers)
        # the reference per-utterance selection protocol
        # (taslm/modeling_taslm.py:324-352): mean log p over valid labels,
        # plus the flipped-labels control score
        ll, rll = masked_log_likelihood(out["text_logits"],
                                        out["text_labels"])
        m["loglikelihood"] = ll
        m["reversed_loglikelihood"] = rll
        return m

    def real_batches():
        """One epoch of bucketed stage-1 eval batches (same pipeline as
        scripts/train.py; the reference's bin/eval_audio.py tsv loop)."""
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
            seed=args.seed, token_budget=args.token_budget,
            n_mels=cfg.audio_tower.whisper.n_mels,
            mel_frames=2 * cfg.audio_tower.whisper.max_source_positions)
        for b in itertools.islice(ds.batches(epoch=0),
                                  args.num_batches or None):
            yield {k: jnp.asarray(v) for k, v in b.items()}

    def synthetic_batches():
        for _ in range(args.num_batches):
            yield synthetic_batch()

    def synthetic_batch():
        return {
            "speaker_embeds": jnp.asarray(rng.randn(
                args.batch_size, cfg.speech_decoder.spk_embed_dim), jnp.float32),
            "asr_token_ids": jnp.asarray(rng.randint(
                5, cfg.audio_tower.whisper.vocab_size,
                (args.batch_size, t_tok))),
            "asr_token_lengths": jnp.full((args.batch_size,), t_tok, jnp.int32),
            "asr_word_ids": jnp.asarray(np.tile(
                (np.arange(t_tok) // 2)[None], (args.batch_size, 1))),
            "audio_features": jnp.asarray(rng.randn(
                args.batch_size, cfg.audio_tower.whisper.n_mels,
                cfg.audio_tower.whisper.max_source_positions * 2), jnp.float32),
            "speech_token_ids": jnp.asarray(rng.randint(
                0, cfg.speech_decoder.speech_token_size,
                (args.batch_size, t_sp))),
            "speech_token_lengths": jnp.full((args.batch_size,), t_sp, jnp.int32),
            "llm_token_ids": jnp.asarray(rng.randint(
                2, cfg.spoken_lm.llama.vocab_size, (args.batch_size, t_tok))),
            "llm_token_lengths": jnp.full((args.batch_size,), t_tok, jnp.int32),
            "llm_word_ids": jnp.asarray(np.tile(
                (np.arange(t_tok) // 2)[None], (args.batch_size, 1))),
        }

    def selection_eval(path):
        """Per-pair: mean log p per CONTINUATION token (empty taste channel)
        for the real and the distractor continuation; accuracy = fraction
        where the real one scores higher."""
        import functools
        pairs = [json.loads(line) for line in open(path) if line.strip()]
        L = cfg.audio_tower.quantizer.num_quantizers
        slot = 16
        lens = [len(p["prefix"]) + max(len(p["real"]), len(p["distractor"]))
                for p in pairs]
        T = -(-max(lens) // slot) * slot   # one static bucket for all pairs

        @functools.partial(jax.jit, static_argnames=())
        def fwd(ids, n):
            idx = jnp.full((1, T, L), -1, jnp.int32)
            out = model.apply(
                variables, idx, ids[None], jnp.asarray([n], jnp.int32),
                jnp.arange(T, dtype=jnp.int32)[None],
                method=TasteForCausalLM.forward_spoken_llm)
            return out["text_logits"], out["text_labels"]

        def cont_ll(prefix, cont):
            ids = np.zeros((T,), np.int32)
            seq = (prefix + cont)[:T]
            ids[:len(seq)] = seq
            logits, labels = fwd(jnp.asarray(ids), len(seq))
            logits = np.asarray(logits, np.float32)[0]
            labels = np.asarray(labels)[0]
            lse = logits.max(-1) + np.log(
                np.exp(logits - logits.max(-1, keepdims=True)).sum(-1))
            valid = np.flatnonzero(labels != -1)
            # continuation tokens are the LAST len(cont) valid label slots
            keep = valid[-min(len(cont), len(valid)):]
            lp = logits[keep, labels[keep]] - lse[keep]
            return float(lp.mean())

        n_correct, ll_r, ll_d = 0, [], []
        for pr in pairs:
            a = cont_ll(pr["prefix"], pr["real"])
            b = cont_ll(pr["prefix"], pr["distractor"])
            n_correct += a > b
            ll_r.append(a)
            ll_d.append(b)
        return {"selection_accuracy": round(n_correct / max(len(pairs), 1), 5),
                "selection_pairs": len(pairs),
                "selection_ll_real": round(float(np.mean(ll_r)), 5),
                "selection_ll_distractor": round(float(np.mean(ll_d)), 5)}

    sums, n = {}, 0
    batches = synthetic_batches() if args.synthetic else real_batches()
    for batch in batches:
        for fn in (eval_stage1, eval_stage2):
            for k, v in fn(variables, batch).items():
                sums[k] = sums.get(k, 0.0) + float(v)
        n += 1

    metrics = {k: round(v / n, 5) for k, v in sums.items()}
    if args.selection_data:
        metrics.update(selection_eval(args.selection_data))
    with open(args.output, "w") as f:
        json.dump(metrics, f, indent=2)
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
