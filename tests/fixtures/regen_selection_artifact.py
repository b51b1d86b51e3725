#!/usr/bin/env python
"""Regenerate tests/fixtures/selection_tiny_real.json — the committed
selection-protocol eval artifact (prepare_baseline_data -> eval.py
--selection-data round trip; reference analog:
STAGE1_TRAIN/SpokenLM/scripts/prepare_baseline_data.py +
eval_taslm_loglikelihood.py).

Run from the repo root:

  python tests/fixtures/regen_selection_artifact.py
"""

import glob
import json
import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from test_integration_real_data import TEXTS, WORDS  # noqa: E402


def main():
    import datasets
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast
    from taste_spokenlm_tpu.config import TasteConfig

    tmp = tempfile.mkdtemp(prefix="selection_artifact_")

    vocab = {"[UNK]": 0}
    for i, w in enumerate(WORDS):
        vocab[w] = i + 1
    tok = Tokenizer(models.WordLevel(vocab, unk_token="[UNK]"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    fast = PreTrainedTokenizerFast(tokenizer_object=tok, unk_token="[UNK]")
    tok_dir = os.path.join(tmp, "tok")
    fast.save_pretrained(tok_dir)

    cfg = TasteConfig.tiny()
    rng = np.random.RandomState(0)
    rows = {"mp3": [], "json": [], "s3_token": [], "spk_emb": []}
    for i, text in enumerate(TEXTS):
        dur = 0.8 + 0.2 * (i % 3)
        t = np.arange(int(16000 * dur)) / 16000.0
        wav = (0.1 * np.sin(2 * np.pi * (200 + 40 * i) * t)).astype(np.float32)
        rows["mp3"].append({"array": wav, "sampling_rate": 16000})
        rows["json"].append({"text": text})
        rows["s3_token"].append(rng.randint(
            0, cfg.speech_decoder.speech_token_size, int(dur * 25)).tolist())
        rows["spk_emb"].append(rng.randn(
            cfg.speech_decoder.spk_embed_dim).astype(np.float32).tolist())
    shard_dir = os.path.join(tmp, "shard")
    datasets.Dataset.from_dict(rows).save_to_disk(shard_dir)
    shard = sorted(glob.glob(os.path.join(shard_dir, "*.arrow")))[0]

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env.pop("XLA_FLAGS", None)
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(REPO, ".jax_cache"))
    sel = os.path.join(tmp, "selection.jsonl")
    subprocess.run([sys.executable, "scripts/prepare_baseline_data.py",
                    "--data", shard, "--llm-tokenizer", tok_dir,
                    "--output-dir", os.path.join(tmp, "baseline"),
                    "--layout", "parallel", "--selection-out", sel],
                   cwd=REPO, env=env, check=True)
    seed = os.path.join(tmp, "seed")
    subprocess.run([sys.executable, "scripts/create_seed_model.py",
                    "--platform", "cpu", "--tiny", "--output", seed],
                   cwd=REPO, env=env, check=True)
    out = os.path.join(tmp, "eval.json")
    subprocess.run([sys.executable, "scripts/eval.py", "--platform", "cpu",
                    "--seed-model", seed, "--synthetic",
                    "--num-batches", "1", "--batch-size", "2",
                    "--selection-data", sel, "--output", out],
                   cwd=REPO, env=env, check=True)
    metrics = json.load(open(out))
    artifact = {
        "provenance": "tests/fixtures/regen_selection_artifact.py: tiny "
                      "seed model, 6-utterance synthesized TASTE-Dump "
                      "shard -> prepare_baseline_data --selection-out -> "
                      "eval.py --selection-data (choose-the-real-"
                      "continuation accuracy)",
        "metrics": {k: v for k, v in metrics.items()
                    if k.startswith("selection")},
    }
    dst = os.path.join(REPO, "tests", "fixtures", "selection_tiny_real.json")
    with open(dst, "w") as f:
        json.dump(artifact, f, indent=2)
        f.write("\n")
    print("wrote", dst)
    print(json.dumps(metrics, indent=2))


if __name__ == "__main__":
    main()
