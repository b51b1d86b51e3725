"""End-to-end real-data plumbing (reference: taste_speech/data/dataset.py
37-312 + scripts/extract_vq_for_stage2_training.py:17-185).

Synthesizes a tiny TASTE-Dump-schema arrow shard (mp3 audio + json.text +
s3_token + spk_emb) and word-level HF tokenizers entirely offline, then
drives the REAL CLI pipeline end to end:

  arrow shard -> Stage1Dataset buckets -> scripts/train.py --stage 1
  -> scripts/create_seed_model.py -> scripts/extract_vq.py (jsonl)
  -> scripts/train.py --stage 2

Every subprocess runs the actual script on CPU with the shared persistent
compile cache.
"""

import glob
import json
import os
import subprocess
import sys

import numpy as np
import pytest

datasets = pytest.importorskip("datasets")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TEXTS = [
    "the cat sat on the mat",
    "a dog ran over the hill",
    "she sells sea shells by the shore",
    "the quick brown fox jumps high",
    "rain falls softly on the roof",
    "we walk to the old town square",
]
WORDS = sorted({w for t in TEXTS for w in t.split()})


@pytest.fixture(scope="module")
def tokenizer_dir(tmp_path_factory):
    """Word-level HF-fast tokenizer over the fixture vocabulary (ids stay
    inside the tiny configs' vocabs)."""
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    vocab = {"[UNK]": 0}
    for i, w in enumerate(WORDS):
        vocab[w] = i + 1
    tok = Tokenizer(models.WordLevel(vocab, unk_token="[UNK]"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    fast = PreTrainedTokenizerFast(tokenizer_object=tok, unk_token="[UNK]")
    d = tmp_path_factory.mktemp("tok")
    fast.save_pretrained(str(d))
    return str(d)


@pytest.fixture(scope="module")
def arrow_shard(tmp_path_factory):
    """Tiny arrow shard in the TASTE-Dump schema."""
    from taste_spokenlm_tpu.config import TasteConfig
    cfg = TasteConfig.tiny()
    spk_dim = cfg.speech_decoder.spk_embed_dim
    s3_vocab = cfg.speech_decoder.speech_token_size
    rng = np.random.RandomState(0)
    rows = {"mp3": [], "json": [], "s3_token": [], "spk_emb": []}
    for i, text in enumerate(TEXTS):
        dur = 0.8 + 0.2 * (i % 3)
        t = np.arange(int(16000 * dur)) / 16000.0
        wav = (0.1 * np.sin(2 * np.pi * (200 + 40 * i) * t)).astype(np.float32)
        rows["mp3"].append({"array": wav, "sampling_rate": 16000})
        rows["json"].append({"text": text})
        rows["s3_token"].append(
            rng.randint(0, s3_vocab, int(dur * 25)).tolist())
        rows["spk_emb"].append(rng.randn(spk_dim).astype(np.float32).tolist())
    ds = datasets.Dataset.from_dict(rows)
    d = tmp_path_factory.mktemp("shard")
    ds.save_to_disk(str(d))
    files = sorted(glob.glob(os.path.join(str(d), "*.arrow")))
    assert files, os.listdir(str(d))
    return files[0]


def _run(args, cwd=REPO, timeout=540):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    # do not inherit the conftest's 8-device virtual mesh into the CLI
    env.pop("XLA_FLAGS", None)
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(REPO, ".jax_cache"))
    r = subprocess.run([sys.executable] + args, cwd=cwd, env=env,
                       capture_output=True, text=True, timeout=timeout)
    assert r.returncode == 0, f"cmd={args}\nstdout:\n{r.stdout[-3000:]}" \
                              f"\nstderr:\n{r.stderr[-3000:]}"
    return r


def test_stage1_dataset_buckets(arrow_shard, tokenizer_dir):
    """Arrow shard -> Stage1Dataset produces static-shape batches with every
    required key, mel geometry matching the tiny whisper tower."""
    from transformers import AutoTokenizer
    from taste_spokenlm_tpu.config import TasteConfig
    from taste_spokenlm_tpu.data.dataset import Stage1Dataset
    from taste_spokenlm_tpu.frontend.processor import TasteProcessor

    cfg = TasteConfig.tiny()
    tok = AutoTokenizer.from_pretrained(tokenizer_dir)
    proc = TasteProcessor(asr_tokenizer=tok, llm_tokenizer=tok)
    ds = Stage1Dataset(
        [arrow_shard], tokenize_fn=lambda text: proc.process_text(text=text),
        n_mels=cfg.audio_tower.whisper.n_mels,
        mel_frames=2 * cfg.audio_tower.whisper.max_source_positions)
    batches = list(ds.batches(epoch=0))
    assert batches, "no batches emitted"
    seen = 0
    for b in batches:
        assert b["audio_features"].shape[1:] == (
            cfg.audio_tower.whisper.n_mels,
            2 * cfg.audio_tower.whisper.max_source_positions)
        for k in ("speaker_embeds", "asr_token_ids", "asr_token_lengths",
                  "asr_word_ids", "llm_token_ids", "llm_token_lengths",
                  "llm_word_ids", "speech_token_ids", "speech_token_lengths"):
            assert k in b, k
        assert (b["asr_token_ids"] < cfg.audio_tower.whisper.vocab_size).all()
        assert (b["llm_token_ids"] < cfg.spoken_lm.llama.vocab_size).all()
        seen += b["asr_token_ids"].shape[0]
    assert seen == len(TEXTS)


def test_cli_pipeline_stage1_extract_stage2(arrow_shard, tokenizer_dir,
                                            tmp_path):
    """The full CLI recipe on real (synthesized) data."""
    w1 = tmp_path / "stage1"
    _run(["scripts/train.py", "--platform", "cpu", "--tiny", "--stage", "1",
          "--data", arrow_shard, "--asr-tokenizer", tokenizer_dir,
          "--llm-tokenizer", tokenizer_dir, "--steps", "2",
          "--token-budget", "256", "--log-every", "1", "--save-every", "2",
          "--warmup", "1", "--workdir", str(w1)])

    seed = tmp_path / "seed"
    _run(["scripts/create_seed_model.py", "--platform", "cpu", "--tiny",
          "--output", str(seed)])

    vq_out = tmp_path / "vq"
    _run(["scripts/extract_vq.py", "--platform", "cpu",
          "--seed-model", str(seed), "--output", str(vq_out),
          "--data", arrow_shard, "--asr-tokenizer", tokenizer_dir,
          "--llm-tokenizer", tokenizer_dir, "--token-budget", "256",
          "--num-batches", "0"])
    shards = sorted(glob.glob(str(vq_out / "*.jsonl")))
    assert shards
    rows = [json.loads(l) for l in open(shards[0]) if l.strip()]
    assert len(rows) == len(TEXTS)
    for r in rows:
        t = len(r["llm_token_ids"])
        assert len(r["llm_word_ids"]) == t
        assert len(r["llm_indices"]) == t
        # word starts hold taste ids, continuations hold -1
        starts = [i for i, w in enumerate(r["llm_word_ids"])
                  if i == 0 or w != r["llm_word_ids"][i - 1]]
        for i in range(t):
            if i in starts:
                assert all(x >= 0 for x in r["llm_indices"][i])
            else:
                assert all(x == -1 for x in r["llm_indices"][i])

    w2 = tmp_path / "stage2"
    _run(["scripts/train.py", "--platform", "cpu", "--tiny", "--stage", "2",
          "--stage2-data", shards[0], "--steps", "2", "--token-budget", "96",
          "--log-every", "1", "--save-every", "2", "--warmup", "1",
          "--workdir", str(w2)])

def test_preemption_resume_drill(tmp_path):
    """Fault-tolerance drill: a killed-and-relaunched run resumes from the
    latest checkpoint instead of step 0 (trainer.maybe_resume + orbax
    CheckpointManager — the reference relies on HF Trainer auto-resume)."""
    w = tmp_path / "work"
    base = ["scripts/train.py", "--platform", "cpu", "--tiny", "--synthetic",
            "--stage", "1", "--batch-size", "2", "--save-every", "1",
            "--log-every", "1", "--warmup", "1", "--workdir", str(w)]
    _run(base + ["--steps", "2"])   # "preempted" after step 2
    ckpts = sorted(p.name for p in (w / "ckpt").iterdir() if p.is_dir())
    assert "2" in ckpts, ckpts

    r = _run(base + ["--steps", "4"])  # relaunch: must resume, not restart
    out = r.stdout + r.stderr
    assert "resuming from step 2" in out, out[-2000:]
    ckpts = sorted(int(p.name) for p in (w / "ckpt").iterdir()
                   if p.is_dir() and p.name.isdigit())
    assert max(ckpts) == 4, ckpts
