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

# every test here drives real CLI subprocesses end to end (minutes each
# on a cold compile cache) — the fast tier deselects with -m "not slow"
pytestmark = pytest.mark.slow

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

def test_cli_eval_real_data_artifact(arrow_shard, tokenizer_dir, seed_model,
                                     tmp_path):
    """scripts/eval.py end-to-end on the real-data path, regression-anchored
    to the committed artifact tests/fixtures/eval_tiny_real.json (the
    reference commits eval.json outputs, scripts/run.py:503-506): same
    metric keys, values finite and in-protocol ranges."""
    out = tmp_path / "eval.json"
    _run(["scripts/eval.py", "--platform", "cpu", "--seed-model", seed_model,
          "--data", arrow_shard, "--asr-tokenizer", tokenizer_dir,
          "--llm-tokenizer", tokenizer_dir, "--num-batches", "0",
          "--token-budget", "256", "--output", str(out)])
    metrics = json.load(open(out))
    anchor = json.load(open(os.path.join(REPO, "tests", "fixtures",
                                         "eval_tiny_real.json")))
    assert set(metrics) == set(anchor["metrics"]), (
        set(metrics) ^ set(anchor["metrics"]))
    for k, v in metrics.items():
        assert np.isfinite(v), (k, v)
    assert metrics["loss"] > 0
    for k in ("speech_token_accuracy", "text_accuracy", "a0_accuracy",
              "a1_accuracy", "a2_accuracy", "a3_accuracy"):
        assert 0.0 <= metrics[k] <= 1.0, (k, metrics[k])
    # selection-protocol scores: log-likelihoods are negative; a random-init
    # model has no order preference, so |forward - reversed| stays small
    assert metrics["loglikelihood"] < 0
    assert metrics["reversed_loglikelihood"] < 0


def test_cli_flow_training_real_data(arrow_shard, tmp_path):
    """Flow-matching trainer on real (synthesized) arrow shards: audio ->
    22.05 kHz resample -> CosyVoice mel targets, s3 tokens, x-vectors
    (scripts/train.py --model flow; reference trains flow through
    cosyvoice/bin/train.py:87-151)."""
    w = tmp_path / "flow"
    r = _run(["scripts/train.py", "--platform", "cpu", "--tiny",
              "--model", "flow", "--data", arrow_shard, "--steps", "2",
              "--token-budget", "64", "--log-every", "1", "--save-every", "2",
              "--warmup", "1", "--workdir", str(w)])
    assert "loss" in (r.stdout + r.stderr)
    assert (w / "ckpt" / "2").is_dir()


@pytest.fixture(scope="module")
def input_wav(tmp_path_factory):
    """Real wav on disk: 1.2 s of a two-tone chirp at 24 kHz (the CLI must
    resample to the frontend's 16 kHz)."""
    import wave as wave_mod
    d = tmp_path_factory.mktemp("wavs")
    path = str(d / "utt0.wav")
    sr = 24000
    t = np.arange(int(sr * 1.2)) / sr
    wav = 0.3 * np.sin(2 * np.pi * 220.0 * t) \
        + 0.2 * np.sin(2 * np.pi * (440.0 + 80.0 * t) * t)
    pcm = (np.clip(wav, -1, 1) * 32767.0).astype("<i2")
    with wave_mod.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(pcm.tobytes())
    return path


@pytest.fixture(scope="module")
def campplus_onnx(tmp_path_factory):
    """CAM++-shaped speaker-embedding graph ([B,T,80] fbank -> x-vector),
    written with the repo's own protobuf writer and run by the JAX ONNX
    executor — the same machinery real campplus.onnx weights would use."""
    from taste_spokenlm_tpu.config import TasteConfig
    from taste_spokenlm_tpu.frontend import onnx_build as B
    spk = TasteConfig.tiny().speech_decoder.spk_embed_dim
    rng = np.random.RandomState(7)
    w = (rng.randn(80, spk) * 0.1).astype(np.float32)
    nodes = [
        B.node("ReduceMean", ["feats"], ["pooled"], axes=[1], keepdims=0),
        B.node("MatMul", ["pooled", "w"], ["xvector"]),
    ]
    blob = B.build(nodes, ["feats"], ["xvector"], {"w": w})
    d = tmp_path_factory.mktemp("onnx")
    path = str(d / "campplus.onnx")
    with open(path, "wb") as f:
        f.write(blob)
    return path


@pytest.fixture(scope="module")
def seed_model(tmp_path_factory):
    d = tmp_path_factory.mktemp("seed") / "model"
    _run(["scripts/create_seed_model.py", "--platform", "cpu", "--tiny",
          "--output", str(d)])
    return str(d)


GEN_FAST = ["--max-speech-steps", "12", "--mel-len-max", "32",
            "--max-decode-steps", "12", "--extra-words", "2"]


def test_cli_wav_to_wav_reconstruction(input_wav, campplus_onnx, seed_model,
                                       tokenizer_dir, tmp_path):
    """The flagship journey, task 1: real wav in -> processor (resample,
    128-mel, CAM++ x-vector via ONNX-exec, forced text, dual tokenization)
    -> SpeechAutoEncoder reconstruction -> wav + meta JSON out
    (reference scripts/generate_audio.py:85-130)."""
    out = tmp_path / "gen_recon"
    _run(["scripts/generate_audio.py", "--platform", "cpu",
          "--seed-model", seed_model, "--task", "reconstruction",
          "--input-wav", input_wav, "--campplus-onnx", campplus_onnx,
          "--asr-tokenizer", tokenizer_dir, "--llm-tokenizer", tokenizer_dir,
          "--text", "the cat sat on the mat",
          "--output-dir", str(out)] + GEN_FAST)
    import wave as wave_mod
    wavs = sorted(glob.glob(str(out / "*.wav")))
    metas = sorted(glob.glob(str(out / "*.json")))
    assert len(wavs) == 1 and len(metas) == 1
    meta = json.load(open(metas[0]))
    assert meta["orig_text"] == "the cat sat on the mat"
    assert meta["samples"] > 0
    assert meta["input_wav"] == input_wav
    with wave_mod.open(wavs[0], "rb") as f:
        assert f.getnframes() == meta["samples"]
        assert f.getframerate() == meta["sample_rate"]


@pytest.mark.parametrize("mode", ["audio", "instruct"])
def test_cli_wav_to_wav_completion(input_wav, campplus_onnx, seed_model,
                                   tokenizer_dir, tmp_path, mode):
    """The flagship journey, task 2: real wav in -> processor with WHISPER
    ASR TRANSCRIPTION (no forced text; the transcriber shares the seed
    model's tower weights) -> extract_vq -> CompletionPipeline (joint
    decode, tokenizer round trip, synthesis) -> wav + meta JSON.
    `instruct` wraps the audio prefix in chat-template ids built from the
    llm tokenizer (frontend.api.build_instruct_ids)."""
    out = tmp_path / f"gen_compl_{mode}"
    _run(["scripts/generate_audio.py", "--platform", "cpu",
          "--seed-model", seed_model, "--task", "completion",
          "--conditional-mode", mode,
          "--input-wav", input_wav, "--campplus-onnx", campplus_onnx,
          "--asr-tokenizer", tokenizer_dir, "--llm-tokenizer", tokenizer_dir,
          "--output-dir", str(out)] + GEN_FAST)
    wavs = sorted(glob.glob(str(out / "*.wav")))
    metas = sorted(glob.glob(str(out / "*.json")))
    assert len(wavs) == 1 and len(metas) == 1
    meta = json.load(open(metas[0]))
    assert "generated_text" in meta
    assert "orig_text" in meta          # the ASR transcript
    assert meta["conditional_mode"] == mode
    assert meta["samples"] > 0
    assert meta["speech_tokens"] > 0


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


def test_cli_baseline_data_and_selection_roundtrip(arrow_shard, tokenizer_dir,
                                                   seed_model, tmp_path):
    """prepare_baseline_data -> eval.py --selection-data round trip
    (VERDICT r4 missing-#2; reference
    STAGE1_TRAIN/SpokenLM/scripts/prepare_baseline_data.py:1-134 +
    eval_taslm_loglikelihood.py:24-60): every stream layout is emitted from
    the arrow shard, and the selection set drives choose-the-real-
    continuation scoring end-to-end.  Regression-anchored to the committed
    artifact tests/fixtures/selection_tiny_real.json."""
    out_dir = tmp_path / "baseline"
    sel = tmp_path / "selection.jsonl"
    text_vocab = 512
    for layout in ("parallel", "padding", "sentence_interleave",
                   "word_interleave"):
        _run(["scripts/prepare_baseline_data.py", "--data", arrow_shard,
              "--llm-tokenizer", tokenizer_dir, "--output-dir",
              str(out_dir / layout), "--layout", layout,
              "--text-vocab", str(text_vocab)]
             + (["--selection-out", str(sel)]
                if layout == "parallel" else []))
        shard = glob.glob(str(out_dir / layout / "*-llm.jsonl"))
        assert shard, layout
        rows = [json.loads(l) for l in open(shard[0]) if l.strip()]
        assert len(rows) == len(TEXTS)
        for r in rows:
            assert r["llm_text_token_ids_len"] == len(r["llm_text_token_ids"])
            if layout == "parallel":
                assert len(r["s3_token_ids"]) == r["s3_token_ids_len"]
            elif layout == "padding":
                assert len(r["text_stream"]) == len(r["s3_stream"])
            else:
                stream = r["stream"]
                n_text = sum(1 for x in stream if 0 <= x < text_vocab)
                n_s3 = sum(1 for x in stream if x >= text_vocab)
                assert n_s3 == r["s3_token_ids_len"]
                assert n_text == r["llm_text_token_ids_len"]
                if layout == "sentence_interleave":
                    # contiguous text block, separator, contiguous s3 block
                    k = r["llm_text_token_ids_len"]
                    assert stream[k] == -100
                    assert all(x >= text_vocab for x in stream[k + 1:])

    pairs = [json.loads(l) for l in open(sel) if l.strip()]
    assert pairs and all(p["prefix"] and p["real"] and p["distractor"]
                         for p in pairs)

    out = tmp_path / "eval_sel.json"
    _run(["scripts/eval.py", "--platform", "cpu", "--seed-model", seed_model,
          "--synthetic", "--num-batches", "1", "--batch-size", "2",
          "--selection-data", str(sel), "--output", str(out)])
    metrics = json.load(open(out))
    anchor = json.load(open(os.path.join(REPO, "tests", "fixtures",
                                         "selection_tiny_real.json")))
    assert set(anchor["metrics"]) <= set(metrics)
    assert metrics["selection_pairs"] == len(pairs)
    assert 0.0 <= metrics["selection_accuracy"] <= 1.0
    assert metrics["selection_ll_real"] < 0
    assert metrics["selection_ll_distractor"] < 0


def test_stage1_dataset_mel_on_device_equivalence(arrow_shard, tokenizer_dir):
    """mel_on_device layout (VERDICT r4 #3): the host emits raw 16 kHz
    samples + the mel runs in-graph (train_step on_device_mel) — the loss
    must match the host-mel path exactly (same whisper_log_mel, same
    values)."""
    import jax
    import jax.numpy as jnp
    from transformers import AutoTokenizer
    from taste_spokenlm_tpu.config import TasteConfig
    from taste_spokenlm_tpu.data.dataset import BucketSpec, Stage1Dataset
    from taste_spokenlm_tpu.frontend.processor import TasteProcessor
    from taste_spokenlm_tpu.models.taste import TasteForCausalLM
    from taste_spokenlm_tpu.train import optim, train_step

    cfg = TasteConfig.tiny()
    tok = AutoTokenizer.from_pretrained(tokenizer_dir)
    proc = TasteProcessor(asr_tokenizer=tok, llm_tokenizer=tok)
    kw = dict(tokenize_fn=lambda text: proc.process_text(text=text),
              buckets=(BucketSpec(32, 48, 256),), token_budget=512,
              n_mels=cfg.audio_tower.whisper.n_mels,
              mel_frames=2 * cfg.audio_tower.whisper.max_source_positions)
    b_host = next(Stage1Dataset([arrow_shard], **kw).batches(epoch=0))
    b_dev = next(Stage1Dataset([arrow_shard], mel_on_device=True,
                               **kw).batches(epoch=0))
    assert "audio_samples" in b_dev and "audio_features" not in b_dev
    assert b_dev["audio_samples"].shape[1] == \
        kw["mel_frames"] * 160

    model = TasteForCausalLM(cfg)
    common = {k: jnp.asarray(v) for k, v in b_host.items()
              if not k.startswith("llm")}
    variables = model.init(
        jax.random.PRNGKey(0), common["speaker_embeds"],
        common["asr_token_ids"], common["asr_token_lengths"],
        common["asr_word_ids"], common["audio_features"],
        common["speech_token_ids"], common["speech_token_lengths"],
        method=TasteForCausalLM.forward_speech_autoencoder)
    tx = optim.make_optimizer(1e-4)
    state = train_step.init_state(jax.random.PRNGKey(1),
                                  variables["params"],
                                  variables.get("quantizer"), tx)
    step_h = train_step.make_stage1_step(model, tx, donate=False)
    step_d = train_step.make_stage1_step(model, tx, donate=False,
                                         on_device_mel=True)
    _, m_h = step_h(state, common)
    dev_batch = {k: jnp.asarray(v) for k, v in b_dev.items()
                 if not k.startswith("llm")}
    _, m_d = step_d(state, dev_batch)
    np.testing.assert_allclose(float(m_h["loss"]), float(m_d["loss"]),
                               rtol=1e-5)
