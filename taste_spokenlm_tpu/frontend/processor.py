"""TasteProcessor: raw audio + text -> model inputs.

Re-design of /root/reference/taste_speech/processing_taste.py:53-335 for TPU:
all signal processing (resample, whisper 128-mel, kaldi fbank for the
speaker path) is the jitted batched frontend from ops/audio.py instead of
per-sample CPU loops; the speaker embedder, S3 tokenizer, and ASR
transcriber are pluggable callables (the reference runs two opaque ONNX
graphs + a whisper ASR pipeline — here they can be the JAX re-exports from
frontend/onnx_import.py, a whisper decode on-device, or any user hook).

Dual tokenization with shared word ids (processing_taste.py:173-206):
words are split on whitespace, each prefixed with ' ', and encoded with both
the whisper ("asr") and llama ("llm") tokenizers; every sub-token carries
its word index so the tokenizer tower can pool to word level and the
spoken LM can align the two token spaces.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np

from taste_spokenlm_tpu.config import AudioFrontendConfig


def speaker_embedder_from_onnx(path_or_bytes) -> Callable:
    """campplus.onnx / speaker_embed.onnx -> a `speaker_embedder` hook.

    Mirrors the reference session call (processing_taste.py:304-307): one
    positional input, the [B, T, 80] mean-normalized kaldi fbank; returns the
    flattened 192-d x-vector.  The graph executes as a jitted JAX function
    (frontend/onnx_exec.py) instead of onnxruntime's C++ engine.
    """
    import jax
    import jax.numpy as jnp
    from taste_spokenlm_tpu.frontend.onnx_exec import OnnxJaxFunction
    fn = jax.jit(OnnxJaxFunction.from_file(path_or_bytes))

    def embed(feats):
        out = fn(jnp.asarray(feats, jnp.float32))
        if isinstance(out, list):
            out = out[0]
        return np.asarray(out).reshape(-1)

    return embed


def s3_tokenizer_from_onnx(path_or_bytes) -> Callable:
    """speech_tokenizer_v1.onnx -> an `s3_tokenizer` hook.

    Mirrors the reference session call (processing_taste.py:318-323):
    positional inputs (mel [1, 128, T<=3000], length int32[1]); returns the
    flat int32 S3 token ids (4096-vocab, 50 Hz).
    """
    import jax.numpy as jnp
    from taste_spokenlm_tpu.frontend.onnx_exec import OnnxJaxFunction
    fn = OnnxJaxFunction.from_file(path_or_bytes)

    def tokenize(mel, n_valid_frames):
        feats = np.asarray(mel)[:, :, :int(n_valid_frames)]
        out = fn(jnp.asarray(feats, jnp.float32),
                 np.asarray([feats.shape[2]], np.int32))
        if isinstance(out, list):
            out = out[0]
        return np.asarray(out).reshape(-1).astype(np.int32)

    return tokenize


def transcribe_with_fallback(asr_apply, mel, tokenizer=None,
                             max_tokens: int = 224,
                             temperatures=(0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
                             logprob_threshold: float = -1.0,
                             compression_ratio_threshold: float = 2.4,
                             seed: int = 0):
    """Whisper's temperature-fallback decode (the recipe behind the HF
    pipeline the reference uses for data prep, processing_taste.py:256-266):
    start greedy; rows whose avg logprob falls below `logprob_threshold` or
    whose decoded text zlib-compresses too well (degenerate repetition,
    ratio >= `compression_ratio_threshold`) are re-decoded at the next
    temperature.

    `asr_apply(mel, max_tokens, temperature, rng) -> (tokens [B, T],
    avg_logprob [B])` — e.g. a jitted WhisperForASR.apply closure.
    Returns (tokens [B, T], avg_logprob [B], temperature_used [B]).
    """
    import zlib
    import jax

    mel = np.asarray(mel)
    b = mel.shape[0]
    out_tokens = out_lp = None
    out_temp = np.zeros((b,), np.float32)
    remaining = np.ones((b,), bool)
    for ti, temp in enumerate(temperatures):
        tokens, avg_lp = asr_apply(mel, max_tokens, float(temp),
                                   jax.random.PRNGKey(seed + ti))
        tokens, avg_lp = np.asarray(tokens), np.asarray(avg_lp)
        if out_tokens is None:
            out_tokens, out_lp = tokens.copy(), avg_lp.copy()
            out_temp[:] = temp
        else:
            out_tokens[remaining] = tokens[remaining]
            out_lp[remaining] = avg_lp[remaining]
            out_temp[remaining] = temp
        ok = out_lp > logprob_threshold
        if tokenizer is not None:
            for i in np.flatnonzero(remaining):
                text = tokenizer.decode(
                    [int(t) for t in out_tokens[i]], skip_special_tokens=True)
                raw = text.encode("utf-8")
                if raw:
                    ratio = len(raw) / max(len(zlib.compress(raw)), 1)
                    ok[i] = ok[i] and ratio < compression_ratio_threshold
        remaining = remaining & ~ok
        if not remaining.any():
            break
    return out_tokens, out_lp, out_temp


def split_words(text: str) -> List[str]:
    """' '-prefixed whitespace words (processing_taste.py:175)."""
    return [" " + w for w in re.split(r"\s", text.strip()) if w]


def dual_tokenize(words: Sequence[str], asr_tokenizer, llm_tokenizer
                  ) -> Dict[str, np.ndarray]:
    asr_ids, asr_words, llm_ids, llm_words = [], [], [], []
    for i, word in enumerate(words):
        for tid in asr_tokenizer.encode(word, add_special_tokens=False):
            asr_ids.append(tid)
            asr_words.append(i)
        for tid in llm_tokenizer.encode(word, add_special_tokens=False):
            llm_ids.append(tid)
            llm_words.append(i)
    return {
        "asr_token_ids": np.asarray([asr_ids], np.int32),
        "asr_token_lengths": np.asarray([len(asr_ids)], np.int32),
        "asr_word_ids": np.asarray([asr_words], np.int32),
        "llm_token_ids": np.asarray([llm_ids], np.int32),
        "llm_token_lengths": np.asarray([len(llm_ids)], np.int32),
        "llm_word_ids": np.asarray([llm_words], np.int32),
    }


@dataclass
class TasteProcessor:
    """Pluggable hooks:
      asr_tokenizer / llm_tokenizer: HF-style .encode
      speaker_embedder(fbank80 [B,T,80]) -> [192] x-vector (CAM++)
      s3_tokenizer(mel128 [1,128,3000], n_valid_frames) -> [T] int ids
      transcriber(wav16k [T]) -> str  (whisper ASR)
    """

    asr_tokenizer: Any = None
    llm_tokenizer: Any = None
    speaker_embedder: Optional[Callable] = None
    s3_tokenizer: Optional[Callable] = None
    transcriber: Optional[Callable] = None
    frontend: AudioFrontendConfig = AudioFrontendConfig()

    def process_text(self, text: Optional[str] = None,
                     words: Optional[Sequence[str]] = None) -> Dict[str, np.ndarray]:
        if words is None:
            words = split_words(re.sub(r"\s", " ", text))
        return dual_tokenize(words, self.asr_tokenizer, self.llm_tokenizer)

    def speaker_embedding(self, ref_audio_list: Sequence[np.ndarray]) -> np.ndarray:
        """Average + L2-normalize x-vectors over reference clips
        (processing_taste.py:295-310)."""
        import jax.numpy as jnp
        from taste_spokenlm_tpu.ops.audio import speaker_fbank_features
        embs = []
        for wav in ref_audio_list:
            feats = speaker_fbank_features(jnp.asarray(wav, jnp.float32)[None])
            embs.append(np.asarray(self.speaker_embedder(feats)).reshape(-1))
        emb = np.mean(np.stack(embs), axis=0)
        return emb / max(np.linalg.norm(emb), 1e-8)

    def __call__(self, audio: np.ndarray, sampling_rate: int,
                 text: Optional[str] = None,
                 ref_audio_list: Optional[Sequence[np.ndarray]] = None
                 ) -> Dict[str, np.ndarray]:
        import jax.numpy as jnp
        from taste_spokenlm_tpu.ops import audio as A

        assert audio.ndim == 1
        if sampling_rate != self.frontend.sample_rate:
            audio = np.asarray(A.resample(
                jnp.asarray(audio, jnp.float32)[None], sampling_rate,
                self.frontend.sample_rate))[0]
        data: Dict[str, np.ndarray] = {}

        if ref_audio_list is not None and self.speaker_embedder is not None:
            data["speaker_embeds"] = self.speaker_embedding(ref_audio_list)[None]

        mel = np.asarray(A.whisper_log_mel(
            jnp.asarray(audio, jnp.float32)[None],
            n_mels=self.frontend.n_mels))
        data["audio_features"] = mel
        data["audio_feature_lengths"] = np.asarray(
            [len(audio) // self.frontend.hop_length], np.int32)

        if self.s3_tokenizer is not None:
            s3 = np.asarray(self.s3_tokenizer(
                mel, data["audio_feature_lengths"][0]), np.int32).reshape(-1)
            data["speech_token_ids"] = s3[None]
            data["speech_token_lengths"] = np.asarray([len(s3)], np.int32)

        if text is None:
            if self.transcriber is None:
                raise ValueError("`text` is needed (no transcriber hook)")
            text = self.transcriber(audio)
        data.update(self.process_text(text=text))
        return data
