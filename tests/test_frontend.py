"""Processor + ONNX-reader tests."""

import struct

import numpy as np
import pytest

from taste_spokenlm_tpu.frontend.onnx_import import load_onnx
from taste_spokenlm_tpu.frontend.processor import (TasteProcessor,
                                                   dual_tokenize, split_words)


class FakeTokenizer:
    """Deterministic toy tokenizer: one id per char, offset to distinguish."""

    def __init__(self, offset=0, split=1):
        self.offset = offset
        self.split = split

    def encode(self, word, add_special_tokens=False):
        # emit ceil(len/split) tokens per word
        n = max(1, (len(word) + self.split - 1) // self.split)
        return [self.offset + (hash(word) + i) % 100 for i in range(n)]


def test_split_words_space_prefix():
    assert split_words("hello world  foo") == [" hello", " world", " foo"]


def test_dual_tokenize_shared_word_ids():
    asr, llm = FakeTokenizer(0, 2), FakeTokenizer(1000, 3)
    out = dual_tokenize([" hello", " hi"], asr, llm)
    assert out["asr_token_ids"].shape[0] == 1
    # word ids cover both words and are aligned per tokenizer
    assert set(out["asr_word_ids"][0]) == {0, 1}
    assert set(out["llm_word_ids"][0]) == {0, 1}
    assert out["asr_token_lengths"][0] == out["asr_token_ids"].shape[1]


def test_processor_end_to_end_with_hooks():
    proc = TasteProcessor(
        asr_tokenizer=FakeTokenizer(0, 2),
        llm_tokenizer=FakeTokenizer(1000, 3),
        speaker_embedder=lambda feats: np.ones((192,), np.float32),
        s3_tokenizer=lambda mel, n: np.arange(n // 2 % 50, dtype=np.int32),
        transcriber=lambda wav: "hello world",
    )
    wav = np.sin(np.arange(16000) / 16000 * 2 * np.pi * 220).astype(np.float32)
    data = proc(wav, 16000, ref_audio_list=[wav, wav])
    assert data["audio_features"].shape == (1, 128, 3000)
    assert data["audio_feature_lengths"][0] == 100
    np.testing.assert_allclose(np.linalg.norm(data["speaker_embeds"][0]), 1.0,
                               rtol=1e-5)
    assert data["speech_token_ids"].shape[0] == 1
    assert data["asr_token_ids"].shape[1] == data["asr_word_ids"].shape[1]
    assert set(data["asr_word_ids"][0]) == {0, 1}


# ---------------------------------------------------------------------------
# ONNX wire-format reader, validated against hand-encoded protobuf bytes
# ---------------------------------------------------------------------------


def _varint(v):
    out = b""
    while True:
        b7 = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b7 | 0x80])
        else:
            return out + bytes([b7])


def _len_field(fnum, payload):
    return _varint((fnum << 3) | 2) + _varint(len(payload)) + payload


def _varint_field(fnum, v):
    return _varint(fnum << 3) + _varint(v)


def _make_tensor(name, arr):
    payload = b""
    for d in arr.shape:
        payload += _varint_field(1, d)
    payload += _varint_field(2, 1)  # float32
    payload += _len_field(8, name.encode())
    payload += _len_field(9, arr.astype("<f4").tobytes())
    return payload


def test_load_onnx_roundtrip():
    w = np.arange(12, dtype=np.float32).reshape(3, 4)
    b = np.asarray([1.0, 2.0, 3.0], np.float32)
    node = (_len_field(1, b"x") + _len_field(1, b"w") + _len_field(2, b"y")
            + _len_field(4, b"MatMul")
            + _len_field(5, _len_field(1, b"alpha")
                         + (_varint((2 << 3) | 5)
                            + struct.pack("<f", 0.5))))
    graph = (_len_field(1, node)
             + _len_field(5, _make_tensor("w", w))
             + _len_field(5, _make_tensor("b", b))
             + _len_field(11, _len_field(1, b"x"))
             + _len_field(12, _len_field(1, b"y")))
    model = _len_field(7, graph)

    g = load_onnx(model)
    np.testing.assert_allclose(g.initializers["w"], w)
    np.testing.assert_allclose(g.initializers["b"], b)
    assert g.nodes[0].op_type == "MatMul"
    assert g.nodes[0].inputs == ["x", "w"]
    assert g.nodes[0].outputs == ["y"]
    assert g.nodes[0].attributes["alpha"] == pytest.approx(0.5)
    assert g.inputs == ["x"] and g.outputs == ["y"]

def test_transcribe_with_fallback_retries_low_quality_rows():
    """Rows below the logprob threshold are re-decoded at the next
    temperature; good rows keep their greedy result."""
    from taste_spokenlm_tpu.frontend.processor import transcribe_with_fallback

    calls = []

    def fake_asr(mel, max_tokens, temperature, rng):
        calls.append(temperature)
        b = mel.shape[0]
        toks = np.full((b, 4), 7, np.int32)
        if temperature == 0.0:
            lp = np.asarray([-0.1, -3.0])   # row 1 fails the threshold
            toks[1] = 9
        else:
            lp = np.asarray([-0.05, -0.2])  # retry fixes row 1
            toks[:] = 11
        return toks, lp

    mel = np.zeros((2, 8, 16), np.float32)
    tokens, lp, temps = transcribe_with_fallback(
        fake_asr, mel, temperatures=(0.0, 0.4), logprob_threshold=-1.0)
    assert calls == [0.0, 0.4]
    assert tokens[0].tolist() == [7, 7, 7, 7]     # good row untouched
    assert tokens[1].tolist() == [11, 11, 11, 11]  # failed row re-decoded
    np.testing.assert_allclose(temps, [0.0, 0.4], rtol=1e-6)
    np.testing.assert_allclose(lp[1], -0.2, rtol=1e-6)


def test_transcribe_with_fallback_compression_ratio():
    """Degenerate repetitive text trips the zlib compression check even when
    the logprob looks fine."""
    from taste_spokenlm_tpu.frontend.processor import transcribe_with_fallback

    class Tok:
        def decode(self, ids, skip_special_tokens=True):
            if all(i == 9 for i in ids):
                return "the the the the the the the the the the the the"
            return "a perfectly normal varied sentence with many words"

    def fake_asr(mel, max_tokens, temperature, rng):
        toks = np.full((1, 12), 9 if temperature == 0.0 else 3, np.int32)
        return toks, np.asarray([-0.1])

    tokens, _, temps = transcribe_with_fallback(
        fake_asr, np.zeros((1, 8, 16), np.float32), tokenizer=Tok(),
        temperatures=(0.0, 0.5), compression_ratio_threshold=2.0)
    np.testing.assert_allclose(temps, [0.5], rtol=1e-6)
    assert (tokens == 3).all()
