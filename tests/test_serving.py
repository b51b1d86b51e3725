"""Serving tests: gRPC round trip + HTTP endpoints against the tiny model."""

import json
import threading
import urllib.request

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from taste_spokenlm_tpu.config import TasteConfig
from taste_spokenlm_tpu.models.taste import TasteForCausalLM
from taste_spokenlm_tpu.serving import taste_serving_pb2 as pb
from taste_spokenlm_tpu.serving.server import (TasteEngine, create_grpc_server,
                                               create_http_server)

grpc = pytest.importorskip("grpc")


@pytest.fixture(scope="module")
def engine():
    cfg = TasteConfig.tiny()
    model = TasteForCausalLM(cfg)
    rng = np.random.RandomState(0)
    b, t_tok, t_sp, t_llm = 1, 8, 12, 7
    variables = model.init(
        jax.random.PRNGKey(0), jax.random.PRNGKey(1),
        jnp.asarray(rng.randn(b, cfg.speech_decoder.spk_embed_dim), jnp.float32),
        jnp.asarray(rng.randint(5, 100, (b, t_tok))), jnp.asarray([t_tok]),
        jnp.asarray((np.arange(t_tok) // 2)[None]),
        jnp.asarray(rng.randn(b, cfg.audio_tower.whisper.n_mels,
                              cfg.audio_tower.whisper.max_source_positions * 2),
                    jnp.float32),
        jnp.asarray(rng.randint(0, cfg.speech_decoder.speech_token_size,
                                (b, t_sp))), jnp.asarray([t_sp]),
        jnp.asarray(rng.randint(2, 100, (b, t_llm))), jnp.asarray([t_llm]),
        jnp.asarray((np.arange(t_llm) // 2)[None]),
        method=TasteForCausalLM.init_all)
    return TasteEngine(model, variables, cfg, token_buckets=(8, 16))


def _mel(cfg):
    rng = np.random.RandomState(1)
    return rng.randn(cfg.audio_tower.whisper.n_mels,
                     cfg.audio_tower.whisper.max_source_positions * 2
                     ).astype(np.float32)


def test_grpc_tokenize_and_reconstruct(engine):
    server, port = create_grpc_server(engine, port=0)
    server.start()
    channel = None
    try:
        cfg = engine.config
        mel = _mel(cfg)
        channel = grpc.insecure_channel(f"localhost:{port}")
        tokenize = channel.unary_unary(
            "/taste_serving.Taste/Tokenize",
            request_serializer=pb.TokenizeRequest.SerializeToString,
            response_deserializer=pb.TokenizeResponse.FromString)
        req = pb.TokenizeRequest(
            audio_features=mel.reshape(-1).tolist(), n_mels=mel.shape[0],
            n_frames=mel.shape[1],
            asr_token_ids=list(range(10, 18)),
            asr_word_ids=[0, 0, 1, 1, 2, 2, 3, 3])
        resp = tokenize(req, timeout=600)
        nq = cfg.audio_tower.quantizer.num_quantizers
        assert resp.n_quantizers == nq
        assert len(resp.indices) == 8 * nq

        reconstruct = channel.unary_unary(
            "/taste_serving.Taste/Reconstruct",
            request_serializer=pb.ReconstructRequest.SerializeToString,
            response_deserializer=pb.ReconstructResponse.FromString)
        r2 = reconstruct(pb.ReconstructRequest(
            inputs=req,
            speaker_embedding=[0.1] * cfg.speech_decoder.spk_embed_dim,
            max_speech_steps=8, seed=3), timeout=600)
        assert r2.sample_rate == cfg.hift.sampling_rate
        assert len(r2.pcm16) % 2 == 0 and len(r2.pcm16) > 0
        assert r2.rtf > 0
    finally:
        if channel is not None:
            channel.close()
        # stop(0) returns an event; wait so grpc's non-daemon worker
        # threads are joined before the interpreter tries to exit
        server.stop(0).wait(timeout=10)


def test_grpc_synthesize_streams_chunks(engine):
    """Server-streaming Synthesize: PCM chunks arrive incrementally, the
    final one is flagged, and the assembled audio matches a direct
    engine.synthesize_stream drive (the reference runtime has no streaming
    response at all, cosyvoice.proto)."""
    server, port = create_grpc_server(engine, port=0)
    server.start()
    channel = None
    try:
        cfg = engine.config
        nq = cfg.audio_tower.quantizer.num_quantizers
        rng = np.random.RandomState(3)
        n_words, t = 4, 8
        taste = rng.randint(0, cfg.audio_tower.quantizer.codebook_size,
                            (n_words, nq)).astype(np.int32)
        asr_ids = rng.randint(5, 100, t).tolist()
        asr_words = np.minimum(np.arange(t) // 2, n_words - 1).tolist()
        spk = (0.1 * np.ones(cfg.speech_decoder.spk_embed_dim)).tolist()
        channel = grpc.insecure_channel(f"localhost:{port}")
        synthesize = channel.unary_stream(
            "/taste_serving.Taste/Synthesize",
            request_serializer=pb.SynthesizeRequest.SerializeToString,
            response_deserializer=pb.SynthesizeChunk.FromString)
        req = pb.SynthesizeRequest(
            taste_indices=taste.reshape(-1).tolist(), n_words=n_words,
            asr_token_ids=asr_ids, asr_word_ids=asr_words,
            speaker_embedding=spk, max_speech_steps=16, chunk_tokens=5,
            seed=11)
        chunks = list(synthesize(req, timeout=600))
        assert chunks and chunks[-1].is_last
        assert all(c.sample_rate == cfg.hift.sampling_rate for c in chunks)
        pcm = b"".join(c.pcm16 for c in chunks)
        assert len(pcm) > 0 and len(pcm) % 2 == 0
        assert sum(c.num_tokens for c in chunks) > 0
        # same request through the engine directly -> identical audio
        direct = np.concatenate([
            w for w, _, _ in engine.synthesize_stream(
                taste, asr_ids, asr_words, np.asarray(spk, np.float32),
                max_steps=16, chunk_tokens=5, seed=11)])
        got = np.frombuffer(pcm, "<i2").astype(np.float32) / 32767.0
        np.testing.assert_allclose(got, np.clip(direct, -1, 1), atol=1e-4)
    finally:
        if channel is not None:
            channel.close()
        server.stop(0).wait(timeout=10)


def test_grpc_complete_stream_pipelined(engine):
    """Server-streaming PIPELINED completion: PCM chunks arrive while the
    joint decode is still producing text; the final chunk is flagged and
    the word count is monotonic (the reference pipeline is strictly
    decode-everything-then-synthesize and its runtime has no streaming
    response at all)."""
    server, port = create_grpc_server(engine, port=0)
    server.start()
    channel = None
    try:
        cfg = engine.config
        nq = cfg.audio_tower.quantizer.num_quantizers
        rng = np.random.RandomState(5)
        t_llm, t_asr = 7, 8
        V = cfg.spoken_lm.llama.vocab_size
        word_ids = (np.arange(t_llm) // 2).tolist()
        idx = np.full((t_llm, nq), -1, np.int32)
        starts = np.flatnonzero(np.diff(word_ids, prepend=-1) != 0)
        idx[starts] = rng.randint(
            0, cfg.audio_tower.quantizer.codebook_size, (len(starts), nq))
        spk = (0.1 * np.ones(cfg.speech_decoder.spk_embed_dim)).tolist()
        channel = grpc.insecure_channel(f"localhost:{port}")
        complete_stream = channel.unary_stream(
            "/taste_serving.Taste/CompleteStream",
            request_serializer=pb.CompleteStreamRequest.SerializeToString,
            response_deserializer=pb.SynthesizeChunk.FromString)
        req = pb.CompleteStreamRequest(
            complete=pb.CompleteRequest(
                llm_token_ids=(rng.randint(2, V, t_llm)).tolist(),
                llm_word_ids=word_ids,
                llm_indices=idx.reshape(-1).tolist(),
                # sampled decode: greedy random-weight trajectories can
                # produce zero word starts (and thus, correctly, no audio)
                extra_words=16, text_top_p=0.9, seed=7),
            asr_token_ids=rng.randint(5, 100, t_asr).tolist(),
            asr_word_ids=np.minimum(np.arange(t_asr) // 2, 5).tolist(),
            speaker_embedding=spk, max_speech_steps=12, chunk_tokens=5,
            first_chunk_tokens=2, jd_first_chunk=3, max_steps=16)
        chunks = list(complete_stream(req, timeout=900))
        assert chunks and chunks[-1].is_last
        pcm = b"".join(c.pcm16 for c in chunks)
        assert len(pcm) > 0 and len(pcm) % 2 == 0
        assert sum(c.num_tokens for c in chunks) > 0
        words = [c.n_words for c in chunks]
        assert words == sorted(words) and words[-1] > 0
        wav = np.frombuffer(pcm, "<i2").astype(np.float32) / 32767.0
        assert np.isfinite(wav).all()
    finally:
        if channel is not None:
            channel.close()
        server.stop(0).wait(timeout=10)


def test_http_health_and_tokenize(engine):
    server = create_http_server(engine, port=0)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        with urllib.request.urlopen(f"http://localhost:{port}/health") as r:
            assert json.load(r)["status"] == "ok"
        cfg = engine.config
        mel = _mel(cfg)
        body = json.dumps({
            "audio_features": mel.tolist(),
            "asr_token_ids": list(range(10, 18)),
            "asr_word_ids": [0, 0, 1, 1, 2, 2, 3, 3],
        }).encode()
        req = urllib.request.Request(
            f"http://localhost:{port}/tokenize", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=600) as r:
            out = json.load(r)
        assert np.asarray(out["indices"]).shape == (
            8, cfg.audio_tower.quantizer.num_quantizers)
        # unknown route -> 404
        req2 = urllib.request.Request(f"http://localhost:{port}/nope",
                                      data=b"{}")
        try:
            urllib.request.urlopen(req2)
            assert False
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        server.shutdown()

def test_complete_batcher_micro_batches(engine):
    """Concurrent Complete submissions share one batched decode and each get
    a consistent per-row result (greedy -> batched rows equal solo runs)."""
    from taste_spokenlm_tpu.serving.server import CompleteBatcher

    nq = engine.config.audio_tower.quantizer.num_quantizers
    kw = dict(extra_words=2, text_top_p=0.0, taste_top_p=0.0,
              text_temperature=1.0, repetition_penalty=1.0)
    reqs = []
    rng = np.random.RandomState(7)
    for i in range(3):
        n = 4 + i
        reqs.append(dict(
            llm_ids=rng.randint(2, 90, n).tolist(),
            llm_word_ids=(np.arange(n) // 2).tolist(),
            llm_indices=np.where(
                (np.arange(n) % 2 == 0)[:, None],
                rng.randint(0, 4, (n, nq)), -1).astype(np.int32)))

    batcher = CompleteBatcher(engine, max_batch=4, window_ms=200.0)
    futs = [batcher.submit(r["llm_ids"], r["llm_word_ids"], r["llm_indices"],
                           kw, seed=0, max_steps=8) for r in reqs]
    results = [f.result(timeout=600) for f in futs]

    for r, res in zip(reqs, results):
        n = int(res["num_tokens"])
        assert 0 < n <= 8
        solo = engine.complete(r["llm_ids"], r["llm_word_ids"],
                               r["llm_indices"], kw, seed=0, max_steps=8)
        # greedy decode: batched row == solo run
        np.testing.assert_array_equal(res["llm_token_ids"],
                                      solo["llm_token_ids"])
        np.testing.assert_array_equal(res["taste_indices"],
                                      solo["taste_indices"])


def _mk_requests(engine, n, seed0=0):
    nq = engine.config.audio_tower.quantizer.num_quantizers
    rng = np.random.RandomState(11)
    reqs = []
    for i in range(n):
        ln = 4 + (i % 3)
        reqs.append(dict(
            llm_ids=rng.randint(2, 90, ln).tolist(),
            llm_word_ids=(np.arange(ln) // 2).tolist(),
            llm_indices=np.where(
                (np.arange(ln) % 2 == 0)[:, None],
                rng.randint(0, 4, (ln, nq)), -1).astype(np.int32),
            seed=seed0 + 3 * i))
    return reqs


def test_complete_batch_per_request_seed_reproducible(engine):
    """A SAMPLED request's output must not depend on which other requests
    it was micro-batched with: row i streams from its own seed."""
    kw = dict(extra_words=2, text_top_p=0.9, taste_top_p=0.9,
              text_temperature=1.3, repetition_penalty=1.0)
    reqs = _mk_requests(engine, 3, seed0=5)
    batched = engine.complete_batch(reqs, kw, max_steps=8)
    for r, res in zip(reqs, batched):
        solo = engine.complete(r["llm_ids"], r["llm_word_ids"],
                               r["llm_indices"], kw, seed=r["seed"],
                               max_steps=8)
        np.testing.assert_array_equal(res["llm_token_ids"],
                                      solo["llm_token_ids"])
        np.testing.assert_array_equal(res["taste_indices"],
                                      solo["taste_indices"])
        assert int(res["num_tokens"]) == int(solo["num_tokens"])


def test_complete_batch_chunks_oversized_cohorts(engine):
    """Cohorts beyond the largest batch bucket (16) are decoded in chunks
    instead of raising (advisor round-2 finding)."""
    kw = dict(extra_words=2, text_top_p=0.0, taste_top_p=0.0,
              text_temperature=1.0, repetition_penalty=1.0)
    reqs = _mk_requests(engine, 18)
    res = engine.complete_batch(reqs, kw, max_steps=4)
    assert len(res) == 18
    # every row must at least decode something valid, including the rows
    # in the 2-request tail chunk
    for r in res:
        assert 0 < int(r["num_tokens"]) <= 4


def test_serving_under_load(engine):
    """16 concurrent Complete requests through the micro-batcher: every
    request succeeds, latency percentiles + aggregate tok/s are reported,
    and the batcher shuts down cleanly (VERDICT r2 #8)."""
    from taste_spokenlm_tpu.serving.server import run_load_test

    kw = dict(extra_words=2, text_top_p=0.0, taste_top_p=0.0,
              text_temperature=1.0, repetition_penalty=1.0)
    reqs = _mk_requests(engine, 16)
    # warm the jit cache (one cohort per bucket shape)
    run_load_test(engine, reqs[:4], kw, max_steps=6)
    stats = run_load_test(engine, reqs, kw, max_steps=6)
    assert stats["n"] == 16
    assert stats["total_tokens"] > 0
    assert 0 < stats["p50_ms"] <= stats["p99_ms"] <= stats["max_ms"]
    assert stats["tokens_per_sec"] > 0


def test_host_key_matches_prngkey_and_handles_uint64_seeds():
    """_host_key must equal jax.random.PRNGKey for 32-bit seeds (the RPC
    contract for existing clients) and stay deterministic + distinct for
    full-range uint64 seeds — PRNGKey alone silently truncates above 2**32
    and raises OverflowError at >= 2**63 (regression: three RPC flows
    passed request.seed straight through)."""
    for s in (0, 1, 7, 2**31, 2**32 - 1):
        np.testing.assert_array_equal(
            TasteEngine._host_key(s), np.asarray(jax.random.PRNGKey(s)))
    big = 2**63 + 12345          # PRNGKey(big) raises OverflowError
    k1 = TasteEngine._host_key(big)
    assert k1.dtype == np.uint32 and k1.shape == (2,)
    np.testing.assert_array_equal(k1, TasteEngine._host_key(big))
    # seeds differing only in the high word must produce different keys
    assert not np.array_equal(TasteEngine._host_key(5),
                              TasteEngine._host_key(5 + 2**32))
    # layout is [hi, lo]: injective over the full uint64 range (the old
    # xor-mix collapsed e.g. these two distinct seeds onto one key)
    np.testing.assert_array_equal(k1, np.array([2**31, 12345], np.uint32))
    assert not np.array_equal(TasteEngine._host_key(0x9E3779B9),
                              TasteEngine._host_key(2**32))
    # a host key drives jax.random like a PRNGKey does
    a = jax.random.normal(k1, (3,))
    b = jax.random.normal(jnp.asarray(k1), (3,))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
