"""Serving: gRPC + HTTP servers around the composite TASTE model.

Counterpart of the reference's CosyVoice runtime (grpc + fastapi servers,
/root/reference/STAGE1_TRAIN/CosyVoice/runtime/python/) re-designed for the
TASTE flows.  The gRPC service is wired with generic method handlers (the
image has the grpc runtime but not grpc_tools codegen), message classes come
from protoc-generated taste_serving_pb2.

Engine design: one jitted callable per (flow, bucket shape); requests are
padded to the nearest bucket so repeated calls hit the compile cache.
"""

from __future__ import annotations

import concurrent.futures
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional

import numpy as np

from taste_spokenlm_tpu.serving import taste_serving_pb2 as pb


class TasteEngine:
    """Model wrapper with shape bucketing + jit caching."""

    def __init__(self, model, variables, config, token_buckets=(16, 32, 64)):
        import jax
        self.jax = jax
        self.model = model
        self.variables = variables
        self.config = config
        self.token_buckets = tuple(sorted(token_buckets))
        self._jits: Dict[Any, Any] = {}

    @classmethod
    def from_pretrained(cls, checkpoint_dir: str, dtype=None,
                        token_buckets=(16, 32, 64)) -> "TasteEngine":
        """One-line serving engine from a converted/seed checkpoint dir
        (taste_spokenlm_tpu.pretrained.from_pretrained)."""
        from taste_spokenlm_tpu.pretrained import from_pretrained
        model, variables, _ = from_pretrained(checkpoint_dir, dtype=dtype)
        return cls(model, variables, model.config,
                   token_buckets=token_buckets)

    def _bucket(self, n: int) -> int:
        for b in self.token_buckets:
            if n <= b:
                return b
        return self.token_buckets[-1]

    @staticmethod
    def _host_key(seed) -> np.ndarray:
        """Deterministic PRNG key from the proto's uint64 seed, built on the
        HOST as [seed >> 32, seed & 0xffffffff] uint32: exactly
        `np.asarray(jax.random.PRNGKey(seed))` for seeds < 2**32, and the
        natural uint64 extension above that (this jax build TRUNCATES
        PRNGKey seeds to the low 32 bits, verified empirically) — both
        words carry entropy, so distinct uint64 seeds give distinct keys.
        A host-built key also ships WITH the request's dispatch instead of
        paying its own eager device op (~30 ms over the remote tunnel)."""
        s = int(seed) & 0xFFFFFFFFFFFFFFFF
        return np.array([s >> 32, s & 0xFFFFFFFF], np.uint32)

    def _pad_tokens(self, ids, word_ids, bucket):
        # host numpy outputs: they ship with the next dispatch as call
        # arguments instead of paying per-array eager device puts
        ids = list(ids)[:bucket]
        word_ids = list(word_ids)[:bucket]
        n = len(ids)
        pad = bucket - n
        ids = np.pad(np.asarray(ids, np.int32), (0, pad))
        word_ids = np.pad(np.asarray(word_ids, np.int32), (0, pad))
        return (ids[None], np.asarray([n], np.int32), word_ids[None])

    def tokenize(self, mel: np.ndarray, asr_ids, asr_word_ids) -> np.ndarray:
        import jax
        bucket = self._bucket(len(asr_ids))
        key = ("tokenize", bucket)
        if key not in self._jits:
            self._jits[key] = jax.jit(lambda v, mel, ids, lens, words:
                                      self.model.apply(
                                          v, mel, ids, lens, words,
                                          method=lambda m, *a: m.audio_tower(*a)))
        ids, lens, words = self._pad_tokens(asr_ids, asr_word_ids, bucket)
        out = self._jits[key](self.variables, np.asarray(mel)[None], ids,
                              lens, words)
        return np.asarray(out["quantized_indices"])[0, :len(asr_ids)]

    def reconstruct(self, mel, asr_ids, asr_word_ids, spk, max_steps, seed):
        import jax
        from taste_spokenlm_tpu.models.taste import TasteForCausalLM
        bucket = self._bucket(len(asr_ids))
        mel_len_max = max(32, int(np.ceil(max_steps / 50 * 22050 / 256)) + 8)
        key = ("reconstruct", bucket, max_steps, mel_len_max)
        if key not in self._jits:
            def fn(v, rng, spk, ids, lens, words, mel):
                return self.model.apply(
                    v, rng, spk, ids, lens, words, mel,
                    max_speech_steps=max_steps, mel_len_max=mel_len_max,
                    method=TasteForCausalLM.inference_reconstruction)
            self._jits[key] = jax.jit(fn)
        ids, lens, words = self._pad_tokens(asr_ids, asr_word_ids, bucket)
        t0 = time.perf_counter()
        out = self._jits[key](self.variables, self._host_key(seed),
                              np.asarray(spk)[None], ids, lens, words,
                              np.asarray(mel)[None])
        wav = np.asarray(out["waveform"])[0]
        n = int(out["waveform_lengths"][0])
        wall = time.perf_counter() - t0
        sr = self.config.hift.sampling_rate
        rtf = wall / max(n / sr, 1e-6)
        return wav[:n], sr, int(out["speech_token_lengths"][0]), rtf

    def synthesize_stream(self, taste_indices, asr_ids, asr_word_ids, spk,
                          max_steps: int = 128, chunk_tokens: int = 50,
                          seed: int = 0):
        """Streaming synthesis: yields (wav_chunk [n] f32, is_last, n_new)
        as each ~chunk_tokens of S3 audio is vocoded (chunked decode +
        windowed flow/HiFT, frontend.streaming).  Shapes are bucketed like
        the other flows so repeated requests hit the jit cache; one
        StreamingSynthesizer (3 compiled programs) is cached per bucket."""
        from taste_spokenlm_tpu.frontend.streaming import StreamingSynthesizer
        bucket = self._bucket(len(asr_ids))
        taste = np.asarray(taste_indices, np.int32).reshape(
            -1, self.config.audio_tower.quantizer.num_quantizers)
        # one taste row per word; words <= asr tokens, so the token bucket
        # also bounds the padded word count
        n_words = taste.shape[0]
        taste_pad = np.zeros((1, bucket, taste.shape[1]), np.int32)
        taste_pad[0, :min(n_words, bucket)] = np.maximum(
            taste[:bucket], 0)
        key = ("synthesize_stream", bucket, max_steps, chunk_tokens)
        if key not in self._jits:
            self._jits[key] = StreamingSynthesizer(
                self.model, self.variables, chunk_tokens=chunk_tokens,
                left_ctx_tokens=max(chunk_tokens // 2, 1),
                max_speech_steps=max_steps)
        streamer = self._jits[key]
        ids, lens, words = self._pad_tokens(asr_ids, asr_word_ids, bucket)
        it = streamer.stream(self._host_key(seed),
                             np.asarray(spk, np.float32)[None],
                             taste_pad, ids, lens, words)
        for out in it:
            yield out["wav"][0], bool(out["is_last"]), int(out["n_new"])

    def _get_tables(self):
        import jax.numpy as jnp
        if not hasattr(self, "_tables"):
            # without a tokenizer asset, fall back to trivial tables
            v = self.config.spoken_lm.llama.vocab_size
            self._tables = {
                "word_start": jnp.asarray(np.arange(v) % 3 == 0),
                "banned": jnp.zeros((v,), bool),
                "sentence_end": jnp.asarray(np.arange(v) % 7 == 0)}
        return self._tables

    def complete_stream(self, llm_ids, llm_word_ids, llm_indices,
                        asr_ids, asr_word_ids, spk, sampler_kwargs,
                        seed, max_steps: int = 64,
                        max_speech_steps: int = 128, chunk_tokens: int = 50,
                        first_chunk_tokens: int = 16,
                        jd_first_chunk: int = 16):
        """PIPELINED completion: yields (wav_chunk [n] f32, is_last, n_new,
        n_words) with the first chunk available after only a partial joint
        decode (frontend.streaming.CompletionStreamer).  `asr_ids`/
        `asr_word_ids` are the full-budget asr tokenization of the
        completion text (word w of the decode = asr positions with word id
        w); shapes are bucketed so repeated requests hit the jit cache."""
        from taste_spokenlm_tpu.frontend.streaming import CompletionStreamer
        from taste_spokenlm_tpu.models.sampler import SamplerConfig
        bucket = self._bucket(len(llm_ids))
        asr_bucket = self._bucket(len(asr_ids))
        scfg = SamplerConfig(delay=self.config.spoken_lm.delay,
                             **sampler_kwargs)
        fc = min(first_chunk_tokens, chunk_tokens)
        key = ("complete_stream", bucket, asr_bucket, max_steps,
               max_speech_steps, chunk_tokens, fc, jd_first_chunk, scfg)
        if key not in self._jits:
            self._jits[key] = CompletionStreamer(
                self.model, self.variables, scfg, self._get_tables(),
                chunk_tokens=chunk_tokens,
                left_ctx_tokens=max(chunk_tokens // 2, 1),
                first_chunk_tokens=fc, jd_first_chunk=jd_first_chunk,
                jd_chunk=max(jd_first_chunk, 1),
                max_speech_steps=max_speech_steps)
        streamer = self._jits[key]
        ids, lens, words = self._pad_tokens(llm_ids, llm_word_ids, bucket)
        nq = self.config.audio_tower.quantizer.num_quantizers
        ridx = np.asarray(llm_indices, np.int32).reshape(-1, nq)[:bucket]
        idx = np.full((1, bucket, nq), -1, np.int32)
        idx[0, :len(ridx)] = ridx
        a_ids, _, a_words = self._pad_tokens(asr_ids, asr_word_ids,
                                             asr_bucket)
        it = streamer.stream(
            self._host_key(seed),
            np.asarray(spk, np.float32)[None],
            idx, ids, lens, words, a_ids, a_words,
            max_steps=max_steps,
            asr_valid_len=min(len(asr_ids), asr_bucket))
        for out in it:
            yield (out["wav"][0], bool(out["is_last"]), int(out["n_new"]),
                   int(out["n_words"]))

    def complete(self, llm_ids, llm_word_ids, llm_indices, sampler_kwargs,
                 seed, max_steps: int = 128):
        return self.complete_batch(
            [dict(llm_ids=llm_ids, llm_word_ids=llm_word_ids,
                  llm_indices=llm_indices, seed=seed)],
            sampler_kwargs, max_steps)[0]

    BATCH_BUCKETS = (1, 2, 4, 8, 16)

    def complete_batch(self, requests, sampler_kwargs, max_steps: int = 128):
        """One batched joint text+taste decode over N concurrent requests
        (models/spoken_lm.generate is natively batched; rows are padded to a
        shared token bucket and the batch to a batch bucket so repeated
        calls hit the jit cache).  Row i's sampling stream derives from ITS
        OWN request seed (a [B] key batch into generate), so a sampled
        request's output is reproducible regardless of which other requests
        it was micro-batched with.  Cohorts larger than the biggest batch
        bucket are decoded in bucket-sized chunks."""
        import jax
        from taste_spokenlm_tpu.models.sampler import SamplerConfig
        from taste_spokenlm_tpu.models.taste import TasteForCausalLM
        self._get_tables()
        n_req = len(requests)
        cap = self.BATCH_BUCKETS[-1]
        if n_req > cap:
            out = []
            for i in range(0, n_req, cap):
                out.extend(self.complete_batch(requests[i:i + cap],
                                               sampler_kwargs, max_steps))
            return out
        bucket = self._bucket(max(len(r["llm_ids"]) for r in requests))
        nb = next((b for b in self.BATCH_BUCKETS if n_req <= b), cap)
        scfg = SamplerConfig(delay=self.config.spoken_lm.delay,
                             **sampler_kwargs)
        key = ("complete", bucket, nb, max_steps, scfg)
        if key not in self._jits:
            def fn(v_, rng, idx, ids, lens, words):
                return self.model.apply(
                    v_, rng, scfg, self._tables, idx, ids, lens, words,
                    "audio", max_steps,
                    method=TasteForCausalLM.generate_completion)
            self._jits[key] = jax.jit(fn)
        nq = self.config.audio_tower.quantizer.num_quantizers
        ids = np.zeros((nb, bucket), np.int32)
        words = np.zeros((nb, bucket), np.int32)
        lens = np.zeros((nb,), np.int32)
        idx = np.full((nb, bucket, nq), -1, np.int32)
        for i, r in enumerate(requests):
            row = list(r["llm_ids"])[:bucket]
            ids[i, :len(row)] = row
            words[i, :len(row)] = list(r["llm_word_ids"])[:bucket]
            lens[i] = len(row)
            ridx = np.asarray(r["llm_indices"], np.int32)[:bucket]
            idx[i, :len(ridx)] = ridx
        lens = np.maximum(lens, 1)  # pad rows decode a dummy 1-token prefix
        # [nb, 2] key batch: row i streams from its own request seed, with
        # the SAME host-built PRNGKey layout every other RPC uses
        # (_host_key), shipped with the dispatch
        rng = np.stack([self._host_key(r.get("seed", 0)) for r in requests]
                       + [self._host_key(0)] * (nb - n_req))
        out = self._jits[key](self.variables, rng, idx, ids, lens, words)
        out = {k: np.asarray(val) for k, val in out.items()}
        return [{k: val[i] for k, val in out.items()} for i in range(n_req)]


class CompleteBatcher:
    """Micro-batching front for `TasteEngine.complete_batch`: concurrent
    Complete requests that share a sampling config are gathered for up to
    `window_ms` (or until `max_batch`) and decoded in ONE batched generate
    call.  Counterpart of the reference runtime's one-request-at-a-time
    CosyVoice servers — a TPU-first throughput win."""

    def __init__(self, engine: TasteEngine, max_batch: int = 4,
                 window_ms: float = 5.0):
        self.engine = engine
        self.max_batch = max_batch
        self.window = window_ms / 1e3
        self._cv = threading.Condition()
        self._queue: list = []   # (group_key, request_dict, future)
        self._stopped = False
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def close(self, timeout: float = 5.0):
        """Stop the micro-batch loop thread (clean test/CI shutdown)."""
        with self._cv:
            self._stopped = True
            self._cv.notify_all()
        self._thread.join(timeout)

    def submit(self, llm_ids, llm_word_ids, llm_indices, sampler_kwargs,
               seed, max_steps: int = 128) -> "concurrent.futures.Future":
        fut: concurrent.futures.Future = concurrent.futures.Future()
        gk = (tuple(sorted(sampler_kwargs.items())), max_steps)
        req = dict(llm_ids=llm_ids, llm_word_ids=llm_word_ids,
                   llm_indices=llm_indices, seed=seed)
        with self._cv:
            self._queue.append((gk, req, fut))
            self._cv.notify()
        return fut

    def _loop(self):
        while True:
            with self._cv:
                while not self._queue and not self._stopped:
                    self._cv.wait()
                if self._stopped and not self._queue:
                    return
                deadline = time.perf_counter() + self.window
                while len(self._queue) < self.max_batch:
                    remaining = deadline - time.perf_counter()
                    if remaining <= 0:
                        break
                    self._cv.wait(remaining)
                gk = self._queue[0][0]
                batch = [q for q in self._queue if q[0] == gk][:self.max_batch]
                for q in batch:
                    self._queue.remove(q)
            try:
                results = self.engine.complete_batch(
                    [q[1] for q in batch], dict(gk[0]), gk[1])
                for (_, _, fut), res in zip(batch, results):
                    fut.set_result(res)
            except Exception as e:
                for _, _, fut in batch:
                    fut.set_exception(e)


def run_load_test(engine: TasteEngine, requests, sampler_kwargs,
                  max_steps: int = 8, max_batch: int = 8,
                  window_ms: float = 5.0) -> Dict[str, Any]:
    """Drive the micro-batcher with ALL `requests` submitted concurrently
    (one thread each) and report latency percentiles + aggregate decode
    throughput.  The reference's CosyVoice grpc runtime serves one request
    at a time and has no load story (runtime/python/grpc/) — this is the
    measured TPU serving counterpart.

    Returns {"n", "p50_ms", "p99_ms", "max_ms", "wall_s",
    "tokens_per_sec", "total_tokens"}.  Run once untimed first to warm the
    jit cache."""
    n = len(requests)
    batcher = CompleteBatcher(
        engine, max_batch=min(max_batch, TasteEngine.BATCH_BUCKETS[-1]),
        window_ms=window_ms)
    lat = [0.0] * n
    results: list = [None] * n

    def fire(i):
        r = requests[i]
        t0 = time.perf_counter()
        results[i] = batcher.submit(
            r["llm_ids"], r["llm_word_ids"], r["llm_indices"],
            sampler_kwargs, r.get("seed", 0), max_steps).result()
        lat[i] = time.perf_counter() - t0

    t_all = time.perf_counter()
    with concurrent.futures.ThreadPoolExecutor(n) as ex:
        list(ex.map(fire, range(n)))
    wall = time.perf_counter() - t_all
    batcher.close()
    total_tokens = sum(int(r["num_tokens"]) for r in results)
    lat_ms = sorted(x * 1e3 for x in lat)
    return {
        "n": n,
        "p50_ms": round(lat_ms[n // 2], 1),
        "p99_ms": round(lat_ms[min(n - 1, int(np.ceil(0.99 * n)) - 1)], 1),
        "max_ms": round(lat_ms[-1], 1),
        "wall_s": round(wall, 3),
        "total_tokens": total_tokens,
        "tokens_per_sec": round(total_tokens / max(wall, 1e-9), 1),
    }


# ---------------------------------------------------------------------------
# gRPC (generic handlers — no grpc_tools codegen needed)
# ---------------------------------------------------------------------------


def create_grpc_server(engine: TasteEngine, port: int = 50051,
                       max_workers: int = 4,
                       batcher: Optional[CompleteBatcher] = None):
    import grpc
    if batcher is None:
        # clamp to the largest decode batch bucket — complete_batch chunks
        # oversized cohorts anyway, but one bucket-sized micro-batch keeps
        # latency predictable
        batcher = CompleteBatcher(
            engine,
            max_batch=min(max_workers, TasteEngine.BATCH_BUCKETS[-1]))

    def Tokenize(request: pb.TokenizeRequest, context) -> pb.TokenizeResponse:
        mel = np.asarray(request.audio_features, np.float32).reshape(
            request.n_mels, request.n_frames)
        idx = engine.tokenize(mel, list(request.asr_token_ids),
                              list(request.asr_word_ids))
        return pb.TokenizeResponse(indices=idx.reshape(-1).tolist(),
                                   n_quantizers=idx.shape[-1])

    def Reconstruct(request: pb.ReconstructRequest, context
                    ) -> pb.ReconstructResponse:
        inp = request.inputs
        mel = np.asarray(inp.audio_features, np.float32).reshape(
            inp.n_mels, inp.n_frames)
        wav, sr, n_tokens, rtf = engine.reconstruct(
            mel, list(inp.asr_token_ids), list(inp.asr_word_ids),
            np.asarray(request.speaker_embedding, np.float32),
            request.max_speech_steps or 64, request.seed)
        pcm = (np.clip(wav, -1, 1) * 32767).astype("<i2").tobytes()
        return pb.ReconstructResponse(pcm16=pcm, sample_rate=sr,
                                      num_speech_tokens=n_tokens, rtf=rtf)

    def Complete(request: pb.CompleteRequest, context) -> pb.CompleteResponse:
        nq = engine.config.audio_tower.quantizer.num_quantizers
        idx = np.asarray(request.llm_indices, np.int32).reshape(-1, nq)
        out = batcher.submit(
            list(request.llm_token_ids), list(request.llm_word_ids), idx,
            dict(extra_words=request.extra_words or 8,
                 text_top_p=request.text_top_p,
                 taste_top_p=request.taste_top_p,
                 text_temperature=request.temperature or 1.0,
                 repetition_penalty=request.repetition_penalty or 1.0),
            request.seed).result()
        n = int(out["num_tokens"])
        nt = int(out["num_taste_words"])
        return pb.CompleteResponse(
            token_ids=out["llm_token_ids"][:n].tolist(),
            word_ids=out["llm_word_ids"][:n].tolist(),
            taste_indices=out["taste_indices"][:nt].reshape(-1).tolist(),
            num_taste_words=nt)

    def Synthesize(request: pb.SynthesizeRequest, context):
        """Server-streaming: PCM chunks as the chunked decode + windowed
        vocoder produce them (the reference runtime returns only whole
        utterances, cosyvoice.proto Inference)."""
        sr = engine.config.hift.sampling_rate
        for wav, is_last, n_new in engine.synthesize_stream(
                list(request.taste_indices), list(request.asr_token_ids),
                list(request.asr_word_ids),
                np.asarray(request.speaker_embedding, np.float32),
                max_steps=request.max_speech_steps or 128,
                chunk_tokens=request.chunk_tokens or 50,
                seed=request.seed):
            pcm = (np.clip(wav, -1, 1) * 32767).astype("<i2").tobytes()
            yield pb.SynthesizeChunk(pcm16=pcm, sample_rate=sr,
                                     is_last=is_last, num_tokens=n_new)

    def CompleteStream(request: pb.CompleteStreamRequest, context):
        """Server-streaming PIPELINED completion: the joint text+taste
        decode and the chunked synthesis run interleaved, so the first PCM
        chunk leaves after only a partial joint decode (the reference
        pipeline is strictly decode-everything-then-synthesize,
        modeling_taste.py:1663-1791)."""
        c = request.complete
        nq = engine.config.audio_tower.quantizer.num_quantizers
        idx = np.asarray(c.llm_indices, np.int32).reshape(-1, nq)
        sr = engine.config.hift.sampling_rate
        for wav, is_last, n_new, n_words in engine.complete_stream(
                list(c.llm_token_ids), list(c.llm_word_ids), idx,
                list(request.asr_token_ids), list(request.asr_word_ids),
                np.asarray(request.speaker_embedding, np.float32),
                dict(extra_words=c.extra_words or 8,
                     text_top_p=c.text_top_p, taste_top_p=c.taste_top_p,
                     text_temperature=c.temperature or 1.0,
                     repetition_penalty=c.repetition_penalty or 1.0),
                c.seed, max_steps=request.max_steps or 64,
                max_speech_steps=request.max_speech_steps or 128,
                chunk_tokens=request.chunk_tokens or 50,
                first_chunk_tokens=request.first_chunk_tokens or 16,
                jd_first_chunk=request.jd_first_chunk or 16):
            pcm = (np.clip(wav, -1, 1) * 32767).astype("<i2").tobytes()
            yield pb.SynthesizeChunk(pcm16=pcm, sample_rate=sr,
                                     is_last=is_last, num_tokens=n_new,
                                     n_words=n_words)

    handlers = {
        "CompleteStream": grpc.unary_stream_rpc_method_handler(
            CompleteStream,
            request_deserializer=pb.CompleteStreamRequest.FromString,
            response_serializer=pb.SynthesizeChunk.SerializeToString),
        "Synthesize": grpc.unary_stream_rpc_method_handler(
            Synthesize, request_deserializer=pb.SynthesizeRequest.FromString,
            response_serializer=pb.SynthesizeChunk.SerializeToString),
        "Tokenize": grpc.unary_unary_rpc_method_handler(
            Tokenize, request_deserializer=pb.TokenizeRequest.FromString,
            response_serializer=pb.TokenizeResponse.SerializeToString),
        "Reconstruct": grpc.unary_unary_rpc_method_handler(
            Reconstruct, request_deserializer=pb.ReconstructRequest.FromString,
            response_serializer=pb.ReconstructResponse.SerializeToString),
        "Complete": grpc.unary_unary_rpc_method_handler(
            Complete, request_deserializer=pb.CompleteRequest.FromString,
            response_serializer=pb.CompleteResponse.SerializeToString),
    }
    server = grpc.server(
        concurrent.futures.ThreadPoolExecutor(max_workers=max_workers))
    server.add_generic_rpc_handlers((grpc.method_handlers_generic_handler(
        "taste_serving.Taste", handlers),))
    bound = server.add_insecure_port(f"[::]:{port}")
    return server, bound


# ---------------------------------------------------------------------------
# HTTP (fastapi-equivalent, stdlib only)
# ---------------------------------------------------------------------------


def create_http_server(engine: TasteEngine, port: int = 8080):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):
            pass

        def _json(self, code: int, payload: Dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._json(200, {"status": "ok"})
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n))
                if self.path == "/tokenize":
                    mel = np.asarray(req["audio_features"], np.float32)
                    idx = engine.tokenize(mel, req["asr_token_ids"],
                                          req["asr_word_ids"])
                    self._json(200, {"indices": idx.tolist()})
                elif self.path == "/reconstruct":
                    mel = np.asarray(req["audio_features"], np.float32)
                    wav, sr, n_tok, rtf = engine.reconstruct(
                        mel, req["asr_token_ids"], req["asr_word_ids"],
                        np.asarray(req["speaker_embedding"], np.float32),
                        req.get("max_speech_steps", 64), req.get("seed", 0))
                    import base64
                    pcm = (np.clip(wav, -1, 1) * 32767).astype("<i2").tobytes()
                    self._json(200, {"pcm16_b64": base64.b64encode(pcm).decode(),
                                     "sample_rate": sr,
                                     "num_speech_tokens": n_tok, "rtf": rtf})
                else:
                    self._json(404, {"error": "not found"})
            except Exception as e:  # surfaced to the client
                self._json(500, {"error": str(e)})

    server = ThreadingHTTPServer(("0.0.0.0", port), Handler)
    return server
