"""Streaming synthesis: chunked S3 decode -> windowed flow+HiFT -> wav
chunks with crossfaded seams.

The reference pipeline is strictly non-streaming (inference_completion
decodes every S3 token, flows the whole mel, then vocodes,
modeling_taste.py:1742-1791 — its conformer carries chunk machinery,
cosyvoice/encoder.py:183-271, but nothing drives it end to end).  Here the
first ~1 s of audio leaves the device after:

    prefill + chunk_tokens AR steps + one small flow/HiFT window

instead of after the full decode + full synthesis — a ~2-4x TTFA cut.

Design (TPU-first):
* the AR decoder's stream state is a functional pytree
  (models/speech_decoder.generate_stream_init/_chunk); the chunked
  trajectory is BIT-IDENTICAL to the one-shot decode on the same key;
* every jitted callable has a fixed shape: the decode chunk is
  `chunk_tokens` steps, the vocoder window is `left_ctx + chunk` tokens
  (first window smaller shapes are padded into the same bucket), so the
  whole stream hits exactly three compiled programs after warmup;
* the flow U-Net is non-causal, so chunk k is vocoded over a window with
  `left_ctx` tokens of context; the seam between consecutive wav chunks is
  blended with a short equal-power crossfade.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Iterator, Optional, Tuple

import numpy as np

MEL_FRAME_RATE = 22050.0 / 256.0   # flow mel geometry (flow.py:331-335)


def mel_per_token(flow_cfg) -> float:
    """Mel frames per S3 token: (22050/256) / input_frame_rate."""
    return MEL_FRAME_RATE / flow_cfg.input_frame_rate


class _SeamEmitter:
    """Host-side seam bookkeeping shared by the streaming paths: each
    vocoded window re-renders `left_ctx` tokens of context, the last
    `crossfade` tokens of the previous emission are held back and blended
    equal-power against the new window's rendition of the same tokens."""

    def __init__(self, mpt: float, left_ctx: int, crossfade: int):
        self.mpt, self.lc, self.cf = mpt, left_ctx, crossfade
        self.held: Optional[np.ndarray] = None
        self.s = 0                      # tokens emitted so far

    def flush(self) -> Optional[np.ndarray]:
        held, self.held = self.held, None
        return held

    def emit(self, wav: np.ndarray, n_new: int, mel_window: int,
             last: bool) -> np.ndarray:
        """wav: the vocoded window covering tokens [ws, s+n_new).  Returns
        the audio to emit for this chunk (crossfaded against held seam
        audio); holds back the tail unless `last`."""
        s, lc, cf, mpt = self.s, self.lc, self.cf, self.mpt
        e = s + n_new
        ws = max(0, s - lc)
        # samples per mel frame from the vocoder output itself (HiFT
        # upsample factor is config-dependent)
        spf = wav.shape[1] // mel_window

        def off(tok):   # sample offset of absolute token `tok` in window
            return int(np.floor((tok - ws) * mpt)) * spf

        hold_from = e if last else max(e - cf, s)
        if self.held is None:
            out = wav[:, :off(hold_from)] if s == 0 else \
                wav[:, off(s):off(hold_from)]
        else:
            # emit from s-cf: head re-vocoded by THIS window, blended
            # equal-power against the held audio from the previous one
            emit_from = off(max(s - cf, 0))
            out = wav[:, emit_from:off(hold_from)].copy()
            n_x = min(self.held.shape[1], out.shape[1])
            if n_x > 0:
                t = np.linspace(0.0, np.pi / 2, n_x, dtype=np.float32)
                out[:, :n_x] = (self.held[:, -n_x:] * np.cos(t) ** 2
                                + out[:, :n_x] * np.sin(t) ** 2)
        self.held = None if last else wav[:, off(hold_from):off(e)]
        self.s = e
        return out


class _StreamBase:
    """Shared infrastructure for the streaming paths (method-only mixin —
    the subclasses declare their own dataclass fields so their positional
    constructor signatures stay stable): jit memoization, the chunk/window
    geometry, and the drain-the-stream `synthesize` wrapper."""

    def _jit(self, name, fn):
        if name not in self._jits:
            import jax
            self._jits[name] = jax.jit(fn)
        return self._jits[name]

    def _sched(self):
        """Steady-state chunk sizes.  `chunk_schedule` enables ADAPTIVE
        CHUNK GROWTH: chunk k (after the first) is schedule[min(k, last)],
        so the stream starts with small windows (low TTFA) and grows them
        once audio is already playing — each flow/HiFT window carries fixed
        U-Net latency (single-digit MFU at these shapes, BENCH stage
        report), so fewer+bigger windows cut e2e wall without touching
        first-audio latency.  One compiled program per distinct size."""
        if getattr(self, "chunk_schedule", None):
            return tuple(int(c) for c in self.chunk_schedule)
        return (self.chunk_tokens,)

    def _chunk_for(self, j: int) -> int:
        """Chunk size for steady-state chunk index j (0-based)."""
        s = self._sched()
        return s[min(j, len(s) - 1)]

    def _geometry(self, fc: int):
        """(first chunk, left_ctx, mel-per-token, first mel window,
        max schedule chunk).  The first window has no left context
        (ws = 0), so it only needs to cover the first chunk itself — a
        small fc shrinks both the AR step count and the first flow/HiFT
        window."""
        lc = self.left_ctx_tokens
        mpt = mel_per_token(self.model.config.flow)
        mel_window_first = int(np.ceil(fc * mpt)) + 4
        return fc, lc, mpt, mel_window_first, max(self._sched())

    def _mel_window(self, chunk: int, mpt: float) -> int:
        return int(np.ceil((chunk + self.left_ctx_tokens) * mpt)) + 4

    def synthesize(self, rng, speaker_embeds, *args, **kwargs
                   ) -> Tuple[np.ndarray, float]:
        """Run the full stream and return (wav [B, total], ttfa_seconds) —
        ttfa is the wall time until the FIRST chunk's audio is on the
        host."""
        import time
        t0 = time.perf_counter()
        ttfa = None
        parts = []
        for out in self.stream(rng, speaker_embeds, *args, **kwargs):
            if ttfa is None:
                ttfa = time.perf_counter() - t0
            parts.append(out["wav"])
        if not parts:
            return np.zeros((np.asarray(speaker_embeds).shape[0], 0),
                            np.float32), 0.0
        return np.concatenate(parts, axis=1), float(ttfa)


@dataclass
class StreamingSynthesizer(_StreamBase):
    model: Any
    variables: Any
    chunk_tokens: int = 50          # ~1 s of new audio per chunk
    left_ctx_tokens: int = 25       # flow context re-vocoded, not emitted
    crossfade_tokens: int = 2       # seam blend length (~18 ms) — audio from
                                    # the context re-vocode blends into the
                                    # new chunk's head
    first_chunk_tokens: Optional[int] = None   # smaller first chunk (fewer
                                    # AR steps + a smaller first flow/HiFT
                                    # window) cuts TTFA; None = chunk_tokens
    chunk_schedule: Optional[Tuple[int, ...]] = None  # adaptive growth:
                                    # chunk k uses schedule[min(k, last)];
                                    # None = constant chunk_tokens
    max_speech_steps: int = 512
    _jits: Dict = field(default_factory=dict)

    # ------------------------------------------------------------------

    def stream(
        self, rng, speaker_embeds, taste_indices_per_word, asr_token_ids,
        asr_token_lengths, asr_word_ids,
    ) -> Iterator[Dict[str, np.ndarray]]:
        """Yields dicts: {"wav": [B, n] float32 chunk, "tokens": [B, c],
        "n_new": int new S3 tokens this chunk, "is_last": bool}.  B=1
        intended (per-request streaming)."""
        import jax
        from taste_spokenlm_tpu.models.taste import TasteForCausalLM

        model, variables = self.model, self.variables
        sched = self._sched()
        fc = min(self.first_chunk_tokens or sched[0], sched[0])
        fc, lc, mpt, mel_window_first, max_chunk = self._geometry(fc)

        # a handful of compiled programs, ONE dispatch per chunk: the first
        # fuses init + decode chunk + window vocode (TTFA = a single
        # launch), the steady-state ones (one per schedule size) fuse
        # decode chunk + window vocode with the token history carried
        # on-device.  ALL key derivation (the vocoder stream rng_voc =
        # fold_in(rng, 7919), folded per chunk) happens INSIDE the
        # compiled programs: an eager split/fold_in outside would each
        # dispatch a tiny program over the remote tunnel (~30 ms apiece,
        # CLAUDE.md) — several of them cost more than the fused chunk
        # itself.  Derivation mirrors the host math exactly, so
        # trajectories are unchanged.
        start = self._jit(
            "start", lambda v, r, spk, taste, ids, lens, words:
            model.apply(v, r,
                        jax.random.fold_in(jax.random.fold_in(r, 7919), 0),
                        spk, taste, ids, lens, words,
                        self.max_speech_steps, fc, fc, mel_window_first,
                        max_chunk,
                        method=TasteForCausalLM.stream_start_step))

        def make_step(c):
            mw = self._mel_window(c, mpt)
            return self._jit(
                f"step:{c}", lambda v, st, r, k, spk, hist, hl:
                model.apply(v, st,
                            jax.random.fold_in(jax.random.fold_in(r, 7919),
                                               k),
                            spk, hist, hl, c, c + lc, mw,
                            method=TasteForCausalLM.stream_step))

        rng = jax.random.PRNGKey(0) if rng is None else rng

        emitter = _SeamEmitter(mpt, lc, self.crossfade_tokens)
        chunks = [fc]
        while sum(chunks) < self.max_speech_steps:
            chunks.append(self._chunk_for(len(chunks) - 1))
        n_chunks = len(chunks)
        out_k = state = None
        for k in range(n_chunks):
            if k == 0:
                out_k = start(variables, rng, speaker_embeds,
                              taste_indices_per_word,
                              asr_token_ids, asr_token_lengths, asr_word_ids)
            else:
                out_k = make_step(chunks[k])(
                    variables, state, rng, k, speaker_embeds,
                    out_k["token_hist"], out_k["hist_len"])
            state = out_k["state"]
            # ONE host transfer for every per-chunk output: separate
            # np.asarray/int()/bool() readbacks each pay the remote-tunnel
            # round trip (~30 ms, CLAUDE.md) — 4 of them cost more than the
            # fused chunk program itself
            host = jax.device_get({key: out_k[key] for key in
                                   ("tokens", "n_new", "done", "wav")})
            tokens = host["tokens"]                          # [B, ct]
            n_new = int(host["n_new"])
            done = bool(host["done"].all())
            last = done or k == n_chunks - 1
            if n_new == 0:
                held = emitter.flush()
                if held is not None:     # flush the held seam audio
                    yield {"wav": held, "tokens": tokens, "n_new": 0,
                           "is_last": True}
                if last:
                    break
                continue
            wav = np.asarray(host["wav"], np.float32)
            out = emitter.emit(
                wav, n_new,
                mel_window_first if k == 0
                else self._mel_window(chunks[k], mpt), last)
            yield {"wav": out, "tokens": tokens, "n_new": n_new,
                   "is_last": last}
            if last:
                break


@dataclass
class CompletionStreamer(_StreamBase):
    """PIPELINED completion: first audio after a partial joint decode.

    The non-streaming completion path (and the reference's,
    modeling_taste.py:1663-1791) is strictly sequential: decode EVERY
    text+taste token, then synthesize.  Here the joint LM decodes a first
    small chunk (`jd_first_chunk` steps ~ a few words), synthesis starts
    from those words immediately, and while the audio plays the joint
    decode continues; each time more words arrive the S3 decoder
    re-contextualizes via `stream_extend_step` (new text prefill + one
    multi-token cached replay of the committed speech history — committed
    audio is never re-rendered, only re-contextualized).

    TTFA = jd prefill + jd_first_chunk AR steps + S3 prefill +
    first_chunk_tokens AR steps + one small flow/HiFT window — instead of
    the full joint decode + the full synthesis.

    Chunked-TTS caveat (standard for incremental synthesis): speech tokens
    decoded against a text PREFIX are committed; with sensible chunk sizes
    the text runs far ahead of the audio (16 text tokens ~ 8 words ~ 2-4 s
    of speech vs ~1 s per synth chunk), so only the first chunk is
    prefix-conditioned in practice.

    Host-side text mapping: the caller provides FULL-BUDGET asr buffers
    (`asr_token_ids`/`asr_word_ids`, fixed shape) that the host tokenizer
    fills as words decode; per-phase validity is communicated through
    lengths only, so no program recompiles during a stream.
    """

    model: Any
    variables: Any
    sampler_cfg: Any
    tables: Any
    chunk_tokens: int = 50
    left_ctx_tokens: int = 25
    crossfade_tokens: int = 2
    first_chunk_tokens: int = 16
    chunk_schedule: Optional[Tuple[int, ...]] = None  # adaptive growth
    jd_first_chunk: int = 16        # joint-decode steps before first audio
    jd_chunk: int = 24              # joint-decode steps per later phase
    min_start_words: int = 2        # words needed before synthesis starts
    max_speech_steps: int = 512
    conditional_mode: str = "audio"
    _jits: Dict = field(default_factory=dict)

    def stream(
        self, rng, speaker_embeds,
        llm_indices, llm_token_ids, llm_token_lengths, llm_word_ids,
        asr_token_ids, asr_word_ids, max_steps: int = 64,
        asr_valid_len: Optional[int] = None,
    ) -> Iterator[Dict[str, np.ndarray]]:
        """Yields the same chunk dicts as StreamingSynthesizer.stream plus
        jd bookkeeping ({"jd_done": bool, "n_words": int}).  B=1 intended
        (per-request streaming).  `asr_valid_len` bounds the real (non-pad)
        asr positions; pad positions never count toward per-phase lengths
        even if their word id collides with a real word."""
        import jax
        from taste_spokenlm_tpu.models.taste import TasteForCausalLM

        model, variables = self.model, self.variables
        scfg, tables = self.sampler_cfg, self.tables
        sched = self._sched()
        fc = self.first_chunk_tokens
        fc, lc, mpt, mel_window_first, max_chunk = self._geometry(fc)

        # ALL key derivation (rng_jd/rng_syn = split(rng); rng_voc =
        # fold_in(rng_syn, 7919), folded per chunk) happens INSIDE the
        # compiled programs: eager split/fold_in outside would each
        # dispatch a tiny program over the remote tunnel (~30 ms apiece,
        # CLAUDE.md) — on the TTFA path they cost more than the decode
        # itself.  Derivation mirrors the previous host math exactly, so
        # trajectories are unchanged.
        def _keys(r):
            rj, rs = jax.random.split(r)
            return rj, rs, jax.random.fold_in(rs, 7919)

        jd_step = self._jit(
            "jd_step", lambda v, st:
            model.apply(v, st, scfg, tables, self.jd_chunk,
                        method=TasteForCausalLM.completion_stream_chunk))

        def _syn_start(v, r, spk, taste, ids, lens, words):
            _, rs, rv = _keys(r)
            return model.apply(v, rs, jax.random.fold_in(rv, 0), spk, taste,
                               ids, lens, words,
                               self.max_speech_steps, fc, fc,
                               mel_window_first, max_chunk,
                               method=TasteForCausalLM.stream_start_step)

        syn_start = self._jit("syn_start", _syn_start)

        def make_syn_extend(c):
            mw = self._mel_window(c, mpt)

            def _syn_extend(v, r, k, spk, taste, ids, lens, words, hist, hl):
                _, rs, rv = _keys(r)
                return model.apply(v, rs, jax.random.fold_in(rv, k), spk,
                                   taste, ids, lens, words, hist, hl,
                                   self.max_speech_steps, c, c + lc, mw,
                                   method=TasteForCausalLM.stream_extend_step)

            return self._jit(f"syn_extend:{c}", _syn_extend)

        def make_syn_step(c):
            mw = self._mel_window(c, mpt)

            def _syn_step(v, st, r, k, spk, hist, hl):
                return model.apply(v, st, jax.random.fold_in(_keys(r)[2], k),
                                   spk, hist, hl, c, c + lc, mw,
                                   method=TasteForCausalLM.stream_step)

            return self._jit(f"syn_step:{c}", _syn_step)

        # phases 1+2 in ONE dispatch (jd prefill + first jd chunk + S3
        # prefill + first AR chunk + first vocode window): the TTFA path
        # pays a single program launch + a single host readback instead of
        # four round trips.  Keyed by max_steps like jd_start.
        fused_start = self._jit(
            f"first_audio:{max_steps}",
            lambda v, r, ind, ids, lens, words, spk, aids, awords, avalid:
            model.apply(v, r, scfg, tables, ind, ids, lens, words, spk,
                        aids, awords, avalid, self.conditional_mode,
                        max_steps, self.jd_first_chunk,
                        self.max_speech_steps, fc, mel_window_first,
                        max_chunk,
                        method=TasteForCausalLM.completion_first_audio))

        rng = jax.random.PRNGKey(0) if rng is None else rng
        t_asr = asr_word_ids.shape[1]
        valid = np.arange(t_asr)[None, :] < (
            t_asr if asr_valid_len is None else asr_valid_len)
        asr_words_np = None    # host copy, fetched AFTER the first dispatch
                               # so the transfer overlaps device compute

        def asr_lens(n_words):
            # host numpy result: it ships WITH the next dispatch as a call
            # argument instead of paying its own eager device put
            return np.sum((asr_words_np < n_words) & valid,
                          axis=1).astype(np.int32)

        def jd_read(st):
            h = jax.device_get({k: st[k] for k in
                                ("n_taste", "word_id_cur", "done", "step",
                                 "out_taste")})
            words = int(min(h["n_taste"][0], max(h["word_id_cur"][0], 0)))
            done = bool(h["done"].all()) or int(h["step"]) >= max_steps
            # complete words only while decoding; once done, every sampled
            # taste word is final
            return (int(h["n_taste"][0]) if done else words), done, \
                np.maximum(h["out_taste"], 0)

        # ---- phases 1+2 fused: first audio in ONE dispatch ----
        out0 = fused_start(variables, rng, llm_indices, llm_token_ids,
                           llm_token_lengths, llm_word_ids, speaker_embeds,
                           asr_token_ids, asr_word_ids, valid)
        jd_state = out0["jd_state"]
        asr_words_np = np.asarray(asr_word_ids)   # overlaps the dispatch
        syn_keys = ("tokens", "n_new", "done", "wav")
        first = jax.device_get({"n_words": out0["n_words"],
                                "jd_done": out0["jd_done"],
                                **{k: out0["syn"][k] for k in syn_keys}})
        n_words, jd_done = int(first["n_words"]), bool(first["jd_done"])
        pending_host = None
        if n_words >= self.min_start_words or jd_done:
            if n_words == 0:
                return     # degenerate: nothing to synthesize
            out_k = out0["syn"]
            pending_host = {k: first[k] for k in syn_keys}
        else:
            # the first jd chunk produced too few words: DISCARD the fused
            # call's synthesis, poll jd chunks until min_start_words, then
            # prefill from the accumulated words (rare with sensible
            # jd_first_chunk ~16 tokens vs min_start_words ~2)
            while True:
                jd_state = jd_step(variables, jd_state)
                n_words, jd_done, taste = jd_read(jd_state)
                if jd_done or n_words >= self.min_start_words:
                    break
            if n_words == 0:
                return     # degenerate: nothing to synthesize
            out_k = syn_start(variables, rng, speaker_embeds, taste,
                              asr_token_ids, asr_lens(n_words), asr_word_ids)

        emitter = _SeamEmitter(mpt, lc, self.crossfade_tokens)
        words_synth = n_words   # words the current S3 prefill has seen

        # ---- dispatch-pipelined steady state (VERDICT r4 #9) ----
        # Dispatches are async: each loop turn (a) reads THIS synth chunk
        # (blocking host readback), (b) harvests the jd chunk that computed
        # on-device WHILE the host was reading/emitting, (c) dispatches the
        # next synth chunk and, queued right behind it, the next jd chunk.
        # The device therefore runs synth->jd back-to-back with no host gap
        # in between, and every tunnel round trip overlaps jd compute —
        # the synthesis consumes words one jd chunk stale, which the
        # chunked-TTS commit contract already permits (text outruns audio).
        jd_pending = None
        if not jd_done:
            jd_pending = jd_step(variables, jd_state)

        max_chunks = 2 + int(np.ceil(self.max_speech_steps / min(sched))) \
            + int(np.ceil(max_steps / self.jd_chunk))
        cur_mel_window = mel_window_first   # window of the chunk being read
        j = 0                               # steady-state chunks issued
        for k in range(max_chunks):
            if pending_host is not None:
                host, pending_host = pending_host, None
            else:
                host = jax.device_get({key: out_k[key] for key in syn_keys})
            n_new = int(host["n_new"])
            syn_done = bool(host["done"].all())
            final_text = jd_done and words_synth >= n_words
            last = (syn_done and final_text) or \
                emitter.s + n_new >= self.max_speech_steps
            if n_new > 0:
                wav = np.asarray(host["wav"], np.float32)
                out = emitter.emit(wav, n_new, cur_mel_window, last)
                yield {"wav": out, "tokens": host["tokens"], "n_new": n_new,
                       "is_last": last, "jd_done": jd_done,
                       "n_words": n_words}
            elif last:
                held = emitter.flush()
                if held is not None:
                    yield {"wav": held, "tokens": host["tokens"], "n_new": 0,
                           "is_last": True, "jd_done": jd_done,
                           "n_words": n_words}
            if last:
                break
            # harvest the jd chunk that overlapped the readback above
            if jd_pending is not None:
                jd_state, jd_pending = jd_pending, None
                n_words, jd_done, taste = jd_read(jd_state)
            c_next = self._chunk_for(j)
            if n_words > words_synth:
                # new words: re-contextualize (extend prefill + replay)
                out_k = make_syn_extend(c_next)(
                    variables, rng, k + 1, speaker_embeds, taste,
                    asr_token_ids, asr_lens(n_words), asr_word_ids,
                    out_k["token_hist"], out_k["hist_len"])
                words_synth = n_words
                cur_mel_window = self._mel_window(c_next, mpt)
                j += 1
            elif syn_done:
                # S3 decode drained the committed text and no new words
                # arrived this poll: only the joint decode advances — a
                # syn_step would pay a full flow+HiFT window vocode whose
                # output is discarded.  Zero n_new (host-side: device_get
                # passes numpy scalars through) so the already-emitted
                # chunk is not re-emitted at the next top-of-loop read.
                out_k = dict(out_k, n_new=np.int32(0))
            else:
                out_k = make_syn_step(c_next)(
                    variables, out_k["state"], rng, k + 1, speaker_embeds,
                    out_k["token_hist"], out_k["hist_len"])
                cur_mel_window = self._mel_window(c_next, mpt)
                j += 1
            # queue the next jd chunk BEHIND the synth dispatch: it runs
            # while the host blocks on the synth readback next turn
            if not jd_done:
                jd_pending = jd_step(variables, jd_state)

