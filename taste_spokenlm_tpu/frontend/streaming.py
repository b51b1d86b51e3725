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

    def _geometry(self, fc: int):
        """(chunk, left_ctx, window, mel-per-token, max mel window,
        first mel window).  The first window has no left context (ws = 0),
        so it only needs to cover the first chunk itself — a small fc
        shrinks both the AR step count and the first flow/HiFT window."""
        ct, lc = self.chunk_tokens, self.left_ctx_tokens
        window = ct + lc
        mpt = mel_per_token(self.model.config.flow)
        mel_window_max = int(np.ceil(window * mpt)) + 4
        mel_window_first = int(np.ceil(fc * mpt)) + 4
        return ct, lc, window, mpt, mel_window_max, mel_window_first

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
        fc = min(self.first_chunk_tokens or self.chunk_tokens,
                 self.chunk_tokens)
        (ct, lc, window, mpt,
         mel_window_max, mel_window_first) = self._geometry(fc)

        # two compiled programs, ONE dispatch per chunk: the first fuses
        # init + decode chunk + window vocode (TTFA = a single launch), the
        # steady-state one fuses decode chunk + window vocode with the token
        # history carried on-device
        start = self._jit(
            "start", lambda v, r, rv, spk, taste, ids, lens, words:
            model.apply(v, r, rv, spk, taste, ids, lens, words,
                        self.max_speech_steps, fc, fc, mel_window_first,
                        ct,
                        method=TasteForCausalLM.stream_start_step))
        step = self._jit(
            "step", lambda v, st, rv, spk, hist, hl:
            model.apply(v, st, rv, spk, hist, hl, ct, window, mel_window_max,
                        method=TasteForCausalLM.stream_step))

        rng = jax.random.PRNGKey(0) if rng is None else rng
        # stream_synth_init splits rng exactly like synthesize_from_taste,
        # so the chunked decode trajectory matches the one-shot path on the
        # same key; window vocoding draws fresh CFM noise per chunk
        rng_voc = jax.random.fold_in(rng, 7919)

        emitter = _SeamEmitter(mpt, lc, self.crossfade_tokens)
        n_chunks = 1 + int(np.ceil(max(0, self.max_speech_steps - fc) / ct))
        out_k = state = None
        for k in range(n_chunks):
            if k == 0:
                out_k = start(variables, rng, jax.random.fold_in(rng_voc, 0),
                              speaker_embeds, taste_indices_per_word,
                              asr_token_ids, asr_token_lengths, asr_word_ids)
            else:
                out_k = step(variables, state,
                             jax.random.fold_in(rng_voc, k), speaker_embeds,
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
            out = emitter.emit(wav, n_new,
                               mel_window_first if k == 0 else mel_window_max,
                               last)
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
        import jax.numpy as jnp
        from taste_spokenlm_tpu.models.taste import TasteForCausalLM

        model, variables = self.model, self.variables
        scfg, tables = self.sampler_cfg, self.tables
        fc = self.first_chunk_tokens
        (ct, lc, window, mpt,
         mel_window_max, mel_window_first) = self._geometry(fc)

        # keyed by max_steps: it is a CALL argument baked into the compiled
        # decode budget — a name-only memo would silently reuse the first
        # call's budget (and hang phase 1 when the new budget is larger)
        jd_start = self._jit(
            f"jd_start:{max_steps}", lambda v, r, ind, ids, lens, words:
            model.apply(v, r, scfg, tables, ind, ids, lens, words,
                        self.conditional_mode, max_steps, self.jd_first_chunk,
                        method=TasteForCausalLM.completion_stream_start))
        jd_step = self._jit(
            "jd_step", lambda v, st:
            model.apply(v, st, scfg, tables, self.jd_chunk,
                        method=TasteForCausalLM.completion_stream_chunk))
        syn_start = self._jit(
            "syn_start", lambda v, r, rv, spk, taste, ids, lens, words:
            model.apply(v, r, rv, spk, taste, ids, lens, words,
                        self.max_speech_steps, fc, fc, mel_window_first, ct,
                        method=TasteForCausalLM.stream_start_step))
        syn_extend = self._jit(
            "syn_extend", lambda v, r, rv, spk, taste, ids, lens, words,
            hist, hl:
            model.apply(v, r, rv, spk, taste, ids, lens, words, hist, hl,
                        self.max_speech_steps, ct, window, mel_window_max,
                        method=TasteForCausalLM.stream_extend_step))
        syn_step = self._jit(
            "syn_step", lambda v, st, rv, spk, hist, hl:
            model.apply(v, st, rv, spk, hist, hl, ct, window, mel_window_max,
                        method=TasteForCausalLM.stream_step))

        rng = jax.random.PRNGKey(0) if rng is None else rng
        rng_jd, rng_syn = jax.random.split(rng)
        rng_voc = jax.random.fold_in(rng_syn, 7919)
        b = np.asarray(speaker_embeds).shape[0]
        asr_words_np = np.asarray(asr_word_ids)
        valid = np.arange(asr_words_np.shape[1])[None, :] < (
            asr_words_np.shape[1] if asr_valid_len is None else asr_valid_len)

        def asr_lens(n_words):
            return jnp.asarray(
                np.sum((asr_words_np < n_words) & valid,
                       axis=1).astype(np.int32))

        # ---- phase 1: joint decode until enough words for first audio ----
        jd_state = jd_start(variables, rng_jd, llm_indices, llm_token_ids,
                            llm_token_lengths, llm_word_ids)

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

        n_words, jd_done, taste = jd_read(jd_state)
        while not jd_done and n_words < self.min_start_words:
            jd_state = jd_step(variables, jd_state)
            n_words, jd_done, taste = jd_read(jd_state)
        if n_words == 0:
            return     # degenerate: nothing to synthesize

        # ---- phase 2: first audio from the words decoded so far ----
        emitter = _SeamEmitter(mpt, lc, self.crossfade_tokens)
        taste_j = jnp.asarray(taste)
        out_k = syn_start(variables, rng_syn, jax.random.fold_in(rng_voc, 0),
                          speaker_embeds, taste_j, asr_token_ids,
                          asr_lens(n_words), asr_word_ids)
        words_synth = n_words   # words the current S3 prefill has seen

        max_chunks = 2 + int(np.ceil(self.max_speech_steps / ct)) \
            + int(np.ceil(max_steps / self.jd_chunk))
        for k in range(max_chunks):
            host = jax.device_get({key: out_k[key] for key in
                                   ("tokens", "n_new", "done", "wav")})
            n_new = int(host["n_new"])
            syn_done = bool(host["done"].all())
            final_text = jd_done and words_synth >= n_words
            last = (syn_done and final_text) or \
                emitter.s + n_new >= self.max_speech_steps
            if n_new > 0:
                wav = np.asarray(host["wav"], np.float32)
                out = emitter.emit(
                    wav, n_new,
                    mel_window_first if k == 0 else mel_window_max, last)
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
            # advance the joint decode one chunk per audio chunk (each
            # audio chunk is ~1 s; each jd chunk is a few hundred ms of
            # future text — text outruns audio quickly)
            if not jd_done:
                jd_state = jd_step(variables, jd_state)
                n_words, jd_done, taste = jd_read(jd_state)
            if n_words > words_synth:
                # new words: re-contextualize (extend prefill + replay)
                taste_j = jnp.asarray(taste)
                out_k = syn_extend(
                    variables, rng_syn, jax.random.fold_in(rng_voc, k + 1),
                    speaker_embeds, taste_j, asr_token_ids,
                    asr_lens(n_words), asr_word_ids,
                    out_k["token_hist"], out_k["hist_len"])
                words_synth = n_words
            elif syn_done:
                # S3 decode drained the committed text and no new words
                # arrived this poll: only the joint decode advances — a
                # syn_step would pay a full flow+HiFT window vocode whose
                # output is discarded.  Zero n_new so the already-emitted
                # chunk is not re-emitted at the next top-of-loop read.
                out_k = dict(out_k, n_new=jnp.zeros_like(out_k["n_new"]))
            else:
                out_k = syn_step(variables, out_k["state"],
                                 jax.random.fold_in(rng_voc, k + 1),
                                 speaker_embeds, out_k["token_hist"],
                                 out_k["hist_len"])

