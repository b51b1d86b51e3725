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


@dataclass
class StreamingSynthesizer:
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

    def _jit(self, name, fn):
        if name not in self._jits:
            import jax
            self._jits[name] = jax.jit(fn)
        return self._jits[name]

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
        ct, lc = self.chunk_tokens, self.left_ctx_tokens
        fc = min(self.first_chunk_tokens or ct, ct)
        window = ct + lc
        mpt = mel_per_token(model.config.flow)
        mel_window_max = int(np.ceil(window * mpt)) + 4
        # the first window has no left context (ws = 0), so it only needs
        # to cover the first chunk itself — a small fc shrinks both the AR
        # step count and the first flow/HiFT window
        mel_window_first = int(np.ceil(fc * mpt)) + 4

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

        b = np.asarray(speaker_embeds).shape[0]
        cf = self.crossfade_tokens
        held: Optional[np.ndarray] = None   # audio of tokens [s-cf, s) from
        #                                     the PREVIOUS window (not yet
        #                                     emitted; blends with the next
        #                                     window's rendition of the same
        #                                     tokens — overlap-and-hold)
        s = 0                               # tokens emitted so far
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
                if held is not None:     # flush the held seam audio
                    yield {"wav": held, "tokens": tokens, "n_new": 0,
                           "is_last": True}
                    held = None
                if last:
                    break
                continue
            e = s + n_new
            ws = max(0, s - lc)
            wav = np.asarray(host["wav"], np.float32)
            # samples per mel frame from the vocoder output itself (HiFT
            # upsample factor is config-dependent)
            spf = wav.shape[1] // (mel_window_first if k == 0
                                   else mel_window_max)

            def off(tok):   # sample offset of absolute token `tok` in window
                return int(np.floor((tok - ws) * mpt)) * spf

            hold_from = e if last else max(e - cf, s)
            if held is None:
                out = wav[:, :off(hold_from)] if s == 0 else \
                    wav[:, off(s):off(hold_from)]
            else:
                # emit from s-cf: head re-vocoded by THIS window, blended
                # equal-power against the held audio from the previous one
                emit_from = off(max(s - cf, 0))
                out = wav[:, emit_from:off(hold_from)].copy()
                n_x = min(held.shape[1], out.shape[1])
                if n_x > 0:
                    t = np.linspace(0.0, np.pi / 2, n_x, dtype=np.float32)
                    out[:, :n_x] = (held[:, -n_x:] * np.cos(t) ** 2
                                    + out[:, :n_x] * np.sin(t) ** 2)
            held = (None if last
                    else wav[:, off(hold_from):off(e)])
            yield {"wav": out, "tokens": tokens, "n_new": n_new,
                   "is_last": last}
            s = e
            if last:
                break

    # ------------------------------------------------------------------

    def synthesize(self, rng, speaker_embeds, taste_indices_per_word,
                   asr_token_ids, asr_token_lengths, asr_word_ids
                   ) -> Tuple[np.ndarray, float]:
        """Run the full stream and return (wav [B, total], ttfa_seconds) —
        ttfa is the wall time until the FIRST chunk's audio is on the
        host."""
        import time
        t0 = time.perf_counter()
        ttfa = None
        parts = []
        for out in self.stream(rng, speaker_embeds, taste_indices_per_word,
                               asr_token_ids, asr_token_lengths,
                               asr_word_ids):
            if ttfa is None:
                ttfa = time.perf_counter() - t0
            parts.append(out["wav"])
        if not parts:
            return np.zeros((np.asarray(speaker_embeds).shape[0], 0),
                            np.float32), 0.0
        return np.concatenate(parts, axis=1), float(ttfa)
