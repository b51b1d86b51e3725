"""Joint text+taste decode controller as pure, branchless token-level state.

Re-expression of the reference's Python-object TasteSampler state machine
(/root/reference/taste_speech/modules_taste/sampler.py:10-188) for
`lax.while_loop` decoding (SURVEY.md §7 step 6 "hard part"):

* vocabulary scans (word-start / banned / sentence-end token sets) become
  precomputed bool tables [V] built once on the host from the tokenizer;
* the countdown / wait-for-taste / terminate logic becomes a small integer
  state updated with jnp.where;
* actions are returned as flags instead of strings.

Both word-level and token-level delay are supported (token level via the
rolling word-start history), plus the instruct-mode stop-id termination.
"""

from __future__ import annotations

import re
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from taste_spokenlm_tpu.ops.sampling import (NEG_INF, apply_repetition_penalty,
                                             mask_top_p, temperature_scale)

IGNORE_ID = -1


def build_sampler_tables(llm_tokenizer, vocab_size: int):
    """Host-side vocabulary scans (sampler.py:31-58).

    Returns dict of bool np arrays: word_start [V], banned [V],
    sentence_end [V].
    """
    word_start = np.zeros(vocab_size, bool)
    banned = np.zeros(vocab_size, bool)
    sentence_end = np.zeros(vocab_size, bool)
    for i in range(vocab_size):
        sub = llm_tokenizer.decode(i)
        if i >= 128000:
            word_start[i] = True
        elif len(sub) > 0 and sub[0] == " ":
            word_start[i] = True
        if "." in sub:
            sentence_end[i] = True
        if sub != ".":
            if not re.search(r"[.,'a-zA-Z0-9]", sub):
                banned[i] = True
            elif "\n" in sub:
                banned[i] = True
    if vocab_size > 128001:
        banned[128001] = True  # llama eos
    return {"word_start": word_start, "banned": banned,
            "sentence_end": sentence_end}


class SamplerConfig(NamedTuple):
    delay: int = 1
    delay_level: str = "word"
    text_top_p: float = 0.0
    taste_top_p: float = 0.0
    text_temperature: float = 1.0
    repetition_penalty: float = 1.0
    extra_words: int = 8
    max_words_factor: int = 3
    stop_id: int = -1              # <0 => disabled
    has_prefix: bool = True


class SamplerState(NamedTuple):
    step: jnp.ndarray               # int32 number of update() calls so far
    word_counter: jnp.ndarray       # int32
    end_text_sampling: jnp.ndarray  # bool
    end_countdown: jnp.ndarray      # int32, -1 => not started
    word_start_count: jnp.ndarray   # int32 (count of word-start flags)
    history: jnp.ndarray            # [delay+1] rolling word-start flags (token level)
    token_counts: jnp.ndarray       # [V] emitted-token counts (repetition penalty)


def init_state(vocab_size: int, delay: int) -> SamplerState:
    return SamplerState(
        step=jnp.int32(0),
        word_counter=jnp.int32(0),
        end_text_sampling=jnp.asarray(False),
        end_countdown=jnp.int32(-1),
        word_start_count=jnp.int32(0),
        history=jnp.zeros((delay + 1,), bool),
        token_counts=jnp.zeros((vocab_size,), jnp.int32),
    )


class StepOutput(NamedTuple):
    text_id: jnp.ndarray            # int32
    taste_ids: jnp.ndarray          # [4] int32 (IGNORE_ID when not sampled)
    terminate: jnp.ndarray          # bool
    wait_for_taste: jnp.ndarray     # bool
    is_word_start: jnp.ndarray      # bool
    taste_sample: jnp.ndarray       # bool  ('sample' action)
    use_prefix: jnp.ndarray         # bool  (consume one pending prefix embed)
    emit_text: jnp.ndarray          # bool  (text id appended to output)
    taste_started: jnp.ndarray      # bool  (is_started_sampling_taste)


def sampler_step(
    rng: jax.Array,
    state: SamplerState,
    text_logits: jnp.ndarray,    # [V]
    taste_logits: jnp.ndarray,   # [L, K]
    cfg: SamplerConfig,
    tables,                      # dict of jnp bool [V]
) -> Tuple[SamplerState, StepOutput]:
    """One decode step (sampler.py:113-188, branchless)."""
    rng_text, rng_taste = jax.random.split(rng)

    # ---- text sampling (greedy when top_p == 0) ----
    logits = jnp.where(tables["banned"], NEG_INF, text_logits.astype(jnp.float32))
    if cfg.text_top_p == 0.0:
        text_id = jnp.argmax(logits).astype(jnp.int32)
    else:
        filt = mask_top_p(logits, cfg.text_top_p)
        filt = apply_repetition_penalty(filt, state.token_counts,
                                        cfg.repetition_penalty)
        filt = temperature_scale(filt, cfg.text_temperature)
        text_id = jax.random.categorical(rng_text, filt).astype(jnp.int32)

    # ---- word-start / countdown bookkeeping ----
    is_wait = state.end_text_sampling
    countdown_started = state.end_countdown >= 0
    new_countdown = jnp.where(
        is_wait,
        jnp.where(countdown_started, state.end_countdown - 1, cfg.delay - 1),
        state.end_countdown)
    is_word_start = jnp.where(
        state.word_counter == 0, True,
        jnp.where(is_wait, True, tables["word_start"][text_id]))

    history = jnp.roll(state.history, -1).at[-1].set(is_word_start)

    end_now = jnp.logical_or(
        jnp.logical_and(state.word_counter >= cfg.extra_words,
                        tables["sentence_end"][text_id]),
        state.word_counter >= cfg.extra_words * cfg.max_words_factor)
    new_end_text = jnp.logical_or(state.end_text_sampling, end_now)

    # stop-id handling (instruct mode)
    if cfg.stop_id >= 0:
        hit_stop = text_id == cfg.stop_id
        new_end_text = jnp.logical_or(new_end_text, hit_stop)
        new_countdown = jnp.where(hit_stop, cfg.delay - 1, new_countdown)
        is_wait = jnp.logical_or(is_wait, hit_stop)

    new_word_counter = state.word_counter + is_word_start.astype(jnp.int32)
    new_ws_count = state.word_start_count + is_word_start.astype(jnp.int32)

    terminate = new_countdown == 0

    # ---- taste sampling ----
    if cfg.delay_level == "token":
        # reference: started once more than `delay` flags recorded; the taste
        # position mirrors the word-start flag from `delay` steps ago
        started = state.step + 1 > cfg.delay
        is_taste = jnp.logical_and(started, history[0])
    else:  # word
        started = new_ws_count > cfg.delay
        is_taste = jnp.logical_and(started, is_word_start)

    if cfg.taste_top_p == 0.0:
        taste_ids = jnp.argmax(taste_logits, axis=-1).astype(jnp.int32)
    else:
        filt = mask_top_p(taste_logits.astype(jnp.float32), cfg.taste_top_p)
        taste_ids = jax.random.categorical(rng_taste, filt, axis=-1).astype(jnp.int32)
    taste_ids = jnp.where(is_taste, taste_ids,
                          jnp.full_like(taste_ids, IGNORE_ID))

    # ---- actions ----
    # reference taste_action (sampler.py:174-186): 'use_prefix' consumes one
    # pending embed at every pre-start step for token-level delay, but only
    # at word starts for word-level delay ('use_prefix_ignore' otherwise)
    if cfg.delay_level == "token":
        prefix_gate = jnp.asarray(True)
    else:
        prefix_gate = is_word_start
    use_prefix = jnp.logical_and(
        jnp.logical_not(started),
        jnp.asarray(cfg.has_prefix) & prefix_gate)
    emit_text = jnp.logical_and(jnp.logical_not(is_wait),
                                jnp.logical_not(terminate))

    new_counts = state.token_counts.at[text_id].add(1)
    new_state = SamplerState(state.step + 1, new_word_counter, new_end_text,
                             new_countdown, new_ws_count, history, new_counts)
    return new_state, StepOutput(text_id, taste_ids, terminate, is_wait,
                                 is_word_start, is_taste, use_prefix,
                                 emit_text, started)
