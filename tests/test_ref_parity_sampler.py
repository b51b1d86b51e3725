"""Trajectory parity: our branchless `sampler_step` vs the reference's
Python-object TasteSampler state machine, driven step-for-step on identical
greedy logits (reference: taste_speech/modules_taste/sampler.py:10-188).

The reference module is imported from /root/reference (torch-CPU) under a
synthetic package so its relative `.cosyvoice.utils` import resolves; only
its *behavior* is used, as a golden oracle.
"""

import importlib.util
import sys
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from taste_spokenlm_tpu.models.sampler import (SamplerConfig,
                                               build_sampler_tables,
                                               init_state, sampler_step)

REF_SAMPLER = "/root/reference/taste_speech/modules_taste/sampler.py"
# the reference unconditionally bans id 128001 (llama eos), so the shared
# vocab must cover it; >=128000 ids are word starts in both implementations
VOCAB = 128002
L, K = 4, 16


class FakeTokenizer:
    """Deterministic id -> subword map exercising every vocab-scan class:
    word starts (leading space), '.' / sentence-enders, banned punctuation,
    newline-containing, and plain word pieces."""

    def decode(self, i):
        r = i % 11
        if r == 0:
            return " the"        # word start
        if r == 1:
            return "ing"         # continuation
        if r == 2:
            return "."           # sentence end (kept: exact '.')
        if r == 3:
            return " end."       # word start + sentence end
        if r == 4:
            return "!!"          # banned (no [.,'a-zA-Z0-9])
        if r == 5:
            return "a\nb"        # banned (newline)
        if r == 6:
            return " word"       # word start
        if r == 7:
            return "s"           # continuation
        if r == 8:
            return ",'"          # kept punctuation, not word start
        if r == 9:
            return " no."        # word start + sentence end
        return "xyz"             # continuation


def _load_reference_sampler():
    pkg = types.ModuleType("ref_modules_taste")
    pkg.__path__ = ["/root/reference/taste_speech/modules_taste"]
    sys.modules["ref_modules_taste"] = pkg
    cosy = types.ModuleType("ref_modules_taste.cosyvoice")
    cosy.__path__ = []
    sys.modules["ref_modules_taste.cosyvoice"] = cosy
    utils = types.ModuleType("ref_modules_taste.cosyvoice.utils")
    utils.IGNORE_ID = -1
    sys.modules["ref_modules_taste.cosyvoice.utils"] = utils
    spec = importlib.util.spec_from_file_location(
        "ref_modules_taste.sampler", REF_SAMPLER)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_modules_taste.sampler"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_mod():
    return _load_reference_sampler()


@pytest.fixture(scope="module")
def tables():
    t = build_sampler_tables(FakeTokenizer(), VOCAB)
    return {k: jnp.asarray(v) for k, v in t.items()}


def _our_action(so):
    if bool(so.terminate):
        return "terminate"
    if bool(so.wait_for_taste):
        return "wait_for_taste"
    if bool(so.is_word_start):
        return "continue_at_word_start"
    return "continue_not_at_word_start"


def _our_taste_action(so, cfg):
    if bool(so.taste_started):
        return "sample"
    if cfg.has_prefix:
        if cfg.delay_level == "word":
            return "use_prefix" if bool(so.use_prefix) else "use_prefix_ignore"
        return "use_prefix"
    return "wait"


@pytest.mark.parametrize("delay,level,has_prefix", [
    (1, "word", True), (2, "word", True), (3, "word", False),
    (1, "token", True), (2, "token", True), (2, "token", False),
])
def test_sampler_trajectory_matches_reference(ref_mod, tables, delay, level,
                                              has_prefix):
    ref = ref_mod.TasteSampler(delay, level, VOCAB, FakeTokenizer())
    ref.reset(extra_words=3, has_prefix=has_prefix)

    cfg = SamplerConfig(delay=delay, delay_level=level, extra_words=3,
                        max_words_factor=3, has_prefix=has_prefix)
    state = init_state(VOCAB, delay)
    step_jit = jax.jit(sampler_step, static_argnames=("cfg",))

    rng = np.random.RandomState(100 * delay + (7 if level == "token" else 0))
    key = jax.random.PRNGKey(0)
    for step in range(60):
        text_np = rng.randn(VOCAB).astype(np.float32) * 3
        taste_np = rng.randn(L, K).astype(np.float32)

        r_text = torch.from_numpy(text_np.copy()).reshape(1, 1, VOCAB)
        r_taste = torch.from_numpy(taste_np.copy()).reshape(1, 1, L, K)
        ref_text, ref_taste, ref_action, ref_taste_action = ref.update(
            r_text, r_taste, input_ids=torch.zeros(1, 1, dtype=torch.int64))

        key, sub = jax.random.split(key)
        state, so = step_jit(sub, state, jnp.asarray(text_np),
                             jnp.asarray(taste_np), cfg, tables)

        assert int(so.text_id) == int(ref_text), f"step {step}: text id"
        assert _our_action(so) == ref_action, f"step {step}: action"
        assert _our_taste_action(so, cfg) == ref_taste_action, \
            f"step {step}: taste action"
        # the raw flag drives pending-prefix consumption in generate():
        # exactly one pending embed per reference 'use_prefix'
        assert bool(so.use_prefix) == (ref_taste_action == "use_prefix"), \
            f"step {step}: use_prefix flag"
        np.testing.assert_array_equal(
            np.asarray(so.taste_ids),
            ref_taste.reshape(-1).numpy().astype(np.int32),
            err_msg=f"step {step}: taste ids")
        if ref_action == "terminate":
            break
    else:
        pytest.fail("reference sampler never terminated in 60 steps")


def test_vocab_tables_match_reference(ref_mod):
    """word-start / banned / sentence-end scans agree with the reference's
    set registration (sampler.py:31-58) on the fake tokenizer."""
    ref = ref_mod.TasteSampler(1, "word", VOCAB, FakeTokenizer())
    ours = build_sampler_tables(FakeTokenizer(), VOCAB)
    assert set(np.nonzero(ours["word_start"])[0]) == ref.word_start_set
    assert set(np.nonzero(ours["banned"])[0]) == set(ref.ban_ids)
    assert set(np.nonzero(ours["sentence_end"])[0]) == ref.sentance_end_set
