"""Spoken LM tests: word-delay construction, losses, joint decode."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from taste_spokenlm_tpu.config import SpokenLMConfig
from taste_spokenlm_tpu.models.quantizer import Codebook, codebook_output_from_indices
from taste_spokenlm_tpu.models.sampler import SamplerConfig
from taste_spokenlm_tpu.models.spoken_lm import (TasteSpokenLM,
                                                 fill_forward_indices,
                                                 word_start_positions)
from taste_spokenlm_tpu.ops.losses import IGNORE_ID

AUDIO_DIM, K, D, L = 64, 32, 16, 4


def _codebook(seed=0):
    rng = np.random.RandomState(seed)
    return Codebook(
        embed=jnp.asarray(rng.randn(L, K, D), jnp.float32),
        proj_kernel=jnp.asarray(rng.randn(D, AUDIO_DIM) * 0.1, jnp.float32),
        proj_bias=jnp.zeros((AUDIO_DIM,), jnp.float32),
    )


@pytest.fixture(scope="module")
def setup():
    cfg = SpokenLMConfig.tiny()
    model = TasteSpokenLM(cfg, audio_dim=AUDIO_DIM, taste_k=K, taste_d=D,
                          taste_l=L)
    cb = _codebook()
    rng = np.random.RandomState(0)
    b, t = 2, 6
    ids = jnp.asarray(rng.randint(0, cfg.llama.vocab_size, (b, t)))
    word_ids = jnp.asarray([[0, 0, 1, 2, 2, 3], [0, 1, 1, 2, 0, 0]])
    lens = jnp.asarray([6, 4])
    indices = jnp.asarray(rng.randint(0, K, (b, t, L)))
    args = (cb, indices, ids, lens, word_ids)
    variables = model.init(jax.random.PRNGKey(0), *args)
    return cfg, model, variables, args


def test_fill_forward_indices():
    x = jnp.asarray([[[-1, -1], [1, 2], [-1, -1], [3, 4], [-1, -1]]])
    f = np.asarray(fill_forward_indices(x))
    assert f.tolist() == [[[-1, -1], [1, 2], [1, 2], [3, 4], [3, 4]]]


def test_word_start_positions():
    word_ids = jnp.asarray([[0, 0, 1, 2, 2, 3]])
    pos, count = word_start_positions(word_ids, jnp.asarray([6]))
    assert np.asarray(count).tolist() == [4]
    assert np.asarray(pos)[0, :4].tolist() == [0, 2, 3, 5]


def test_delay_construction(setup):
    cfg, model, variables, (cb, indices, ids, lens, word_ids) = setup
    inputs_embeds, out_lens, taste_labels, audio_stream = model.apply(
        variables, cb, indices, ids, lens, word_ids,
        method=TasteSpokenLM.prepare_conditional_embeds)
    t, dly = 6, cfg.delay
    assert inputs_embeds.shape == (2, 1 + t + dly, cfg.llama.hidden_size)
    assert np.asarray(out_lens).tolist() == [6 + 2, 4 + 2]

    lab = np.asarray(taste_labels)
    idx = np.asarray(indices)
    # sample 0: words start at 0,2,3,5; word w's taste lands at start(w+1)
    assert (lab[0, 0] == IGNORE_ID).all()      # pos0: word0 start, src -1
    assert (lab[0, 1] == IGNORE_ID).all()      # pos1: not a start
    assert lab[0, 2].tolist() == idx[0, 0].tolist()   # word1 start <- word0
    assert lab[0, 3].tolist() == idx[0, 2].tolist()   # word2 start <- word1
    assert lab[0, 5].tolist() == idx[0, 3].tolist()   # word3 start <- word2
    assert lab[0, 6].tolist() == idx[0, 5].tolist()   # post row <- word3
    assert (lab[0, 7] == IGNORE_ID).all()      # trailing ignore

    # audio stream: positions before the first delayed word use the pad embed
    # (zero-init) and positions after fill forward
    astream = np.asarray(audio_stream)
    np.testing.assert_allclose(astream[0, 0], 0.0, atol=1e-6)  # pad embed
    expected_w0 = np.asarray(codebook_output_from_indices(cb, indices[0:1, 0:1]))
    np.testing.assert_allclose(astream[0, 2], expected_w0[0, 0], atol=1e-5)
    # fill forward: position 4 (not a word start) keeps word1's delayed code
    np.testing.assert_allclose(astream[0, 4], astream[0, 3], atol=1e-5)


def test_forward_losses(setup):
    cfg, model, variables, args = setup
    out = model.apply(variables, *args)
    assert np.isfinite(float(out["loss"]))
    assert np.isfinite(float(out["text_loss"]))
    assert np.isfinite(float(out["taste_loss"]))
    labels = np.asarray(out["text_labels"])
    ids = np.asarray(args[2])
    assert labels[0, :6].tolist() == ids[0].tolist()
    assert (labels[0, 6:] == IGNORE_ID).all()
    assert (labels[1, 4:] == IGNORE_ID).all()
    # taste logits from the continue-latent bridge are scaled one-hots
    tl = np.asarray(out["taste_logits"])
    assert tl.shape[-2:] == (L, K)
    assert set(np.unique(tl)).issubset({0.0, 1000.0})


def test_generate_joint_decode(setup):
    cfg, model, variables, (cb, indices, ids, lens, word_ids) = setup
    v = cfg.llama.vocab_size
    rng = np.random.RandomState(3)
    tables = {
        "word_start": jnp.asarray(rng.rand(v) < 0.4),
        "banned": jnp.zeros((v,), bool),
        "sentence_end": jnp.asarray(rng.rand(v) < 0.3),
    }
    scfg = SamplerConfig(delay=cfg.delay, delay_level="word", extra_words=3,
                         has_prefix=True)
    out = model.apply(
        variables, jax.random.PRNGKey(0), cb, scfg, tables,
        indices[:1], ids[:1], lens[:1], word_ids[:1], "audio", 48,
        method=TasteSpokenLM.generate)
    n = int(out["num_tokens"][0])
    nt = int(out["num_taste_words"][0])
    toks = np.asarray(out["llm_token_ids"])[0]
    words = np.asarray(out["llm_word_ids"])[0]
    taste = np.asarray(out["taste_indices"])[0]
    assert 0 < n <= 48
    assert (toks[:n] >= 0).all() and (toks[:n] < v).all()
    assert (toks[n:] == IGNORE_ID).all()
    # word ids start at 0 and are non-decreasing
    assert words[0] == 0
    assert (np.diff(words[:n]) >= 0).all()
    # sampled taste rows are dense and valid
    assert nt > 0
    assert (taste[:nt] >= 0).all() and (taste[:nt] < K).all()
    assert (taste[nt:] == IGNORE_ID).all()


def test_generate_deterministic(setup):
    cfg, model, variables, (cb, indices, ids, lens, word_ids) = setup
    v = cfg.llama.vocab_size
    tables = {
        "word_start": jnp.asarray(np.arange(v) % 3 == 0),
        "banned": jnp.zeros((v,), bool),
        "sentence_end": jnp.asarray(np.arange(v) % 7 == 0),
    }
    scfg = SamplerConfig(delay=1, extra_words=2, text_top_p=0.8,
                         text_temperature=0.7, repetition_penalty=1.1)
    outs = []
    for _ in range(2):
        o = model.apply(variables, jax.random.PRNGKey(11), cb, scfg, tables,
                        indices[:1], ids[:1], lens[:1], word_ids[:1],
                        "audio", 32, method=TasteSpokenLM.generate)
        outs.append(np.asarray(o["llm_token_ids"]))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_forward_in_graph_ref_kl(setup):
    """compute_ref_kl=True computes the frozen-base KL target in-graph (the
    adapter-disabled backbone over [sos|tokens]) and must equal passing the
    same logits precomputed (modeling_taste.py:864-877: 0.9 KL + 0.1 CE)."""
    cfg, model, variables, (cb, indices, ids, lens, word_ids) = setup
    b = ids.shape[0]

    def base_fwd(m, ref_ids, ref_lens):
        o = m.language_model(input_ids=ref_ids, attention_lengths=ref_lens,
                             disable_lora=True)
        return m.language_model.logits(o["last_hidden"])

    ref_ids = jnp.concatenate(
        [jnp.full((b, 1), cfg.sos_id, ids.dtype), ids], axis=1)
    ref_logits = model.apply(variables, ref_ids, lens + 1, method=base_fwd)

    out_in = model.apply(variables, cb, indices, ids, lens, word_ids,
                         compute_ref_kl=True)
    out_pre = model.apply(variables, cb, indices, ids, lens, word_ids,
                          ref_logits=ref_logits)
    assert np.isfinite(float(out_in["text_kl"]))
    np.testing.assert_allclose(float(out_in["text_kl"]),
                               float(out_pre["text_kl"]), rtol=1e-6)
    np.testing.assert_allclose(float(out_in["loss"]), float(out_pre["loss"]),
                               rtol=1e-6)
    # text loss is the 0.9/0.1 KL/CE mix, different from the pure-CE loss
    out_ce = model.apply(variables, cb, indices, ids, lens, word_ids)
    assert abs(float(out_in["text_loss"]) - float(out_ce["text_loss"])) > 1e-8


def test_generate_cached_matches_uncached(setup):
    """The KV-cached while_loop decode must match an uncached replay that
    re-runs the full forward over the growing sequence each step (the
    reference's cache-less loop, modeling_taste.py:1111-1199).  Catches
    position/rope bookkeeping bugs in the cached path (e.g. roping generated
    tokens at position 0)."""
    from taste_spokenlm_tpu.models.sampler import init_state, sampler_step

    cfg, model, variables, (cb, indices, ids, lens, word_ids) = setup
    v = cfg.llama.vocab_size
    rng = np.random.RandomState(9)
    tables = {
        "word_start": jnp.asarray(rng.rand(v) < 0.4),
        "banned": jnp.zeros((v,), bool),
        "sentence_end": jnp.asarray(rng.rand(v) < 0.3),
    }
    d = cfg.delay
    scfg = SamplerConfig(delay=d, delay_level="word", extra_words=2,
                         max_words_factor=2, has_prefix=True)  # greedy
    max_steps = 12
    out = model.apply(
        variables, jax.random.PRNGKey(0), cb, scfg, tables,
        indices[:1], ids[:1], lens[:1], word_ids[:1], "audio", max_steps,
        method=TasteSpokenLM.generate)

    # ---- uncached replay ----
    inputs_embeds, _, _, audio_stream = model.apply(
        variables, cb, indices[:1], ids[:1], lens[:1], word_ids[:1],
        method=TasteSpokenLM.prepare_conditional_embeds)
    text_len = int(lens[0]) + 1
    embeds = inputs_embeds[0, :text_len]
    pending = np.asarray(audio_stream[0])
    pend_ptr = text_len - 1

    state = init_state(v, d)
    onehot = jax.nn.one_hot(ids[0], v, dtype=jnp.int32)
    counts = jnp.sum(
        onehot * (jnp.arange(ids.shape[1])[:, None] < lens[0]), axis=0)
    state = state._replace(token_counts=counts)

    def lm_last(m, e):
        o = m.language_model(inputs_embeds=e, output_hidden_states=True)
        tl = m.language_model.logits(o["last_hidden"][:, -1:])
        taste, _ = m.extract_for_bridge_out_llm(
            o["last_hidden"][:, -1:].astype(jnp.float32),
            tuple(h[:, -1:] for h in o["hidden_states"]), cb)
        return tl[0, 0], taste[0, 0]

    def fuse(m, tid, aemb):
        te = m.language_model.embed_tokens(tid[None])[0]
        return m.fuse_for_bridge_in_llm(
            te[None, None].astype(m.dtype),
            aemb[None, None].astype(m.dtype))[0, 0]

    pad_audio = np.asarray(variables["params"]["pad_audio_unit_embed"],
                           np.float32)
    key = jax.random.PRNGKey(0)
    last_audio = np.zeros((AUDIO_DIM,), np.float32)
    toks, taste_rows = [], []
    for _ in range(max_steps):
        text_logits, taste_logits = model.apply(variables, embeds[None],
                                                method=lm_last)
        key, sub = jax.random.split(key)
        state, so = sampler_step(sub, state, text_logits, taste_logits,
                                 scfg, tables)
        if bool(so.emit_text):
            toks.append(int(so.text_id))
        if bool(so.taste_sample):
            taste_rows.append(np.asarray(so.taste_ids))
        taste_embed = np.asarray(codebook_output_from_indices(
            cb, jnp.maximum(so.taste_ids, 0)[None, None])[0, 0], np.float32)
        if bool(so.taste_sample):
            last_audio = taste_embed
        elif bool(so.use_prefix):
            last_audio = pending[min(pend_ptr, len(pending) - 1)]
            pend_ptr += 1
        aemb = (last_audio if bool(so.taste_started) or scfg.has_prefix
                else pad_audio)
        step_embed = model.apply(variables, so.text_id, jnp.asarray(aemb),
                                 method=fuse)
        embeds = jnp.concatenate([embeds, step_embed[None]], axis=0)
        if bool(so.terminate):
            break

    n, nt = int(out["num_tokens"][0]), int(out["num_taste_words"][0])
    assert n == len(toks), (n, toks)
    assert np.asarray(out["llm_token_ids"])[0, :n].tolist() == toks
    assert nt == len(taste_rows)
    if nt:
        np.testing.assert_array_equal(
            np.asarray(out["taste_indices"])[0, :nt], np.stack(taste_rows))


@pytest.mark.parametrize("mode", ["pad", "embed_a0_only",
                                  "get_codes_from_indices"])
def test_audio_embed_conv_modes(mode):
    """All 4 encode_audio modes (modeling_taste.py:671-713) produce finite
    embeds and use the empty-embed at invalid positions."""
    import dataclasses
    cfg = dataclasses.replace(SpokenLMConfig.tiny(),
                              audio_embed_conv_mode=mode)
    model = TasteSpokenLM(cfg, audio_dim=AUDIO_DIM, taste_k=K, taste_d=D,
                          taste_l=L)
    cb = _codebook()
    rng = np.random.RandomState(0)
    b, t = 2, 6
    ids = jnp.asarray(rng.randint(0, cfg.llama.vocab_size, (b, t)))
    word_ids = jnp.asarray([[0, 0, 1, 2, 2, 3], [0, 1, 1, 2, 0, 0]])
    lens = jnp.asarray([6, 4])
    indices = jnp.asarray(rng.randint(0, K, (b, t, L)))
    indices = indices.at[0, 2].set(-1)   # one invalid row
    variables = model.init(jax.random.PRNGKey(0), cb, indices, ids, lens,
                           word_ids)
    out = model.apply(variables, cb, indices, ids, lens, word_ids)
    assert np.isfinite(float(out["loss"]))
    # invalid rows map to the (zero-init) empty embed
    emb = model.apply(variables, indices, cb,
                      method=TasteSpokenLM.encode_audio)
    np.testing.assert_allclose(np.asarray(emb[0, 2]), 0.0, atol=1e-6)
    assert np.abs(np.asarray(emb[0, 1])).sum() > 0


@pytest.mark.parametrize("delay,level", [(0, "word"), (2, "token")])
def test_delay_variants(delay, level):
    """delay=0 and token-level delay (modeling_taste.py:722-748)."""
    import dataclasses
    cfg = dataclasses.replace(SpokenLMConfig.tiny(), delay=delay,
                              delay_level=level)
    model = TasteSpokenLM(cfg, audio_dim=AUDIO_DIM, taste_k=K, taste_d=D,
                          taste_l=L)
    cb = _codebook()
    rng = np.random.RandomState(0)
    b, t = 2, 6
    ids = jnp.asarray(rng.randint(0, cfg.llama.vocab_size, (b, t)))
    word_ids = jnp.asarray([[0, 0, 1, 2, 2, 3], [0, 1, 1, 2, 0, 0]])
    lens = jnp.asarray([6, 4])
    indices = jnp.asarray(rng.randint(0, K, (b, t, L)))
    variables = model.init(jax.random.PRNGKey(0), cb, indices, ids, lens,
                           word_ids)
    inputs_embeds, out_lens, taste_labels, _ = model.apply(
        variables, cb, indices, ids, lens, word_ids,
        method=TasteSpokenLM.prepare_conditional_embeds)
    lab = np.asarray(taste_labels)
    if delay == 0:
        assert inputs_embeds.shape[1] == t
        assert np.asarray(out_lens).tolist() == [6, 4]
        np.testing.assert_array_equal(lab[0, :6], np.asarray(indices)[0, :6])
        assert (lab[1, 4:] == IGNORE_ID).all()
    else:
        assert inputs_embeds.shape[1] == 1 + t + delay
        assert np.asarray(out_lens).tolist() == [6 + delay + 1, 4 + delay + 1]
        # labels: d IGNORE rows, then the unshifted indices per row
        assert (lab[:, :delay] == IGNORE_ID).all()
        np.testing.assert_array_equal(lab[0, delay:delay + 6],
                                      np.asarray(indices)[0])
        np.testing.assert_array_equal(lab[1, delay:delay + 4],
                                      np.asarray(indices)[1, :4])
        assert (lab[1, delay + 4:] == IGNORE_ID).all()
    out = model.apply(variables, cb, indices, ids, lens, word_ids)
    assert np.isfinite(float(out["loss"]))


def test_generate_zero_and_instruct_modes(setup):
    """'zero' (unconditional from sos) and 'instruct' (wrapped audio prefix
    + stop_id) decode modes (modeling_taste.py:1071-1107)."""
    cfg, model, variables, (cb, indices, ids, lens, word_ids) = setup
    v = cfg.llama.vocab_size
    rng = np.random.RandomState(4)
    tables = {
        "word_start": jnp.asarray(rng.rand(v) < 0.4),
        "banned": jnp.zeros((v,), bool),
        "sentence_end": jnp.asarray(rng.rand(v) < 0.3),
    }

    scfg = SamplerConfig(delay=cfg.delay, delay_level="word", extra_words=3,
                         has_prefix=False)
    out = model.apply(
        variables, jax.random.PRNGKey(0), cb, scfg, tables,
        None, None, None, None, "zero", 48,
        method=TasteSpokenLM.generate)
    n = int(out["num_tokens"][0])
    toks = np.asarray(out["llm_token_ids"])[0]
    assert 0 < n <= 48
    assert (toks[:n] >= 0).all() and (toks[:n] < v).all()

    scfg_i = SamplerConfig(delay=cfg.delay, delay_level="word", extra_words=3,
                           has_prefix=False, stop_id=7)
    out_i = model.apply(
        variables, jax.random.PRNGKey(1), cb, scfg_i, tables,
        indices[:1], ids[:1], lens[:1], word_ids[:1], "instruct", 48,
        jnp.asarray([1, 2, 3]), jnp.asarray([4, 5]),
        method=TasteSpokenLM.generate)
    n_i = int(out_i["num_tokens"][0])
    toks_i = np.asarray(out_i["llm_token_ids"])[0]
    assert 0 < n_i <= 48
    assert (toks_i[:n_i] >= 0).all() and (toks_i[:n_i] < v).all()
    # the stop id itself is never emitted (sampler.py:139-140)
    assert (toks_i[:n_i] != 7).all()

def test_generate_batched_matches_single_rows(setup):
    """Batched joint decode: each row of a ragged B=2 batch must match its
    own B=1 run exactly (greedy; per-row rng is fold_in(step_key, row), so
    sampled row 0 also matches — covered below)."""
    cfg, model, variables, (cb, indices, ids, lens, word_ids) = setup
    v = cfg.llama.vocab_size
    tables = {
        "word_start": jnp.asarray(np.arange(v) % 3 == 0),
        "banned": jnp.zeros((v,), bool),
        "sentence_end": jnp.asarray(np.arange(v) % 7 == 0),
    }
    scfg = SamplerConfig(delay=cfg.delay, delay_level="word", extra_words=2,
                         max_words_factor=2, has_prefix=True)  # greedy
    key = jax.random.PRNGKey(5)
    out_b = model.apply(variables, key, cb, scfg, tables, indices, ids, lens,
                        word_ids, "audio", 16, method=TasteSpokenLM.generate)
    for r in range(2):
        out_1 = model.apply(
            variables, key, cb, scfg, tables, indices[r:r + 1], ids[r:r + 1],
            lens[r:r + 1], word_ids[r:r + 1], "audio", 16,
            method=TasteSpokenLM.generate)
        # row 1's B=1 run derives its sampler rng as fold_in(key, 0), the
        # batched row 1 as fold_in(key, 1) — greedy sampling ignores rng, so
        # trajectories must still agree exactly
        for k in ("llm_token_ids", "llm_word_ids", "taste_indices",
                  "num_tokens", "num_taste_words"):
            np.testing.assert_array_equal(
                np.asarray(out_b[k])[r], np.asarray(out_1[k])[0],
                err_msg=f"row={r} key={k}")


def test_generate_batched_row0_matches_single_sampled(setup):
    """With top-p sampling, batched row 0 uses the same per-row stream
    (fold_in(step_key, 0)) as a B=1 run, so the trajectories are identical."""
    cfg, model, variables, (cb, indices, ids, lens, word_ids) = setup
    v = cfg.llama.vocab_size
    tables = {
        "word_start": jnp.asarray(np.arange(v) % 3 == 0),
        "banned": jnp.zeros((v,), bool),
        "sentence_end": jnp.asarray(np.arange(v) % 7 == 0),
    }
    scfg = SamplerConfig(delay=cfg.delay, delay_level="word", extra_words=2,
                         max_words_factor=2, has_prefix=True,
                         text_top_p=0.9, text_temperature=0.8,
                         repetition_penalty=1.1)
    key = jax.random.PRNGKey(6)
    out_b = model.apply(variables, key, cb, scfg, tables, indices, ids, lens,
                        word_ids, "audio", 12, method=TasteSpokenLM.generate)
    out_1 = model.apply(variables, key, cb, scfg, tables, indices[:1],
                        ids[:1], lens[:1], word_ids[:1], "audio", 12,
                        method=TasteSpokenLM.generate)
    for k in ("llm_token_ids", "taste_indices", "num_tokens"):
        np.testing.assert_array_equal(np.asarray(out_b[k])[0],
                                      np.asarray(out_1[k])[0], err_msg=k)


def test_chunked_ce_kl_matches_unchunked(setup):
    """return_text_logits=False (memory-lean training path: chunked CE+KL,
    no [B,T,V] logits) must reproduce the default losses."""
    cfg, model, variables, args = setup
    full = model.apply(variables, *args, compute_ref_kl=True)
    lean = model.apply(variables, *args, compute_ref_kl=True,
                       return_text_logits=False, ce_chunk_size=3)
    assert "text_logits" not in lean
    for k in ("loss", "text_loss", "taste_loss", "text_kl"):
        assert float(lean[k]) == pytest.approx(float(full[k]), rel=1e-5), k


def test_chunked_ce_with_precomputed_ref_logits(setup):
    """Batch-supplied ref_logits must drive the KL on the chunked path too
    (make_stage2_step passes batch['ref_logits'] with
    return_text_logits=False); regression: the KL silently vanished."""
    cfg, model, variables, (cb, indices, ids, lens, word_ids) = setup
    b = ids.shape[0]

    def base_fwd(m, ref_ids, ref_lens):
        o = m.language_model(input_ids=ref_ids, attention_lengths=ref_lens,
                             disable_lora=True)
        return m.language_model.logits(o["last_hidden"])

    ref_ids = jnp.concatenate(
        [jnp.full((b, 1), cfg.sos_id, ids.dtype), ids], axis=1)
    ref_logits = model.apply(variables, ref_ids, lens + 1, method=base_fwd)

    full = model.apply(variables, cb, indices, ids, lens, word_ids,
                       ref_logits=ref_logits)
    lean = model.apply(variables, cb, indices, ids, lens, word_ids,
                       ref_logits=ref_logits, return_text_logits=False,
                       ce_chunk_size=3)
    assert "text_kl" in lean, "chunked path dropped the supplied-ref KL"
    for k in ("loss", "text_loss", "text_kl"):
        assert float(lean[k]) == pytest.approx(float(full[k]), rel=1e-5), k
