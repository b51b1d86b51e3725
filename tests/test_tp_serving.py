"""Tensor-parallel SERVING: the full joint text+taste decode program
(spoken-LM prefill + while_loop AR decode + sampler state machine + KV
caches) must compile and reproduce the single-device trajectory with the
llama backbone sharded over the mesh 'model' axis.

This is the multi-chip inference counterpart of the training dryrun in
__graft_entry__ (the reference serves strictly single-GPU,
STAGE1_TRAIN/CosyVoice/runtime/python/grpc/): on TPU the same jitted
generate_completion scales across chips by annotating parameter shardings
and letting XLA insert the collectives.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from taste_spokenlm_tpu.config import TasteConfig
from taste_spokenlm_tpu.models.sampler import SamplerConfig
from taste_spokenlm_tpu.models.taste import TasteForCausalLM
from taste_spokenlm_tpu.parallel import mesh as mesh_lib


def test_generate_completion_matches_under_tp_mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")

    cfg = TasteConfig.tiny()
    model = TasteForCausalLM(cfg)
    rng = np.random.RandomState(0)
    b, t = 1, 10
    L = cfg.audio_tower.quantizer.num_quantizers
    K = cfg.audio_tower.quantizer.codebook_size
    V = cfg.spoken_lm.llama.vocab_size
    word_ids = np.minimum(np.arange(t) // 2, t - 1)
    asr_ids = jnp.asarray(
        rng.randint(5, cfg.audio_tower.whisper.vocab_size, (b, t)), jnp.int32)
    llm_ids = jnp.asarray(rng.randint(2, V, (b, t)), jnp.int32)
    mel = jnp.asarray(
        rng.randn(b, cfg.audio_tower.whisper.n_mels,
                  2 * cfg.audio_tower.whisper.max_source_positions) * 0.3,
        jnp.float32)
    spk = jnp.asarray(rng.randn(b, cfg.speech_decoder.spk_embed_dim),
                      jnp.float32)
    lens = jnp.asarray([t])
    words = jnp.asarray(word_ids[None])
    indices = np.full((b, t, L), -1, np.int32)
    starts = np.flatnonzero(np.diff(word_ids, prepend=-1) != 0)
    indices[:, starts] = rng.randint(0, K, (b, len(starts), L))

    variables = model.init(
        jax.random.PRNGKey(0), jax.random.PRNGKey(1), spk, asr_ids, lens,
        words, mel, jnp.zeros((b, 8), jnp.int32),
        jnp.full((b,), 8, jnp.int32), llm_ids, lens, words,
        method=TasteForCausalLM.init_all)

    tables = {"word_start": jnp.asarray(np.arange(V) % 3 == 0),
              "banned": jnp.zeros((V,), bool),
              "sentence_end": jnp.asarray(np.arange(V) % 7 == 0)}
    scfg = SamplerConfig(delay=cfg.spoken_lm.delay, delay_level="word",
                         extra_words=3, has_prefix=True)   # greedy top_p=0

    def gen(v, r):
        return model.apply(v, r, scfg, tables, jnp.asarray(indices),
                           llm_ids, lens, words, "audio", 12,
                           method=TasteForCausalLM.generate_completion)

    mesh = mesh_lib.make_mesh(data=4, model=2)
    shardings = mesh_lib.param_shardings(mesh, variables)
    # the llama q_proj kernel must actually be model-sharded (or the test
    # would only prove replication works)
    flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
    assert any("q_proj" in "/".join(str(p) for p in path)
               and "model" in str(s.spec) for path, s in flat), \
        "no TP-sharded llama kernels in the tiny config"

    def run_pair(seed):
        ref = jax.jit(gen)(variables, jax.random.PRNGKey(seed))
        ref = {k: np.asarray(v) for k, v in ref.items()}
        assert int(ref["num_tokens"][0]) > 0
        with mesh:
            vdev = jax.device_put(variables, shardings)
            out = jax.jit(gen)(vdev, jax.random.PRNGKey(seed))
        out = {k: np.asarray(v) for k, v in out.items()}
        same = (np.array_equal(out["llm_token_ids"], ref["llm_token_ids"])
                and np.array_equal(out["taste_indices"],
                                   ref["taste_indices"])
                and int(out["num_tokens"][0]) == int(ref["num_tokens"][0])
                and int(out["num_taste_words"][0])
                == int(ref["num_taste_words"][0]))
        return same, ref, out

    # greedy trajectory must be identical: token ids, taste ids, lengths.
    # TP reshards the matmul reduction order, so a near-exact logit tie can
    # legitimately flip one argmax and cascade (AR feedback) — a genuine TP
    # bug diverges for EVERY seed, a tie flake only for one, so retry a
    # mismatch once with a fresh PRNG seed before failing.
    same, ref, out = run_pair(3)
    if not same:
        same, ref, out = run_pair(11)
    np.testing.assert_array_equal(out["llm_token_ids"],
                                  ref["llm_token_ids"])
    np.testing.assert_array_equal(out["taste_indices"],
                                  ref["taste_indices"])
    assert int(out["num_tokens"][0]) == int(ref["num_tokens"][0])
    assert int(out["num_taste_words"][0]) == int(ref["num_taste_words"][0])
