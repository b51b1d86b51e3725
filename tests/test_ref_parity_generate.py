"""Trajectory parity: our KV-cached batched joint text+taste `generate`
(spoken_lm) vs the reference's cache-less B=1 generation loop
(modeling_taste.py:1031-1206), greedy, on converted weights.

Pins the full decode machinery end to end: prefix construction per
conditional mode, the sampler state machine driving word starts /
taste sampling / pending-prefix consumption, fill-forward audio embeds
between words, per-step fusion, RoPE positions in the cached loop, and
termination.

The fake llm tokenizer comes from test_ref_parity_sampler (the vocab must
cover the reference sampler's hard-coded llama ids, so the tiny llama is
built at vocab 128002).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from ref_compat import import_reference
from test_ref_parity_sampler import FakeTokenizer
from taste_spokenlm_tpu.config import LlamaConfig, SpokenLMConfig
from taste_spokenlm_tpu.models.quantizer import Codebook
from taste_spokenlm_tpu.models.sampler import (SamplerConfig,
                                               build_sampler_tables)
from taste_spokenlm_tpu.models.spoken_lm import TasteSpokenLM
from taste_spokenlm_tpu.utils.convert import rvq_state, spoken_lm_params

VOCAB = 128002
HID = 32
SOS = 128000
K, D, Q = 16, 8, 4
AUDIO_DIM = 1280
MAX_STEPS = 40


class SizedTokenizer(FakeTokenizer):
    def __len__(self):
        return VOCAB


@pytest.fixture(scope="module")
def llama_dir(tmp_path_factory):
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM
    torch.manual_seed(0)
    cfg = HFLlamaConfig(
        vocab_size=VOCAB, hidden_size=HID, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, rope_theta=10000.0,
        initializer_range=0.1, tie_word_embeddings=False)
    d = tmp_path_factory.mktemp("tiny_llama_gen")
    LlamaForCausalLM(cfg).save_pretrained(d, safe_serialization=True)
    return str(d), cfg


@pytest.fixture(scope="module")
def gen_pair(llama_dir):
    mt = import_reference("taste_speech.modeling_taste")
    vq_mod = import_reference("ref_mt.vq.residual_vq")
    path, hf_cfg = llama_dir
    hf_cfg._name_or_path = path
    torch.manual_seed(2)
    ref = mt.TasteSpokenLM(
        text_config=hf_cfg, k=K, d=D, sos_id=SOS, loss_weights="0.5-0.5",
        delay=1, delay_level="word", audio_embed_conv_mode="fill_forward",
        in_llm_module="weighted_sum", out_llm_module="weighted_layer",
        _attn_implementation="eager", use_lora=False).eval()
    ref.language_model = ref.language_model.to(torch.float32)
    with torch.no_grad():
        ref.pad_text_unit_embed.normal_(0, 0.1)
        ref.pad_audio_unit_embed.normal_(0, 0.1)
    ref.register_taste_sampler(SizedTokenizer(), text_top_p=0.0,
                               taste_top_p=0.0, text_temperature=1.0,
                               repetition_penalty=1.0)

    torch.manual_seed(3)
    rvq = vq_mod.ResidualVQ(
        dim=AUDIO_DIM, num_quantizers=Q, codebook_dim=D, codebook_size=K,
        kmeans_init=False, decay=0.9, threshold_ema_dead_code=0,
        commitment_weight=1.0, sample_codebook_temp=0.0).eval()
    vq_state = {k: v.detach().numpy() for k, v in rvq.state_dict().items()}
    _, quant = rvq_state(vq_state, prefix="")
    cb = Codebook(
        embed=jnp.asarray(quant["embed"]),
        proj_kernel=jnp.asarray(vq_state["project_out.weight"].T),
        proj_bias=jnp.asarray(vq_state["project_out.bias"]))

    cfg = SpokenLMConfig(
        llama=LlamaConfig(
            vocab_size=VOCAB, hidden_size=HID, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=2,
            num_key_value_heads=2, head_dim=16, max_position_embeddings=128,
            rope_theta=10000.0, rope_scaling_factor=1.0,
            tie_word_embeddings=False),
        lora=None, use_lora=False, delay=1, delay_level="word",
        audio_embed_conv_mode="fill_forward", in_llm_module="weighted_sum",
        out_llm_module="weighted_layer", loss_weights="0.5-0.5", sos_id=SOS)
    ours = TasteSpokenLM(cfg, audio_dim=AUDIO_DIM, taste_k=K, taste_d=D,
                         taste_l=Q)
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = spoken_lm_params(state, prefix="")
    tables = {k: jnp.asarray(v)
              for k, v in build_sampler_tables(SizedTokenizer(),
                                               VOCAB).items()}
    return ref, rvq, ours, {"params": params}, cb, tables


def _cap_updates(ref, max_calls):
    """Force the reference's unbounded while-loop to terminate."""
    orig = ref.taste_sampler.update
    calls = {"n": 0}

    def wrapped(*a, **k):
        calls["n"] += 1
        if calls["n"] > max_calls:
            return 128001, None, "terminate", "skip"
        return orig(*a, **k)

    ref.taste_sampler.update = wrapped
    return calls


@pytest.mark.parametrize("mode", ["audio", "text", "instruct"])
def test_generate_trajectory_matches_reference(gen_pair, mode):
    """instruct: the fused audio+text prefix is wrapped in chat-template
    prefix/suffix ids and generation stops (exclusively) at stop_id
    (modeling_taste.py:1089-1107, modules_taste/sampler.py:75-140)."""
    ref, rvq, ours, variables, cb, tables = gen_pair
    rng = np.random.RandomState(11)
    t = 6
    token_ids = rng.randint(0, 60000, (1, t))
    lengths = np.asarray([t], np.int32)
    word_ids = np.asarray([[0, 0, 1, 1, 2, 2]], np.int32)
    indices = rng.randint(0, K, (1, t, Q))

    ref_kwargs, our_kwargs = {}, {}
    stop_id = -1
    if mode == "instruct":
        prefix = np.asarray([101, 102, 103], np.int64)
        suffix = np.asarray([104, 105], np.int64)
        stop_id = 128001
        ref_kwargs = dict(
            instruct_prefix_ids=torch.from_numpy(prefix),
            instruct_suffix_ids=torch.from_numpy(suffix),
            stop_id=stop_id)
        our_kwargs = dict(
            instruct_prefix_ids=jnp.asarray(prefix, jnp.int32),
            instruct_suffix_ids=jnp.asarray(suffix, jnp.int32))

    calls = _cap_updates(ref, MAX_STEPS)
    with torch.no_grad():
        g_idx, g_tok, g_len, g_words = ref.generate(
            rvq, mode,
            llm_indices=torch.from_numpy(indices.astype(np.int64)),
            llm_token_ids=torch.from_numpy(token_ids.astype(np.int64)),
            llm_token_lengths=torch.from_numpy(lengths.astype(np.int64)),
            llm_word_ids=torch.from_numpy(word_ids.astype(np.int64)),
            extra_words=3, **ref_kwargs)
    ref.taste_sampler.update = ref.taste_sampler.update  # leave wrapped; reset next call
    capped = calls["n"] > MAX_STEPS

    scfg = SamplerConfig(delay=1, delay_level="word", extra_words=3,
                         max_words_factor=3, stop_id=stop_id,
                         has_prefix=(mode == "audio"))
    out = ours.apply(
        variables, jax.random.PRNGKey(0), cb, scfg, tables,
        jnp.asarray(indices), jnp.asarray(token_ids), jnp.asarray(lengths),
        jnp.asarray(word_ids), conditional_mode=mode, max_steps=MAX_STEPS,
        **our_kwargs, method=ours.generate)

    n_ref = int(g_len[0, 0]) if g_len is not None else 0
    n_ours = int(out["num_tokens"][0])
    n = min(n_ref, n_ours)
    assert n > 0, "no tokens emitted by either side"
    np.testing.assert_array_equal(
        np.asarray(out["llm_token_ids"])[0, :n], g_tok.numpy()[0, :n],
        err_msg="generated text ids")
    np.testing.assert_array_equal(
        np.asarray(out["llm_word_ids"])[0, :n], g_words.numpy()[0, :n],
        err_msg="generated word ids")
    if g_idx is not None:
        # the reference emits one taste row per sampler step (-1 fillers on
        # non-word-start steps); ours is dense per-word — compare the
        # word-start rows
        ref_rows = g_idx.numpy()[0]
        ref_rows = ref_rows[ref_rows[:, 0] != -1]
        w = min(int(out["num_taste_words"][0]), len(ref_rows))
        np.testing.assert_array_equal(
            np.asarray(out["taste_indices"])[0, :w], ref_rows[:w],
            err_msg="generated taste indices")
    if not capped:
        # both terminated naturally: full agreement on counts
        assert n_ours == n_ref, (n_ours, n_ref)
