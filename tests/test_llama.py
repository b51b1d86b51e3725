"""Parity tests: flax Llama (GQA + llama3 rope) vs HF transformers."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from taste_spokenlm_tpu.config import LlamaConfig, LoraConfig
from taste_spokenlm_tpu.models.llama import LlamaModel
from taste_spokenlm_tpu.utils import convert

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def hf_model():
    hf_cfg = transformers.LlamaConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=512, rms_norm_eps=1e-5,
        rope_theta=500000.0,
        rope_scaling={"rope_type": "llama3", "factor": 4.0,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                      "original_max_position_embeddings": 128},
        tie_word_embeddings=True, attention_bias=False, mlp_bias=False,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = transformers.LlamaModel(hf_cfg).eval()
    cfg = LlamaConfig.tiny()
    return model, cfg


def test_forward_parity(hf_model):
    model, cfg = hf_model
    ids = np.random.RandomState(0).randint(0, cfg.vocab_size, (2, 9))
    with torch.no_grad():
        ref = model(torch.from_numpy(ids), output_hidden_states=True)
    params = convert.llama_params(model.state_dict(), prefix="")
    lm = LlamaModel(cfg, lora=None)
    out = lm.apply({"params": params}, jnp.asarray(ids),
                   output_hidden_states=True)
    np.testing.assert_allclose(np.asarray(out["last_hidden"]),
                               ref.last_hidden_state.numpy(), atol=3e-4)
    assert len(out["hidden_states"]) == len(ref.hidden_states) == 3
    for mine, theirs in zip(out["hidden_states"], ref.hidden_states):
        np.testing.assert_allclose(np.asarray(mine), theirs.numpy(), atol=3e-4)


def test_kv_cache_decode_matches_full(hf_model):
    model, cfg = hf_model
    ids = jnp.asarray(np.random.RandomState(1).randint(0, cfg.vocab_size, (2, 7)))
    params = convert.llama_params(model.state_dict(), prefix="")
    lm = LlamaModel(cfg, lora=None)
    full = lm.apply({"params": params}, ids)["last_hidden"]

    caches = lm.init_cache(2, 12)
    outs = []
    for t in range(7):
        o = lm.apply({"params": params}, ids[:, t:t + 1],
                     position_offset=t, caches=caches, cache_index=jnp.int32(t))
        caches = o["caches"]
        outs.append(o["last_hidden"])
    stepped = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(stepped), np.asarray(full), atol=3e-4)


def test_lora_starts_as_identity_and_trains(hf_model):
    model, cfg = hf_model
    ids = jnp.asarray(np.random.RandomState(2).randint(0, cfg.vocab_size, (1, 5)))
    base_params = convert.llama_params(model.state_dict(), prefix="")
    lm_lora = LlamaModel(cfg, lora=LoraConfig.tiny())
    # init to create lora params, then graft the base weights in
    variables = lm_lora.init(jax.random.PRNGKey(0), ids)
    import flax
    merged = flax.core.unfreeze(variables)["params"]

    def graft(dst, src):
        for k, v in src.items():
            if isinstance(v, dict):
                graft(dst[k], v)
            else:
                dst[k] = jnp.asarray(v)
    graft(merged, base_params)

    lm_base = LlamaModel(cfg, lora=None)
    out_base = lm_base.apply({"params": base_params}, ids)["last_hidden"]
    out_lora = lm_lora.apply({"params": merged}, ids)["last_hidden"]
    # B initialized to zero -> adapter is a no-op at init
    np.testing.assert_allclose(np.asarray(out_lora), np.asarray(out_base),
                               atol=1e-5)
    # and the adapter params receive gradient
    def loss_fn(p):
        return jnp.sum(lm_lora.apply({"params": p}, ids)["last_hidden"] ** 2)
    g = jax.grad(loss_fn)(merged)
    gb = np.asarray(g["layers_0"]["self_attn"]["q_proj"]["lora_b"])
    assert np.abs(gb).max() > 0


def test_tied_logits(hf_model):
    model, cfg = hf_model
    params = convert.llama_params(model.state_dict(), prefix="")
    lm = LlamaModel(cfg, lora=None)
    h = jnp.asarray(np.random.RandomState(3).randn(1, 4, cfg.hidden_size),
                    jnp.float32)
    logits = lm.apply({"params": params}, h, method=LlamaModel.logits)
    assert logits.shape == (1, 4, cfg.vocab_size)
    ref = np.asarray(h) @ np.asarray(params["embed_tokens"]["embedding"]).T
    np.testing.assert_allclose(np.asarray(logits), ref, atol=1e-4)


def test_multi_token_cached_prefill_matches_full(hf_model):
    """Regression: prefilling a >1-token chunk through the KV cache must be
    causal (a bidirectional prefill corrupts the cache for generation)."""
    model, cfg = hf_model
    ids = jnp.asarray(np.random.RandomState(4).randint(0, cfg.vocab_size, (2, 6)))
    params = convert.llama_params(model.state_dict(), prefix="")
    lm = LlamaModel(cfg, lora=None)
    full = lm.apply({"params": params}, ids)["last_hidden"]

    caches = lm.init_cache(2, 10)
    o = lm.apply({"params": params}, ids, position_offset=0, caches=caches,
                 cache_index=jnp.int32(0))
    np.testing.assert_allclose(np.asarray(o["last_hidden"]), np.asarray(full),
                               atol=3e-4)
    # and continuing one more token from the cache matches the full forward
    nxt = jnp.asarray([[7], [9]])
    full2 = lm.apply({"params": params},
                     jnp.concatenate([ids, nxt], 1))["last_hidden"][:, -1:]
    o2 = lm.apply({"params": params}, nxt, position_offset=6,
                  caches=o["caches"], cache_index=jnp.int32(6))
    np.testing.assert_allclose(np.asarray(o2["last_hidden"]),
                               np.asarray(full2), atol=3e-4)

def test_disable_lora_recovers_frozen_base(hf_model):
    """disable_lora=True must reproduce the LoRA-free base model exactly even
    with trained (nonzero) adapters — the in-graph frozen-base KL forward
    relies on it (reference: peft disable_adapter_layers,
    STAGE1_TRAIN/SpokenLM/taslm/modeling_taslm.py:602-613)."""
    model, cfg = hf_model
    ids = jnp.asarray(np.random.RandomState(3).randint(0, cfg.vocab_size,
                                                       (2, 6)))
    base_params = convert.llama_params(model.state_dict(), prefix="")
    lm_lora = LlamaModel(cfg, lora=LoraConfig.tiny())
    variables = lm_lora.init(jax.random.PRNGKey(0), ids)
    import flax
    merged = flax.core.unfreeze(variables)["params"]

    def graft(dst, src):
        for k, v in src.items():
            if isinstance(v, dict):
                graft(dst[k], v)
            else:
                dst[k] = jnp.asarray(v)
    graft(merged, base_params)

    # make the adapters ACTIVE (nonzero B)
    def perturb(tree, key):
        for k, v in tree.items():
            if isinstance(v, dict):
                perturb(v, key)
            elif k == "lora_b":
                tree[k] = jax.random.normal(key, v.shape) * 0.1
    perturb(merged, jax.random.PRNGKey(7))

    lm_base = LlamaModel(cfg, lora=None)
    out_base = lm_base.apply({"params": base_params}, ids)["last_hidden"]
    out_on = lm_lora.apply({"params": merged}, ids)["last_hidden"]
    out_off = lm_lora.apply({"params": merged}, ids,
                            disable_lora=True)["last_hidden"]
    assert np.abs(np.asarray(out_on) - np.asarray(out_base)).max() > 1e-3
    np.testing.assert_allclose(np.asarray(out_off), np.asarray(out_base),
                               atol=1e-6)
