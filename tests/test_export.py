"""Export-direction checkpoint conversion (utils/export.py).

Two layers of evidence that a checkpoint trained HERE is loadable by the
reference stack (the reference's own export path is
STAGE1_TRAIN/.../convert_to_hf_compatible.py, README.md:101):

1. exact inversion: convert(export(tree)) == tree bitwise for every module
   family, on real init trees from our tiny models (convert.py's naming was
   golden-validated against imported reference modules in the
   test_ref_parity_* suites, so inverting it exactly means the export emits
   reference names/layouts);
2. a live load: the exported composite state dict load_state_dict()s into
   the imported reference TasteForCausalLM and reproduces the weights it
   was converted from bitwise.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import flax

from taste_spokenlm_tpu.config import TasteConfig
from taste_spokenlm_tpu.models.taste import TasteForCausalLM
from taste_spokenlm_tpu.utils import convert, export


def _flat(tree):
    return flax.traverse_util.flatten_dict(tree, sep="/")


def _assert_trees_equal(a, b, skip=(), approx_prefixes=()):
    """Bitwise tree equality; keys under `approx_prefixes` tolerate float
    rounding (the weight-norm g*v/||v|| collapse is exact only to ~1e-7)."""
    fa, fb = _flat(a), _flat(b)
    missing = set(fa) - set(fb) - set(skip)
    extra = set(fb) - set(fa) - set(skip)
    assert not missing and not extra, (sorted(missing)[:8], sorted(extra)[:8])
    for k in fa:
        if k in skip or k not in fb:
            continue
        x = np.asarray(fa[k], np.float32)
        y = np.asarray(fb[k], np.float32)
        if any(k.startswith(p) for p in approx_prefixes):
            np.testing.assert_allclose(x, y, rtol=1e-5, atol=1e-6,
                                       err_msg=k)
        else:
            np.testing.assert_array_equal(x, y, err_msg=k)


@pytest.fixture(scope="module")
def tiny_variables():
    cfg = TasteConfig.tiny()
    model = TasteForCausalLM(cfg)
    rng = np.random.RandomState(0)
    b, t_tok, t_sp, t_llm = 1, 8, 12, 7
    variables = model.init(
        jax.random.PRNGKey(0), jax.random.PRNGKey(1),
        jnp.asarray(rng.randn(b, cfg.speech_decoder.spk_embed_dim),
                    jnp.float32),
        jnp.asarray(rng.randint(5, 100, (b, t_tok))), jnp.asarray([t_tok]),
        jnp.asarray((np.arange(t_tok) // 2)[None]),
        jnp.asarray(rng.randn(b, cfg.audio_tower.whisper.n_mels,
                              cfg.audio_tower.whisper.max_source_positions * 2),
                    jnp.float32),
        jnp.asarray(rng.randint(0, cfg.speech_decoder.speech_token_size,
                                (b, t_sp))), jnp.asarray([t_sp]),
        jnp.asarray(rng.randint(2, 100, (b, t_llm))), jnp.asarray([t_llm]),
        jnp.asarray((np.arange(t_llm) // 2)[None]),
        method=TasteForCausalLM.init_all)
    # randomize so bitwise comparisons are meaningful (init zeros several
    # params; exported-vs-reconverted zeros would hide transpose bugs)
    leaves = _flat(variables)
    rnd = np.random.RandomState(7)
    randomized = {
        k: (jnp.asarray(rnd.randn(*np.shape(v)).astype(np.float32))
            if np.issubdtype(np.asarray(v).dtype, np.floating) else v)
        for k, v in leaves.items()}
    return cfg, flax.traverse_util.unflatten_dict(randomized, sep="/")


def test_audio_tower_export_roundtrip(tiny_variables):
    cfg, variables = tiny_variables
    tower = variables["params"]["audio_tower"]
    vq_q = variables["quantizer"]["audio_tower"]["vq"]
    state = export.audio_tower_state(tower, vq_q)
    back = convert.audio_tower_params(state)
    vq_params, vq_state = convert.rvq_state(state, "audio_tower.vq.rvq.")
    back["vq"] = vq_params
    _assert_trees_equal(tower, back)
    for key in ("embed", "embed_avg", "cluster_size"):
        np.testing.assert_array_equal(np.asarray(vq_q[key], np.float32),
                                      np.asarray(vq_state[key], np.float32),
                                      err_msg=key)


def test_speech_decoder_export_roundtrip(tiny_variables):
    cfg, variables = tiny_variables
    sd = variables["params"]["speech_decoder"]
    state = export.speech_decoder_state(sd)
    back = convert.speech_decoder_params(state)
    _assert_trees_equal(sd, back)


def test_spoken_lm_export_roundtrip(tiny_variables):
    """peft naming: LoRA adapters present -> base_layer/lora_A/lora_B."""
    cfg, variables = tiny_variables
    slm = variables["params"]["spoken_lm"]
    state = export.spoken_lm_state(slm)
    assert any(".lora_A.default.weight" in k for k in state)
    assert any(".base_layer.weight" in k for k in state)
    back = convert.spoken_lm_params(state)
    _assert_trees_equal(slm, back)


def test_voice_generator_export_roundtrip(tiny_variables):
    cfg, variables = tiny_variables
    vg = variables["params"]["voice_generator"]
    state = {}
    state.update(export.flow_state(vg["flow"], "flow."))
    state.update(export.hift_state(vg["hift"], "hift."))
    back = {
        "flow": convert.flow_params(
            state, n_blocks=cfg.flow.estimator_n_blocks,
            num_mid_blocks=cfg.flow.estimator_num_mid_blocks,
            n_channels=len(cfg.flow.estimator_channels)),
        "hift": convert.hift_params(
            state, num_kernels=len(cfg.hift.resblock_kernel_sizes)),
    }
    _assert_trees_equal(vg, back, approx_prefixes=("hift/",))


def test_composite_export_roundtrip(tiny_variables):
    """One call exports the whole model; reconversion via the checkpoint
    CLI's own converter calls reproduces every param bitwise."""
    cfg, variables = tiny_variables
    state = export.composite_taste_state(variables)
    params = {
        "speech_decoder": convert.speech_decoder_params(state),
        "audio_tower": convert.audio_tower_params(state),
        "spoken_lm": convert.spoken_lm_params(state),
        "voice_generator": {
            "flow": convert.flow_params(
                state, n_blocks=cfg.flow.estimator_n_blocks,
                num_mid_blocks=cfg.flow.estimator_num_mid_blocks,
                n_channels=len(cfg.flow.estimator_channels)),
            "hift": convert.hift_params(
                state, num_kernels=len(cfg.hift.resblock_kernel_sizes)),
        },
    }
    vq_params, vq_state = convert.rvq_state(state, "audio_tower.vq.rvq.")
    params["audio_tower"]["vq"] = vq_params
    _assert_trees_equal(variables["params"], params,
                        approx_prefixes=("voice_generator/hift/",))


def test_quantized_llama_exports_dequantized():
    """int8 serving layouts export back to float weights the reference can
    load; values match the dequantized kernels."""
    from taste_spokenlm_tpu.utils.quant import (dequantize_kernel,
                                                quantize_llama_params)
    from taste_spokenlm_tpu.config import LlamaConfig
    from taste_spokenlm_tpu.models.llama import LlamaModel

    cfg = LlamaConfig.tiny()
    model = LlamaModel(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 4), jnp.int32))
    qtree = quantize_llama_params(variables["params"], include_embed=True)
    state = export.llama_state(qtree, prefix="model.")
    w = state["model.layers.0.self_attn.q_proj.weight"]
    ref = np.asarray(dequantize_kernel(
        qtree["layers_0"]["self_attn"]["q_proj"])).T
    np.testing.assert_allclose(w, ref, atol=0)
    # embedding dequantizes too
    assert state["model.embed_tokens.weight"].shape == (
        cfg.vocab_size, cfg.hidden_size)


def test_taslm_export_roundtrip():
    from taste_spokenlm_tpu.models.quantizer import Codebook
    from taste_spokenlm_tpu.models.taslm import TaslmConfig, TaslmForCausalLM

    cfg = TaslmConfig.tiny()
    rng = np.random.RandomState(0)
    cb = Codebook(
        embed=jnp.asarray(rng.randn(4, cfg.speech_vocab_size, 16),
                          jnp.float32),
        proj_kernel=jnp.asarray(rng.randn(16, cfg.speech_hidden_size) * 0.1,
                                jnp.float32),
        proj_bias=jnp.zeros((cfg.speech_hidden_size,), jnp.float32))
    t = 6
    text = jnp.asarray(rng.randint(2, cfg.llama.vocab_size, (1, t)))
    speech = jnp.asarray(rng.randint(0, cfg.speech_vocab_size, (1, t, 4)))
    model = TaslmForCausalLM(cfg)
    variables = model.init(jax.random.PRNGKey(0), cb, text, speech)
    flat = _flat(variables["params"])
    rnd = np.random.RandomState(3)
    randomized = flax.traverse_util.unflatten_dict(
        {k: (jnp.asarray(rnd.randn(*np.shape(v)).astype(np.float32))
             if np.issubdtype(np.asarray(v).dtype, np.floating) else v)
         for k, v in flat.items()}, sep="/")
    state = export.taslm_state(randomized)
    back = convert.taslm_params(state)
    _assert_trees_equal(randomized, back,
                        skip=("speech_special_embed/embedding",))


# ---------------------------------------------------------------------------
# live reference load: exported dict -> imported reference composite
# ---------------------------------------------------------------------------

torch = pytest.importorskip("torch")
from test_ref_parity_composite import composite_pair  # noqa: F401,E402


def test_exported_state_loads_into_reference(composite_pair):  # noqa: F811
    """Export the converted variables back to torch names and load them into
    the imported reference TasteForCausalLM: zero unexpected keys, and every
    exported tensor reproduces the reference's original weight bitwise
    (true torch -> JAX -> torch round trip)."""
    ref, ours, variables = composite_pair
    state = export.composite_taste_state(variables)
    assert state, "export produced nothing"
    ref_sd = ref.state_dict()
    for k, v in state.items():
        assert k in ref_sd, f"exported key missing in reference: {k}"
        assert tuple(ref_sd[k].shape) == tuple(np.shape(v)), k
    res = ref.load_state_dict(export.to_torch(state), strict=False)
    assert not res.unexpected_keys, res.unexpected_keys[:5]
    # round trip bitwise vs the reference's own original values
    # (weight-norm g/v pairs are a re-parameterization — their collapsed
    # weight matches, checked by the roundtrip tests above; `initted` is a
    # synthesized flag)
    skipped = 0
    for k, v in state.items():
        if k.endswith((".weight_g", ".weight_v", ".initted")):
            skipped += 1
            continue
        np.testing.assert_array_equal(
            ref_sd[k].detach().float().numpy(), np.asarray(v, np.float32),
            err_msg=k)
    assert len(state) - skipped > 50  # a real model's worth of tensors


def test_int4_layouts_export_dequantized():
    """Regression: the int4 serving layouts (base_q4/kernel_q4) must
    dequantize on export (pure numpy — no backend init) instead of
    falling through to a KeyError."""
    from taste_spokenlm_tpu.ops.pallas.int4_matmul import (
        dequantize_int4, quantize_int4)
    r = np.random.RandomState(5)
    w = r.randn(64, 48).astype(np.float32)
    packed, scale = quantize_int4(jnp.asarray(w))
    ref = np.asarray(dequantize_int4(packed, scale)).T
    for p in ({"base_q4": np.asarray(packed),
               "base_scale": np.asarray(scale)},
              {"kernel_q4": np.asarray(packed),
               "scale": np.asarray(scale)}):
        np.testing.assert_allclose(export._dense_weight(p), ref, atol=1e-6)
