"""Golden parity: our flax ConformerEncoder vs the reference CosyVoice
Transformer/Conformer encoders imported from /root/reference (torch-CPU),
on real converted weights (reference:
taste_speech/modules_taste/cosyvoice/encoder.py:37-473).

The reference package is loaded under a synthetic top-level name so its
relative imports (.convolution, .class_utils, ...) resolve; only its
*behavior* is used, as a golden oracle.
"""

import importlib
import sys
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from taste_spokenlm_tpu.config import EncoderStackConfig
from taste_spokenlm_tpu.models.conformer import ConformerEncoder
from taste_spokenlm_tpu.utils.convert import conformer_params

REF_COSY = "/root/reference/taste_speech/modules_taste/cosyvoice"


@pytest.fixture(scope="module")
def ref_encoder_mod():
    pkg = types.ModuleType("ref_cosyvoice")
    pkg.__path__ = [REF_COSY]
    sys.modules.setdefault("ref_cosyvoice", pkg)
    return importlib.import_module("ref_cosyvoice.encoder")


CASES = {
    # TASTE speech-decoder text/audio encoders (taslm.json encoder__*):
    # linear input, espnet rel-pos, causal chunk masking
    "conformer_linear_causal": dict(
        ref_cls="ConformerEncoder", input_layer="linear",
        static_chunk_size=1, macaron_style=False, use_cnn_module=False,
        activation_type="swish"),
    # TASTE speech-decoder LM stack (taslm.json llm__*): legacy linear
    # input (relu), transformer layer naming
    "transformer_legacy_causal": dict(
        ref_cls="TransformerEncoder", input_layer="linear_legacy",
        static_chunk_size=1),
    # chunked-causal attention with chunk > 1
    "conformer_chunk2": dict(
        ref_cls="ConformerEncoder", input_layer="linear",
        static_chunk_size=2, macaron_style=False, use_cnn_module=False,
        activation_type="swish"),
    # full conformer: macaron FFN + conv module (batch norm), full attention
    "conformer_cnn_macaron": dict(
        ref_cls="ConformerEncoder", input_layer="linear",
        static_chunk_size=0, macaron_style=True, use_cnn_module=True,
        cnn_module_kernel=7, cnn_module_norm="batch_norm", causal=False,
        activation_type="swish"),
    # conv module with layer norm + causal depthwise conv
    "conformer_cnn_layernorm_causal": dict(
        ref_cls="ConformerEncoder", input_layer="linear",
        static_chunk_size=0, macaron_style=True, use_cnn_module=True,
        cnn_module_kernel=5, cnn_module_norm="layer_norm", causal=True,
        activation_type="swish"),
}

D_IN, D_OUT, HEADS, FF, BLOCKS = 24, 32, 2, 48, 2


def _build_pair(ref_encoder_mod, spec):
    spec = dict(spec)
    ref_cls = getattr(ref_encoder_mod, spec.pop("ref_cls"))
    causal_conv = spec.pop("causal", False)
    common = dict(
        input_size=D_IN, output_size=D_OUT, attention_heads=HEADS,
        linear_units=FF, num_blocks=BLOCKS, dropout_rate=0.0,
        positional_dropout_rate=0.0, attention_dropout_rate=0.0,
        pos_enc_layer_type="rel_pos_espnet",
        input_layer=spec["input_layer"],
        static_chunk_size=spec["static_chunk_size"],
        selfattention_layer_type="rel_selfattn")
    if ref_cls.__name__ == "ConformerEncoder":
        common.update(
            macaron_style=spec["macaron_style"],
            use_cnn_module=spec["use_cnn_module"],
            activation_type=spec["activation_type"],
            causal=causal_conv)
        if spec["use_cnn_module"]:
            common.update(cnn_module_kernel=spec["cnn_module_kernel"],
                          cnn_module_norm=spec["cnn_module_norm"])
    torch.manual_seed(0)
    ref = ref_cls(**common)
    ref.eval()

    cfg = EncoderStackConfig(
        input_size=D_IN, output_size=D_OUT, attention_heads=HEADS,
        linear_units=FF, num_blocks=BLOCKS,
        input_layer=spec["input_layer"],
        static_chunk_size=spec["static_chunk_size"],
        macaron_style=spec.get("macaron_style", False),
        use_cnn_module=spec.get("use_cnn_module", False),
        cnn_module_kernel=spec.get("cnn_module_kernel", 15),
        cnn_module_norm=spec.get("cnn_module_norm", "batch_norm"),
        cnn_causal=causal_conv,
        activation_type=spec.get("activation_type", "relu"))
    ours = ConformerEncoder(cfg, max_len=128)

    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    batch_stats: dict = {}
    params = conformer_params(state, "", batch_stats=batch_stats)
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    return ref, ours, variables


@pytest.mark.parametrize("case", sorted(CASES))
def test_encoder_forward_matches_reference(ref_encoder_mod, case):
    ref, ours, variables = _build_pair(ref_encoder_mod, CASES[case])
    rng = np.random.RandomState(7)
    b, t = 2, 11
    x = rng.randn(b, t, D_IN).astype(np.float32)
    lens = np.asarray([t, t - 4], np.int32)

    with torch.no_grad():
        ref_out, ref_masks = ref(torch.from_numpy(x),
                                 torch.from_numpy(lens).long())
    ref_out = ref_out.numpy()

    out = ours.apply(variables, jnp.asarray(x), jnp.asarray(lens))
    out = np.asarray(out)

    # compare only valid frames (the reference zeroes padded frames inside
    # conv modules but the trailing after_norm output at padded positions is
    # unspecified garbage on both sides)
    for i, n in enumerate(lens):
        np.testing.assert_allclose(out[i, :n], ref_out[i, :n], atol=1e-4,
                                   err_msg=f"case={case} row={i}")


def test_decode_step_matches_reference_full_forward(ref_encoder_mod):
    """Our KV-cached decode_step trajectory == the reference full causal
    forward at every position (the reference has no incremental path for
    these stacks — CosyVoice re-runs the full prefix per step)."""
    ref, ours, variables = _build_pair(
        ref_encoder_mod, CASES["conformer_linear_causal"])
    rng = np.random.RandomState(3)
    t = 9
    x = rng.randn(1, t, D_IN).astype(np.float32)
    with torch.no_grad():
        ref_out, _ = ref(torch.from_numpy(x), torch.tensor([t]).long())
    ref_out = ref_out.numpy()

    caches = ours.apply(variables, 1, t, method=ConformerEncoder.init_cache)
    outs = []
    for i in range(t):
        y, caches = ours.apply(variables, jnp.asarray(x[:, i:i + 1]), caches,
                               jnp.int32(i), method=ConformerEncoder.decode_step)
        outs.append(np.asarray(y)[:, 0])
    ours_out = np.stack(outs, axis=1)
    np.testing.assert_allclose(ours_out, ref_out, atol=1e-4)


def test_decode_step_matches_reference_forward_chunk(ref_encoder_mod):
    """Our KV-cached decode_step == the reference's STREAMING forward_chunk
    API (encoder.py:183-271) consumed chunk-by-chunk with a growing
    att_cache — the reference's own incremental serving path."""
    ref, ours, variables = _build_pair(
        ref_encoder_mod, CASES["conformer_linear_causal"])
    rng = np.random.RandomState(5)
    # chunk=1: forward_chunk applies full attention WITHIN a chunk (no
    # att_mask), so the causal streaming unit — and what the reference's
    # own decode loop feeds it (modeling_taste.py:1608) — is one token
    t, chunk = 8, 1
    x = rng.randn(1, t, D_IN).astype(np.float32)

    ref_outs = []
    att_cache = torch.zeros((0, 0, 0, 0))
    cnn_cache = torch.zeros((0, 0, 0, 0))
    offset = 0
    with torch.no_grad():
        for s in range(0, t, chunk):
            y, att_cache, cnn_cache = ref.forward_chunk(
                torch.from_numpy(x[:, s:s + chunk]), offset=offset,
                required_cache_size=-1, att_cache=att_cache,
                cnn_cache=cnn_cache)
            ref_outs.append(y.numpy())
            offset += chunk
    ref_out = np.concatenate(ref_outs, axis=1)

    caches = ours.apply(variables, 1, t, method=ConformerEncoder.init_cache)
    outs = []
    for i in range(t):
        y, caches = ours.apply(variables, jnp.asarray(x[:, i:i + 1]), caches,
                               jnp.int32(i),
                               method=ConformerEncoder.decode_step)
        outs.append(np.asarray(y)[:, 0])
    ours_out = np.stack(outs, axis=1)
    np.testing.assert_allclose(ours_out, ref_out, atol=1e-4)
