"""End-to-end completion pipeline test (tiny model + toy tokenizers)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from taste_spokenlm_tpu.config import TasteConfig
from taste_spokenlm_tpu.frontend.api import CompletionPipeline
from taste_spokenlm_tpu.models.taste import TasteForCausalLM


class ToyLlmTokenizer:
    """id i decodes to ' w<i>' when i%3==0 (word start) else '<i>'; matches
    the word-start rule build_sampler_tables derives (leading space)."""

    def decode(self, ids):
        if isinstance(ids, (int, np.integer)):
            ids = [ids]
        out = []
        for i in ids:
            out.append((" w%d" % i) if i % 3 == 0 else ("c%d" % i))
        return "".join(out)

    def encode(self, word, add_special_tokens=False):
        return [(hash(word) % 100) + 2]


class ToyAsrTokenizer:
    def encode(self, word, add_special_tokens=False):
        # two asr tokens per word
        h = hash(word) % 500
        return [h, (h + 7) % 500]


@pytest.fixture(scope="module")
def pipeline():
    cfg = TasteConfig.tiny()
    model = TasteForCausalLM(cfg)
    rng = np.random.RandomState(0)
    b, t_tok, t_sp, t_llm = 1, 8, 12, 7
    variables = model.init(
        jax.random.PRNGKey(0), jax.random.PRNGKey(1),
        jnp.asarray(rng.randn(b, cfg.speech_decoder.spk_embed_dim), jnp.float32),
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
    tables = None  # built from the toy tokenizer by the pipeline
    return CompletionPipeline(
        model, variables, ToyLlmTokenizer(), ToyAsrTokenizer(),
        max_decode_steps=32, max_asr_tokens=32, max_words=16,
        max_speech_steps=8, mel_len_max=16)


def test_completion_pipeline_end_to_end(pipeline):
    rng = np.random.RandomState(1)
    cfg = pipeline.model.config
    t = 7
    out = pipeline(
        speaker_embeds=rng.randn(1, cfg.speech_decoder.spk_embed_dim
                                 ).astype(np.float32),
        llm_token_ids=rng.randint(2, 100, (1, t)).astype(np.int32),
        llm_word_ids=(np.arange(t) // 2)[None].astype(np.int32),
        llm_indices=np.where(
            ((np.arange(t) % 2) == 0)[None, :, None],
            rng.randint(0, cfg.audio_tower.quantizer.codebook_size, (1, t, 4)),
            -1).astype(np.int32),
        asr_token_ids=rng.randint(5, 100, (1, 9)).astype(np.int32),
        asr_word_ids=np.minimum(np.arange(9) // 2, 3)[None].astype(np.int32),
        extra_words=2, seed=0)
    assert isinstance(out["generated_text"], str) and out["generated_text"]
    assert out["waveform"].shape[0] == 1
    assert np.isfinite(out["waveform"]).all()
    assert out["generated_taste"].shape[1] == 4


def test_completion_text_only(pipeline):
    rng = np.random.RandomState(2)
    t = 7
    out = pipeline(
        speaker_embeds=rng.randn(
            1, pipeline.model.config.speech_decoder.spk_embed_dim
        ).astype(np.float32),
        llm_token_ids=rng.randint(2, 100, (1, t)).astype(np.int32),
        llm_word_ids=(np.arange(t) // 2)[None].astype(np.int32),
        llm_indices=np.full((1, t, 4), -1, np.int32),
        conditional_mode="text", output_text_only=True, extra_words=2)
    assert set(out) == {"generated_text"}


def test_from_pretrained_end_to_end(tmp_path_factory, pipeline):
    """Save a seed checkpoint dir (config.json + orbax params), reload it
    with the one-line loader, and run inference_reconstruction — the
    reference from_pretrained quick-start ergonomics
    (taste_speech/__init__.py:21-23, README.md:35-55)."""
    import taste_spokenlm_tpu as tst
    from taste_spokenlm_tpu.utils.checkpoint import save_params

    ckpt = tmp_path_factory.mktemp("seed_ckpt")
    cfg = pipeline.model.config
    with open(ckpt / "config.json", "w") as f:
        f.write(cfg.to_json())
    save_params(str(ckpt / "params"), jax.device_get(pipeline.variables))

    model, variables, processor = tst.from_pretrained(
        str(ckpt), llm_tokenizer=ToyLlmTokenizer(),
        asr_tokenizer=ToyAsrTokenizer())
    assert model.config.to_json() == cfg.to_json()
    # processor works for text without any external assets
    feats = processor.process_text("hello there world")
    assert feats["llm_token_ids"].shape[0] == 1

    rng = np.random.RandomState(3)
    t = 8
    out = model.apply(
        variables, jax.random.PRNGKey(0),
        jnp.asarray(rng.randn(1, cfg.speech_decoder.spk_embed_dim),
                    jnp.float32),
        jnp.asarray(rng.randint(5, 100, (1, t))), jnp.asarray([t]),
        jnp.asarray((np.arange(t) // 2)[None]),
        jnp.asarray(rng.randn(1, cfg.audio_tower.whisper.n_mels,
                              cfg.audio_tower.whisper.max_source_positions * 2),
                    jnp.float32),
        max_speech_steps=8, mel_len_max=16,
        method=TasteForCausalLM.inference_reconstruction)
    assert np.isfinite(np.asarray(out["waveform"])).all()

    # serving engine one-liner over the same dir
    from taste_spokenlm_tpu.serving.server import TasteEngine
    engine = TasteEngine.from_pretrained(str(ckpt), token_buckets=(8, 16))
    assert engine.config.to_json() == cfg.to_json()


def test_from_pretrained_quantized_fused_dir(tmp_path_factory, pipeline):
    """A serving checkpoint dir in the merged+quantized+fused layout (what
    `convert_checkpoint.py --merge-lora --quantize-llama
    --quantize-s3-decoder --fuse-qkv` writes, config.json included) loads
    through from_pretrained and decodes — the module tree built from the
    saved config must match the saved param layout exactly."""
    import taste_spokenlm_tpu as tst
    from taste_spokenlm_tpu.config import LoraConfig
    from taste_spokenlm_tpu.utils.checkpoint import save_params
    from taste_spokenlm_tpu.utils.quant import (merge_lora_params,
                                                quantize_llama_params,
                                                quantize_encoder_params,
                                                _quantize_dense_leaf)

    cfg = pipeline.model.config
    lora = LoraConfig.tiny()
    params = jax.device_get(pipeline.variables["params"])
    sl = dict(params["spoken_lm"])
    sl["language_model"] = quantize_llama_params(
        merge_lora_params(sl["language_model"], lora.alpha, lora.r),
        fuse_qkv=True)
    sd = dict(params["speech_decoder"])
    sd["llm"] = quantize_encoder_params(sd["llm"], fuse_qkv=True)
    sd["llm_decoder"] = _quantize_dense_leaf(sd["llm_decoder"])
    tree = {"params": dict(params, spoken_lm=sl, speech_decoder=sd),
            "quantizer": jax.device_get(pipeline.variables["quantizer"])}

    serve_cfg = cfg.replace(
        spoken_lm=cfg.spoken_lm.replace(
            use_lora=False,
            llama=cfg.spoken_lm.llama.replace(
                quantized_serving="int8", fused_qkv_serving=True)),
        speech_decoder=cfg.speech_decoder.replace(
            llm=cfg.speech_decoder.llm.replace(
                quantized_serving="int8", fused_qkv_serving=True)))

    ckpt = tmp_path_factory.mktemp("fused_ckpt")
    with open(ckpt / "config.json", "w") as f:
        f.write(serve_cfg.to_json())
    save_params(str(ckpt / "params"), tree)

    model, variables, _ = tst.from_pretrained(str(ckpt))
    assert model.config.spoken_lm.llama.fused_qkv_serving
    rng = np.random.RandomState(5)
    t = 8
    out = model.apply(
        variables, jax.random.PRNGKey(0),
        jnp.asarray(rng.randn(1, cfg.speech_decoder.spk_embed_dim),
                    jnp.float32),
        jnp.asarray(rng.randint(5, 100, (1, t))), jnp.asarray([t]),
        jnp.asarray((np.arange(t) // 2)[None]),
        jnp.asarray(rng.randn(1, cfg.audio_tower.whisper.n_mels,
                              cfg.audio_tower.whisper.max_source_positions * 2),
                    jnp.float32),
        max_speech_steps=8, mel_len_max=16,
        method=TasteForCausalLM.inference_reconstruction)
    assert np.isfinite(np.asarray(out["waveform"])).all()


def test_vocode_s3_topline(pipeline):
    """`vocode` (the --use-target-speech-token s3-topline ablation) turns
    ground-truth S3 tokens into a waveform, bypassing tower + decoder."""
    model, variables = pipeline.model, pipeline.variables
    cfg = model.config
    b, t = 1, 6
    r = np.random.RandomState(0)
    st = jnp.asarray(r.randint(0, cfg.speech_decoder.speech_token_size,
                               (b, t)), jnp.int32)
    out = model.apply(
        variables, jax.random.PRNGKey(0), st, jnp.asarray([t]),
        jnp.asarray(r.randn(b, cfg.speech_decoder.spk_embed_dim),
                    jnp.float32),
        mel_len_max=16, method=TasteForCausalLM.vocode)
    wav = np.asarray(out["waveform"])
    assert wav.shape[0] == b and np.isfinite(wav).all()
    assert int(out["waveform_lengths"][0]) > 0


def test_vocode_clamps_out_of_vocab_tokens(pipeline):
    """External S3 dumps carry EOS/pad markers (>= speech_token_size) and
    negative padding; vocode must clamp them instead of doing an OOB
    embedding gather (which NaNs the waveform on this platform)."""
    model, variables = pipeline.model, pipeline.variables
    cfg = model.config
    b, t = 1, 6
    r = np.random.RandomState(0)
    st = r.randint(0, cfg.speech_decoder.speech_token_size, (b, t))
    st[0, 1] = cfg.speech_decoder.speech_token_size      # EOS marker
    st[0, 2] = cfg.speech_decoder.speech_token_size + 7  # corrupt id
    st[0, 3] = -1                                        # pad
    out = model.apply(
        variables, jax.random.PRNGKey(0), jnp.asarray(st, jnp.int32),
        jnp.asarray([t]),
        jnp.asarray(r.randn(b, cfg.speech_decoder.spk_embed_dim),
                    jnp.float32),
        mel_len_max=16, method=TasteForCausalLM.vocode)
    wav = np.asarray(out["waveform"])
    assert np.isfinite(wav).all()
    assert float(np.sqrt(np.mean(wav ** 2))) > 1e-8
