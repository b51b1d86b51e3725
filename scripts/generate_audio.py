#!/usr/bin/env python
"""Generation CLI: reconstruction / conditional completion tasks.

Equivalent of /root/reference/scripts/generate_audio.py:31-262, which loads
real audio, runs the TasteProcessor (speaker embedding, whisper 128-mel,
ASR transcription or forced text, dual tokenization), then drives
SpeechAutoEncoder / SpokenLLM reconstruction or conditional audio/text/
instruct completion and writes wav + metadata JSON per utterance
(examples/generated_cases schema).

The flagship wav-in -> wav-out journey:

  python scripts/generate_audio.py --seed-model ./ckpt --task completion \
      --input-wav speech.wav --campplus-onnx campplus.onnx \
      --asr-tokenizer <whisper tok dir> --llm-tokenizer <llama tok dir> \
      --output-dir ./gen

Forced-text voice-control prompts (reference generate_audio.py:49-72 pairs
control audio with forced texts instead of the ASR transcript):

  ... --input-wav control_pace.wav --text "[Q] Read slowly: ... [A] " \
      --out-generated-part-only

Without --input-wav the script falls back to synthetic tensors so the full
path stays exercisable with no audio assets (this image is egress-blocked).
"""

import argparse
import json
import os
import sys
import wave

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def write_wav(path, wav: np.ndarray, sr: int):
    data = np.clip(wav, -1.0, 1.0)
    pcm = (data * 32767.0).astype("<i2")
    with wave.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(pcm.tobytes())


def load_audio(path: str, target_sr: int) -> np.ndarray:
    """Decode + resample one file to mono float32 at `target_sr`.

    Native C++ reader/resampler first (csrc/audio_io.cpp); the pure-python
    RIFF parser (PCM16/24/32 + float32/64, data/native.py py_wav_read) +
    the JAX resampler as fallback.  mp3/flac corpora enter via the
    pre-decoded arrow shards (data/dataset.py) — the reference decodes
    them through torchaudio (processing_taste.py:25-31)."""
    from taste_spokenlm_tpu.data import native
    try:
        audio, sr = native.wav_read(path)
    except Exception:
        audio, sr = native.py_wav_read(path)
    if sr != target_sr:
        try:
            audio = native.resample(audio, sr, target_sr)
        except Exception:
            import jax.numpy as jnp
            from taste_spokenlm_tpu.ops.audio import resample
            audio = np.asarray(resample(
                jnp.asarray(audio, jnp.float32)[None], sr, target_sr))[0]
    return np.asarray(audio, np.float32)


def pad_or_trim_mel(mel: np.ndarray, n_frames: int) -> np.ndarray:
    """[B, n_mels, T] -> [B, n_mels, n_frames] (static tower geometry)."""
    t = mel.shape[2]
    if t >= n_frames:
        return mel[:, :, :n_frames]
    return np.pad(mel, [(0, 0), (0, 0), (0, n_frames - t)])


def make_transcriber(model_cfg, variables, asr_tokenizer, max_tokens=64,
                     seed=0):
    """Whisper ASR hook sharing the audio tower's encoder/decoder params
    (the tower IS a whisper model; WhisperForASR reuses its weights the way
    the reference preprocessing reuses openai/whisper-large-v3,
    processing_taste.py:256-266)."""
    import jax
    import jax.numpy as jnp
    from taste_spokenlm_tpu.frontend.processor import transcribe_with_fallback
    from taste_spokenlm_tpu.models.whisper import WhisperForASR
    from taste_spokenlm_tpu.ops.audio import whisper_log_mel

    wcfg = model_cfg.audio_tower.whisper
    # the decoder's learned positions cover prompt + generated tokens;
    # exceeding max_target_positions would gather OOB (NaNs on this platform)
    max_tokens = min(max_tokens,
                     wcfg.max_target_positions - len(wcfg.decoder_prompt))
    asr = WhisperForASR(wcfg)
    p = variables["params"]["audio_tower"]
    asr_vars = {"params": {"encoder": p["encoder"], "decoder": p["decoder"]}}

    @jax.jit
    def _apply(mel, temperature, rng):
        return asr.apply(asr_vars, mel, max_tokens=max_tokens,
                         temperature=temperature, rng=rng)

    def asr_apply(mel, _max_tokens, temperature, rng):
        return _apply(jnp.asarray(mel), jnp.float32(temperature), rng)

    vocab = len(asr_tokenizer) if hasattr(asr_tokenizer, "__len__") else None
    # the compression-ratio fallback rung decodes raw ids; only safe when
    # the tokenizer actually covers the model's vocab (not a toy tokenizer)
    fb_tok = asr_tokenizer if (vocab is None or vocab >= wcfg.vocab_size) \
        else None

    def transcribe(audio16k: np.ndarray) -> str:
        mel = np.asarray(whisper_log_mel(
            jnp.asarray(audio16k, jnp.float32)[None], n_mels=wcfg.n_mels))
        mel = pad_or_trim_mel(mel, 2 * wcfg.max_source_positions)
        tokens, _, _ = transcribe_with_fallback(
            asr_apply, mel, tokenizer=fb_tok, max_tokens=max_tokens,
            seed=seed)
        ids = [int(t) for t in tokens[0] if t != wcfg.eos_token_id]
        if vocab is not None:  # seed-model ids can exceed a toy tokenizer
            ids = [t for t in ids if t < vocab]
        return asr_tokenizer.decode(ids, skip_special_tokens=True).strip()

    return transcribe


def build_hooks(args, spk_dim):
    """Speaker-embedding + S3 hooks from CLI-provided ONNX graphs."""
    from taste_spokenlm_tpu.frontend.processor import (
        s3_tokenizer_from_onnx, speaker_embedder_from_onnx)
    speaker_embedder = s3_tokenizer = None
    if args.campplus_onnx:
        speaker_embedder = speaker_embedder_from_onnx(args.campplus_onnx)
    if args.s3_onnx:
        s3_tokenizer = s3_tokenizer_from_onnx(args.s3_onnx)
    return speaker_embedder, s3_tokenizer


def resolve_speaker_embeds(args, processor, refs, spk_dim):
    """x-vector priority: CAM++ graph over --ref-wavs > --speaker-embed .npy
    > zeros (warn) — the reference always has campplus.onnx on disk; here
    every source is explicit."""
    if processor.speaker_embedder is not None and refs:
        return processor.speaker_embedding(refs)[None].astype(np.float32)
    if args.speaker_embed:
        emb = np.load(args.speaker_embed).astype(np.float32).reshape(1, -1)
        assert emb.shape[1] == spk_dim, (emb.shape, spk_dim)
        return emb
    print("warning: no speaker-embedding source (--campplus-onnx/"
          "--speaker-embed); using zeros", file=sys.stderr)
    return np.zeros((1, spk_dim), np.float32)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seed-model", required=True)
    p.add_argument("--task", default="reconstruction",
                   choices=["reconstruction", "completion"])
    p.add_argument("--input-wav", default=None,
                   help="real input audio (wav; resampled to 16 kHz). "
                        "Omit for the synthetic smoke path.")
    p.add_argument("--ref-wavs", default=None,
                   help="comma-separated speaker reference clips "
                        "(default: the input wav itself, as the reference "
                        "CLI's ref_audio_list=[audio_path])")
    p.add_argument("--text", default=None,
                   help="forced text: skip ASR and condition on this text "
                        "(voice-control prompts, generate_audio.py:49-72)")
    p.add_argument("--asr-tokenizer", default=None,
                   help="HF tokenizer dir for the whisper token space")
    p.add_argument("--llm-tokenizer", default=None,
                   help="HF tokenizer dir for the llama token space")
    p.add_argument("--campplus-onnx", default=None,
                   help="CAM++ x-vector graph run by the JAX ONNX executor")
    p.add_argument("--s3-onnx", default=None,
                   help="S3 speech-tokenizer graph (enables real "
                        "--use-target-speech-token)")
    p.add_argument("--speaker-embed", default=None,
                   help=".npy x-vector, alternative to --campplus-onnx")
    p.add_argument("--conditional-mode", default="audio",
                   choices=["audio", "text", "zero", "instruct"],
                   help="completion conditioning (generate_audio.py tasks "
                        "SpokenLLM_Conditional_Compl / _Text_Compl; "
                        "instruct wraps the audio prefix in the llm "
                        "tokenizer's chat-template ids)")
    p.add_argument("--system-prompt", default=None,
                   help="system turn for the instruct chat template")
    p.add_argument("--out-generated-part-only", action="store_true",
                   help="synthesize only the generated continuation "
                        "(modeling_taste.py:1766)")
    p.add_argument("--reconstruction-mode", default="SpeechAutoEncoder",
                   choices=["SpeechAutoEncoder", "SpokenLLM"],
                   help="reconstruction through the tokenizer only (stage-1) "
                        "or through the spoken LM's taste head too (stage-2 "
                        "round trip, modeling_taste.py:1793-1857)")
    p.add_argument("--output-dir", required=True)
    p.add_argument("--extra-words", type=int, default=8)
    p.add_argument("--text-top-p", type=float, default=0.3)
    p.add_argument("--taste-top-p", type=float, default=0.0)
    p.add_argument("--temperature", type=float, default=0.5)
    p.add_argument("--repetition-penalty", type=float, default=1.1)
    p.add_argument("--max-speech-steps", type=int, default=64)
    p.add_argument("--max-decode-steps", type=int, default=64)
    p.add_argument("--mel-len-max", type=int, default=128)
    p.add_argument("--use-target-speech-token", action="store_true",
                   help="s3-topline ablation (reference bin/eval_audio.py "
                        "--use_target_speech_token / eval_s3.sh): vocode the "
                        "ground-truth S3 tokens directly, bypassing tower + "
                        "speech decoder — the flow/vocoder quality ceiling. "
                        "Tokens come from --target-speech-tokens, the "
                        "--s3-onnx tokenizer over --input-wav, or synthetic.")
    p.add_argument("--target-speech-tokens", default=None,
                   help="path to a .npy [B, T] int array of S3 tokens for "
                        "--use-target-speech-token")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", default=None,
                   help="cpu | tpu | default (sitecustomize-proof)")
    args = p.parse_args()

    if args.use_target_speech_token and args.task != "reconstruction":
        p.error("--use-target-speech-token is a reconstruction-task "
                "ablation; combine it with --task reconstruction")
    if args.use_target_speech_token and args.reconstruction_mode != \
            "SpeechAutoEncoder":
        p.error("--use-target-speech-token bypasses the LM entirely and "
                "cannot be combined with --reconstruction-mode SpokenLLM")

    from taste_spokenlm_tpu.utils.platform import force_platform
    force_platform(args.platform)

    import jax
    import jax.numpy as jnp
    from taste_spokenlm_tpu.frontend.api import CompletionPipeline
    from taste_spokenlm_tpu.models.sampler import SamplerConfig
    from taste_spokenlm_tpu.models.taste import TasteForCausalLM
    from taste_spokenlm_tpu.pretrained import from_pretrained
    from taste_spokenlm_tpu.utils.profiling import StageTimer

    asr_tok = llm_tok = None
    if args.asr_tokenizer or args.llm_tokenizer:
        from transformers import AutoTokenizer
        asr_tok = AutoTokenizer.from_pretrained(
            args.asr_tokenizer or args.llm_tokenizer)
        llm_tok = AutoTokenizer.from_pretrained(
            args.llm_tokenizer or args.asr_tokenizer)

    model, variables, processor = from_pretrained(
        args.seed_model, llm_tokenizer=llm_tok, asr_tokenizer=asr_tok)
    cfg = model.config
    spk_dim = cfg.speech_decoder.spk_embed_dim
    processor.speaker_embedder, processor.s3_tokenizer = \
        build_hooks(args, spk_dim)

    os.makedirs(args.output_dir, exist_ok=True)
    timer = StageTimer()
    key = jax.random.PRNGKey(args.seed)
    rng = np.random.RandomState(args.seed)
    meta = {"task": args.task, "seed": args.seed}
    n_frames = 2 * cfg.audio_tower.whisper.max_source_positions

    # ------------------------------------------------------------------
    # inputs: real audio through the processor, or synthetic stand-ins
    # ------------------------------------------------------------------
    if args.input_wav:
        if asr_tok is None or llm_tok is None:
            p.error("--input-wav needs --asr-tokenizer/--llm-tokenizer")
        sr = cfg.frontend.sample_rate
        with timer.stage("load_audio"):
            audio = load_audio(args.input_wav, sr)
            refs = ([load_audio(q, sr)
                     for q in args.ref_wavs.split(",")]
                    if args.ref_wavs else [audio])
        text = args.text
        if text is None:
            with timer.stage("asr_transcribe"):
                processor.transcriber = make_transcriber(
                    cfg, variables, asr_tok, seed=args.seed)
                text = processor.transcriber(audio)
            if not text.strip():
                print("warning: empty ASR transcript; conditioning on "
                      "'[UNK]'", file=sys.stderr)
                text = "[UNK]"
        with timer.stage("processor"):
            data = processor(
                audio, sr, text=text,
                ref_audio_list=refs if processor.speaker_embedder else None)
            data["audio_features"] = pad_or_trim_mel(
                np.asarray(data["audio_features"]), n_frames)
            data["speaker_embeds"] = resolve_speaker_embeds(
                args, processor, refs, spk_dim)
        meta["orig_text"] = text
        meta["input_wav"] = args.input_wav
        inputs = {k: jnp.asarray(v) for k, v in data.items()}
        real_inputs = True
    elif (args.task == "completion" and llm_tok is not None
          and args.conditional_mode in ("text", "zero")):
        # text/zero completion needs no audio; text comes from --text
        if args.conditional_mode == "text":
            if not args.text:
                p.error("--conditional-mode text needs --text "
                        "(or --input-wav)")
            data = processor.process_text(text=args.text)
            meta["orig_text"] = args.text
        else:
            data = {}
        data["speaker_embeds"] = resolve_speaker_embeds(
            args, processor, [], spk_dim)
        inputs = {k: jnp.asarray(v) for k, v in data.items()}
        real_inputs = True
    else:
        real_inputs = False
        b, t_tok = 1, 8
        inputs = dict(
            speaker_embeds=jnp.asarray(
                rng.randn(b, spk_dim), jnp.float32),
            asr_token_ids=jnp.asarray(rng.randint(
                5, min(100, cfg.audio_tower.whisper.vocab_size), (b, t_tok))),
            asr_token_lengths=jnp.asarray([t_tok]),
            asr_word_ids=jnp.asarray((np.arange(t_tok) // 2)[None]),
            audio_features=jnp.asarray(rng.randn(
                b, cfg.audio_tower.whisper.n_mels, n_frames), jnp.float32),
        )
        v = cfg.spoken_lm.llama.vocab_size
        inputs.update(
            llm_token_ids=jnp.asarray(rng.randint(2, min(100, v), (b, t_tok))),
            llm_token_lengths=jnp.asarray([t_tok]),
            llm_word_ids=jnp.asarray((np.arange(t_tok) // 2)[None]))

    # ------------------------------------------------------------------
    # tasks
    # ------------------------------------------------------------------
    generated_text = None
    if args.task == "reconstruction" and args.use_target_speech_token:
        if args.target_speech_tokens:
            st = np.load(args.target_speech_tokens).astype(np.int32)
            if st.ndim == 1:
                st = st[None]
        elif "speech_token_ids" in inputs:
            st = np.asarray(inputs["speech_token_ids"], np.int32)
        else:
            st = rng.randint(0, cfg.speech_decoder.speech_token_size,
                             (1, args.max_speech_steps)).astype(np.int32)
        with timer.stage("s3_topline_vocode"):
            out = model.apply(
                variables, key, jnp.asarray(st),
                jnp.asarray([st.shape[1]] * st.shape[0]),
                inputs["speaker_embeds"], mel_len_max=args.mel_len_max,
                method=TasteForCausalLM.vocode)
            jax.block_until_ready(out["waveform"])
    elif args.task == "reconstruction":
        lm_kwargs = {}
        if args.reconstruction_mode == "SpokenLLM":
            if "llm_token_ids" not in inputs:
                p.error("SpokenLLM reconstruction needs llm tokens "
                        "(provide --llm-tokenizer with --input-wav)")
            lm_kwargs = {k: inputs[k] for k in
                         ("llm_token_ids", "llm_token_lengths",
                          "llm_word_ids")}
        with timer.stage("reconstruction"):
            out = model.apply(
                variables, key, inputs["speaker_embeds"],
                inputs["asr_token_ids"], inputs["asr_token_lengths"],
                inputs["asr_word_ids"], inputs["audio_features"],
                mode=args.reconstruction_mode, **lm_kwargs,
                max_speech_steps=args.max_speech_steps,
                mel_len_max=args.mel_len_max,
                method=TasteForCausalLM.inference_reconstruction)
            jax.block_until_ready(out["waveform"])
    elif real_inputs:
        # real completion: joint decode + tokenizer round trip + synthesis,
        # via the same CompletionPipeline the serving engine uses
        if args.conditional_mode in ("audio", "instruct"):
            with timer.stage("extract_vq"):
                _, llm_indices = model.apply(
                    variables, inputs["asr_token_ids"],
                    inputs["asr_token_lengths"], inputs["asr_word_ids"],
                    inputs["llm_token_ids"], inputs["llm_token_lengths"],
                    inputs["llm_word_ids"], inputs["audio_features"],
                    method=TasteForCausalLM.extract_vq)
        else:
            t = int(inputs["llm_token_lengths"][0]) \
                if "llm_token_lengths" in inputs else 1
            if "llm_token_ids" not in inputs:
                inputs["llm_token_ids"] = jnp.zeros((1, 1), jnp.int32)
                inputs["llm_word_ids"] = jnp.zeros((1, 1), jnp.int32)
                inputs["llm_token_lengths"] = jnp.asarray([1], jnp.int32)
            L = cfg.audio_tower.quantizer.num_quantizers
            llm_indices = jnp.full(
                (1, inputs["llm_token_ids"].shape[1], L), -1, jnp.int32)
        pipe = CompletionPipeline(
            model, variables, llm_tokenizer=llm_tok, asr_tokenizer=asr_tok,
            max_decode_steps=args.max_decode_steps,
            max_speech_steps=args.max_speech_steps,
            mel_len_max=args.mel_len_max)
        with timer.stage("completion"):
            res = pipe(
                np.asarray(inputs["speaker_embeds"]),
                np.asarray(inputs["llm_token_ids"]),
                np.asarray(inputs["llm_word_ids"]),
                np.asarray(llm_indices),
                asr_token_ids=np.asarray(inputs["asr_token_ids"])
                if "asr_token_ids" in inputs else None,
                asr_word_ids=np.asarray(inputs["asr_word_ids"])
                if "asr_word_ids" in inputs else None,
                conditional_mode=args.conditional_mode,
                out_generated_part_only=args.out_generated_part_only,
                extra_words=args.extra_words, text_top_p=args.text_top_p,
                taste_top_p=args.taste_top_p, temperature=args.temperature,
                repetition_penalty=args.repetition_penalty, seed=args.seed,
                system_prompt=args.system_prompt)
        generated_text = res["generated_text"]
        out = {k: jnp.asarray(res[k]) for k in
               ("speech_token_ids", "speech_token_lengths", "waveform",
                "waveform_lengths")}
    else:
        # synthetic completion smoke (no tokenizers): joint decode with
        # stand-in tables + direct synthesis
        v = cfg.spoken_lm.llama.vocab_size
        tables = {"word_start": jnp.asarray(np.arange(v) % 3 == 0),
                  "banned": jnp.zeros((v,), bool),
                  "sentence_end": jnp.asarray(np.arange(v) % 7 == 0)}
        llm_ids = inputs["llm_token_ids"]
        t_tok = llm_ids.shape[1]
        llm_words = inputs["llm_word_ids"]
        asr_idx, llm_idx = model.apply(
            variables, inputs["asr_token_ids"], inputs["asr_token_lengths"],
            inputs["asr_word_ids"], llm_ids, inputs["llm_token_lengths"],
            llm_words, inputs["audio_features"],
            method=TasteForCausalLM.extract_vq)
        scfg = SamplerConfig(
            delay=cfg.spoken_lm.delay, extra_words=args.extra_words,
            text_top_p=args.text_top_p, taste_top_p=args.taste_top_p,
            text_temperature=args.temperature,
            repetition_penalty=args.repetition_penalty)
        if args.conditional_mode not in ("audio", "instruct"):
            scfg = scfg._replace(has_prefix=False)
        instruct = {}
        if args.conditional_mode == "instruct":
            # synthetic stand-in template ids (real ones come from
            # frontend.api.build_instruct_ids when --llm-tokenizer is given)
            instruct = dict(
                instruct_prefix_ids=jnp.asarray(
                    rng.randint(2, min(100, v), (4,))),
                instruct_suffix_ids=jnp.asarray(
                    rng.randint(2, min(100, v), (3,))))
        with timer.stage("completion_decode"):
            gen = model.apply(
                variables, key, scfg, tables,
                None if args.conditional_mode == "zero" else llm_idx,
                None if args.conditional_mode == "zero" else llm_ids,
                None if args.conditional_mode == "zero"
                else inputs["llm_token_lengths"],
                None if args.conditional_mode == "zero" else llm_words,
                args.conditional_mode, args.max_decode_steps, **instruct,
                method=TasteForCausalLM.generate_completion)
            jax.block_until_ready(gen["llm_token_ids"])
        n_words = int(gen["num_taste_words"][0])
        taste = gen["taste_indices"][:, :max(n_words, 1)]
        word_ids = jnp.asarray((np.arange(t_tok) % max(n_words, 1))[None])
        with timer.stage("synthesis"):
            out = model.apply(
                variables, jax.random.fold_in(key, 1),
                inputs["speaker_embeds"], taste,
                inputs["asr_token_ids"], inputs["asr_token_lengths"],
                word_ids, max_speech_steps=args.max_speech_steps,
                mel_len_max=args.mel_len_max,
                method=TasteForCausalLM.synthesize_from_taste)
            jax.block_until_ready(out["waveform"])

    sr = cfg.hift.sampling_rate
    wav = np.asarray(out["waveform"][0])
    n = int(out["waveform_lengths"][0]) or len(wav)
    if args.input_wav:
        stem = os.path.splitext(os.path.basename(args.input_wav))[0]
    else:
        stem = f"{args.task}_{args.seed}"
    wav_path = os.path.join(args.output_dir, f"{stem}.wav")
    write_wav(wav_path, wav[:n], sr)
    meta.update({
        "speech_tokens": int(out["speech_token_lengths"][0]),
        "samples": n, "sample_rate": sr,
        "timing": timer.report(audio_seconds=n / sr),
    })
    if generated_text is not None:
        meta["generated_text"] = generated_text
    if args.task == "completion":
        meta.update({
            "conditional_mode": args.conditional_mode,
            "extra_words": args.extra_words,
            "text_top_p": args.text_top_p,
            "taste_top_p": args.taste_top_p,
            "text_temperature": args.temperature,
            "repetition_penalty": args.repetition_penalty,
        })
    with open(os.path.join(args.output_dir, f"{stem}.json"), "w") as f:
        json.dump(meta, f, ensure_ascii=False, indent=2)
    print(json.dumps(meta, ensure_ascii=False))


if __name__ == "__main__":
    main()
