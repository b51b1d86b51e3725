#!/usr/bin/env python
"""Generation CLI: reconstruction / conditional completion tasks.

Equivalent of /root/reference/scripts/generate_audio.py:31-262, which drives
SpeechAutoEncoder / SpokenLLM reconstruction and conditional audio/text
completion and writes wav + metadata JSON.

With pretrained assets absent in this image, the script supports a
--seed-model dir (from create_seed_model.py) and synthetic inputs to
exercise the full path; with converted real weights it runs the same flows.

Usage:
  python scripts/generate_audio.py --seed-model ./seed --task reconstruction \
      --output-dir ./gen --tiny
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seed-model", required=True)
    p.add_argument("--task", default="reconstruction",
                   choices=["reconstruction", "completion"])
    p.add_argument("--conditional-mode", default="audio",
                   choices=["audio", "text", "zero", "instruct"],
                   help="completion conditioning (generate_audio.py tasks "
                        "SpokenLLM_Conditional_Compl / _Text_Compl; forced-"
                        "text voice-control prompts = pass text via the "
                        "processor instead of ASR; instruct wraps the audio "
                        "prefix in chat-template ids)")
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
    p.add_argument("--mel-len-max", type=int, default=128)
    p.add_argument("--use-target-speech-token", action="store_true",
                   help="s3-topline ablation (reference bin/eval_audio.py "
                        "--use_target_speech_token / eval_s3.sh): vocode the "
                        "ground-truth S3 tokens directly, bypassing tower + "
                        "speech decoder — the flow/vocoder quality ceiling")
    p.add_argument("--target-speech-tokens", default=None,
                   help="path to a .npy [B, T] int array of S3 tokens for "
                        "--use-target-speech-token (default: synthetic)")
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
    from taste_spokenlm_tpu.models.sampler import SamplerConfig
    from taste_spokenlm_tpu.models.taste import TasteForCausalLM
    from taste_spokenlm_tpu.pretrained import from_pretrained
    from taste_spokenlm_tpu.utils.profiling import StageTimer

    model, variables, _ = from_pretrained(args.seed_model)
    cfg = model.config

    rng = np.random.RandomState(args.seed)
    b, t_tok = 1, 8
    inputs = dict(
        speaker_embeds=jnp.asarray(
            rng.randn(b, cfg.speech_decoder.spk_embed_dim), jnp.float32),
        asr_token_ids=jnp.asarray(rng.randint(
            5, min(100, cfg.audio_tower.whisper.vocab_size), (b, t_tok))),
        asr_token_lengths=jnp.asarray([t_tok]),
        asr_word_ids=jnp.asarray((np.arange(t_tok) // 2)[None]),
        audio_features=jnp.asarray(rng.randn(
            b, cfg.audio_tower.whisper.n_mels,
            cfg.audio_tower.whisper.max_source_positions * 2), jnp.float32),
    )

    os.makedirs(args.output_dir, exist_ok=True)
    timer = StageTimer()
    key = jax.random.PRNGKey(args.seed)

    if args.task == "reconstruction" and args.use_target_speech_token:
        if args.target_speech_tokens:
            st = np.load(args.target_speech_tokens).astype(np.int32)
        else:
            st = rng.randint(0, cfg.speech_decoder.speech_token_size,
                             (b, args.max_speech_steps)).astype(np.int32)
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
            v = cfg.spoken_lm.llama.vocab_size
            lm_kwargs = dict(
                llm_token_ids=jnp.asarray(
                    rng.randint(2, min(100, v), (b, t_tok))),
                llm_token_lengths=jnp.asarray([t_tok]),
                llm_word_ids=jnp.asarray((np.arange(t_tok) // 2)[None]))
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
    else:
        v = cfg.spoken_lm.llama.vocab_size
        tables = {"word_start": jnp.asarray(np.arange(v) % 3 == 0),
                  "banned": jnp.zeros((v,), bool),
                  "sentence_end": jnp.asarray(np.arange(v) % 7 == 0)}
        llm_ids = jnp.asarray(rng.randint(2, min(100, v), (b, t_tok)))
        llm_words = jnp.asarray((np.arange(t_tok) // 2)[None])
        asr_idx, llm_idx = model.apply(
            variables, inputs["asr_token_ids"], inputs["asr_token_lengths"],
            inputs["asr_word_ids"], llm_ids, jnp.asarray([t_tok]), llm_words,
            inputs["audio_features"], method=TasteForCausalLM.extract_vq)
        scfg = SamplerConfig(
            delay=cfg.spoken_lm.delay, extra_words=args.extra_words,
            text_top_p=args.text_top_p, taste_top_p=args.taste_top_p,
            text_temperature=args.temperature,
            repetition_penalty=args.repetition_penalty)
        if args.conditional_mode not in ("audio", "instruct"):
            scfg = scfg._replace(has_prefix=False)
        instruct = {}
        if args.conditional_mode == "instruct":
            # chat-template wrapper ids around the fused audio prefix
            # (modeling_taste.py:1101-1124); synthetic stand-ins here, real
            # template ids when a tokenizer is wired in
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
                None if args.conditional_mode == "zero" else jnp.asarray([t_tok]),
                None if args.conditional_mode == "zero" else llm_words,
                args.conditional_mode, 64, **instruct,
                method=TasteForCausalLM.generate_completion)
            jax.block_until_ready(gen["llm_token_ids"])
        n_words = int(gen["num_taste_words"][0])
        taste = gen["taste_indices"][:, :max(n_words, 1)]
        word_ids = jnp.asarray((np.arange(t_tok) % max(n_words, 1))[None])
        with timer.stage("synthesis"):
            out = model.apply(
                variables, jax.random.fold_in(key, 1),
                inputs["speaker_embeds"], taste,
                inputs["asr_token_ids"], inputs["asr_token_lengths"], word_ids,
                max_speech_steps=args.max_speech_steps,
                mel_len_max=args.mel_len_max,
                method=TasteForCausalLM.synthesize_from_taste)
            jax.block_until_ready(out["waveform"])

    sr = cfg.hift.sampling_rate
    wav = np.asarray(out["waveform"][0])
    n = int(out["waveform_lengths"][0]) or len(wav)
    wav_path = os.path.join(args.output_dir, f"{args.task}_{args.seed}.wav")
    write_wav(wav_path, wav[:n], sr)
    meta = {
        "task": args.task, "seed": args.seed,
        "sampling": {"extra_words": args.extra_words,
                     "text_top_p": args.text_top_p,
                     "taste_top_p": args.taste_top_p,
                     "temperature": args.temperature,
                     "repetition_penalty": args.repetition_penalty},
        "speech_tokens": int(out["speech_token_lengths"][0]),
        "samples": n, "sample_rate": sr,
        "timing": timer.report(audio_seconds=n / sr),
    }
    with open(wav_path.replace(".wav", ".json"), "w") as f:
        json.dump(meta, f, indent=2)
    print(json.dumps(meta))


if __name__ == "__main__":
    main()
