#!/usr/bin/env python
"""Convert reference PyTorch checkpoints into this framework's orbax format.

Covers the reference's warm-start paths (SURVEY.md §5 checkpoint/resume (c)):
- HF whisper / distil-whisper dirs -> audio tower encoder+decoder
- HF Llama dir -> spoken LM backbone
- taste_speech composite ckpt (pytorch_model.bin / model.safetensors) ->
  speech decoder + RVQ + bridges
- CosyVoice flow.pt / hift.pt -> voice generator
(the reference equivalent is convert_to_hf_compatible.py + the
load_from_cosyvoice_ckpt importers, modeling_taste.py:97-106,346-353)

Also the EXPORT direction (inverse; the reference ships this as
STAGE1_TRAIN/.../convert_to_hf_compatible.py, README.md:101): a checkpoint
trained in THIS framework becomes a reference-named torch state dict the
taste_speech stack can `load_state_dict`:

  python scripts/convert_checkpoint.py --export-torch ./my_ckpt_dir \
      --output ./exported   # writes pytorch_model.bin + config.json

Usage:
  python scripts/convert_checkpoint.py --whisper path/ --llama path/ \
      --taste path.bin --flow flow.pt --hift hift.pt --output ./converted
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_torch(path):
    import torch
    if path.endswith(".safetensors"):
        from safetensors.torch import load_file
        return load_file(path)
    return torch.load(path, map_location="cpu", weights_only=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--whisper", help="HF whisper dir (tokenizer tower)")
    p.add_argument("--llama", help="HF llama dir (spoken LM backbone)")
    p.add_argument("--taste", help="taste_speech composite torch ckpt")
    p.add_argument("--flow", help="CosyVoice flow.pt")
    p.add_argument("--hift", help="CosyVoice hift.pt")
    p.add_argument("--output", required=True)
    p.add_argument("--export-torch", metavar="CKPT_DIR",
                   help="EXPORT direction: checkpoint dir (config.json + "
                        "params/) from this framework -> reference-named "
                        "torch state dict in --output")
    p.add_argument("--merge-lora", action="store_true",
                   help="merge the stage-2 LoRA adapters into the spoken-LM "
                        "base kernels (W' = W + alpha/r A@B, exact in "
                        "float) and drop them — serving-time peft "
                        "merge_and_unload; pair with use_lora=False and "
                        "run BEFORE --quantize-llama")
    p.add_argument("--quantize-llama", action="store_true",
                   help="store the spoken-LM backbone's base kernels as "
                        "int8 + per-channel scales (weight-only serving "
                        "quantization; pair with "
                        "llama.quantized_serving=True)")
    p.add_argument("--quantize-s3-decoder", action="store_true",
                   help="int8-quantize the speech decoder's AR llm stack "
                        "(pair with speech_decoder.llm.quantized_serving)")
    p.add_argument("--fuse-qkv", action="store_true",
                   help="emit the fused_qkv_serving layout with "
                        "--quantize-llama / --quantize-s3-decoder: q/k/v "
                        "(and gate/up) concatenated into single GEMV "
                        "kernels — identical math, fewer per-step ops; "
                        "requires --merge-lora (or an adapter-free ckpt)")
    p.add_argument("--fused-mlp", action="store_true",
                   help="emit the fused_mlp_serving layout with "
                        "--quantize-llama / --quantize-s3-decoder: the "
                        "whole MLP served as one Pallas call "
                        "(ops/pallas/fused_mlp); gate/up/down stay "
                        "separate and int4 packs the second projection "
                        "per-tile; requires --merge-lora")
    p.add_argument("--config", help="config.json to start from when writing "
                        "the output dir's config (default: TasteConfig."
                        "full()); serving transforms (--merge-lora/"
                        "--quantize-*/--fuse-qkv) are reflected in the "
                        "written config so from_pretrained(output) works "
                        "with no hand edits")
    args = p.parse_args()

    from taste_spokenlm_tpu.utils import convert
    from taste_spokenlm_tpu.utils.checkpoint import save_params

    if args.export_torch:
        import shutil
        import torch
        from taste_spokenlm_tpu.utils import export
        from taste_spokenlm_tpu.utils.checkpoint import load_params
        variables = load_params(os.path.join(args.export_torch, "params"))
        state = export.to_torch(export.composite_taste_state(variables))
        os.makedirs(args.output, exist_ok=True)
        torch.save(state, os.path.join(args.output, "pytorch_model.bin"))
        cfg_src = os.path.join(args.export_torch, "config.json")
        if os.path.exists(cfg_src):
            shutil.copy(cfg_src, os.path.join(args.output, "config.json"))
        n = sum(v.numel() for v in state.values())
        print(f"exported {len(state)} tensors ({n/1e6:.1f}M values) to "
              f"{args.output}/pytorch_model.bin")
        return

    tree = {"params": {}, "quantizer": {}}

    if args.whisper:
        import transformers
        model = transformers.WhisperModel.from_pretrained(args.whisper)
        tree["params"].setdefault("audio_tower", {})["encoder"] = \
            convert.whisper_encoder_params(model.encoder.state_dict())
        tree["params"]["audio_tower"]["decoder"] = \
            convert.whisper_decoder_params(model.decoder.state_dict())
        print("converted whisper tower")

    if args.llama:
        import transformers
        model = transformers.LlamaForCausalLM.from_pretrained(args.llama)
        tree["params"].setdefault("spoken_lm", {})["language_model"] = \
            convert.llama_params(model.model.state_dict(), prefix="")
        print("converted llama backbone")

    if args.taste:
        state = _load_torch(args.taste)
        tree["params"]["speech_decoder"] = convert.speech_decoder_params(state)
        vq_params, vq_state = convert.rvq_state(state, "audio_tower.vq.rvq.")
        tree["params"].setdefault("audio_tower", {})["vq"] = vq_params
        tree["quantizer"] = {"audio_tower": {"vq": vq_state}}
        print("converted speech decoder + RVQ")
        tower = convert.audio_tower_params(state)
        if tower:
            tree["params"].setdefault("audio_tower", {}).update(tower)
            print("converted audio tower (joint encoder-segmenter)")
        if any(k.startswith("spoken_lm.") for k in state):
            tree["params"]["spoken_lm"] = convert.spoken_lm_params(state)
            print("converted spoken LM (LoRA llama + bridges)")

    if args.flow:
        state = {f"flow.{k}": v for k, v in _load_torch(args.flow).items()}
        tree["params"].setdefault("voice_generator", {})["flow"] = \
            convert.flow_params(state)
        print("converted flow")

    if args.hift:
        state = {f"hift.{k}": v for k, v in _load_torch(args.hift).items()}
        tree["params"].setdefault("voice_generator", {})["hift"] = \
            convert.hift_params(state)
        print("converted hift")

    # base config: --config > an existing config.json in --output >
    # TasteConfig.full().  Resolved BEFORE the transforms so --merge-lora
    # uses the checkpoint's actual LoRA scale, and so a re-run over an
    # existing dir doesn't clobber its architecture with full() defaults.
    from taste_spokenlm_tpu.config import LoraConfig, TasteConfig
    out_cfg_path = os.path.join(args.output, "config.json")
    if args.config:
        with open(args.config) as f:
            cfg = TasteConfig.from_dict(json.load(f))
    elif os.path.exists(out_cfg_path):
        with open(out_cfg_path) as f:
            cfg = TasteConfig.from_dict(json.load(f))
    else:
        cfg = TasteConfig.full()

    if args.merge_lora:
        lm = tree["params"].get("spoken_lm", {}).get("language_model")
        if lm is None:
            sys.exit("--merge-lora needs a converted spoken-LM backbone "
                     "with adapters (--taste checkpoint)")
        from taste_spokenlm_tpu.utils.quant import merge_lora_params
        lora = cfg.spoken_lm.lora or LoraConfig()
        tree["params"]["spoken_lm"]["language_model"] = \
            merge_lora_params(lm, lora.alpha, lora.r)
        print(f"merged LoRA adapters into base kernels "
              f"(alpha={lora.alpha}, r={lora.r}); serve with use_lora=False")

    if args.quantize_llama:
        lm = tree["params"].get("spoken_lm", {}).get("language_model")
        if lm is None:
            sys.exit("--quantize-llama needs a converted spoken-LM backbone "
                     "(--llama or a composite --taste checkpoint)")
        from taste_spokenlm_tpu.utils.quant import quantize_llama_params
        tree["params"]["spoken_lm"]["language_model"] = \
            quantize_llama_params(lm, fuse_qkv=args.fuse_qkv,
                                  fused_mlp=args.fused_mlp)
        print("quantized spoken-LM base kernels to int8"
              + (" (fused qkv/gateup layout)" if args.fuse_qkv else "")
              + (" (fused-MLP kernels)" if args.fused_mlp else ""))

    if args.quantize_s3_decoder:
        sd = tree["params"].get("speech_decoder", {})
        if "llm" not in sd:
            sys.exit("--quantize-s3-decoder needs a converted speech "
                     "decoder (--taste checkpoint)")
        from taste_spokenlm_tpu.utils.quant import (_quantize_dense_leaf,
                                                    quantize_encoder_params)
        sd["llm"] = quantize_encoder_params(sd["llm"], fuse_qkv=args.fuse_qkv,
                                            fused_mlp=args.fused_mlp)
        if "llm_decoder" in sd:   # logits head rides the same serving flag
            sd["llm_decoder"] = _quantize_dense_leaf(sd["llm_decoder"])
        print("quantized S3 decoder llm stack + logits head to int8"
              + (" (fused qkv layout)" if args.fuse_qkv else ""))

    os.makedirs(args.output, exist_ok=True)
    save_params(os.path.join(args.output, "params"), tree)

    # config.json mirroring the applied serving transforms, so
    # `from_pretrained(args.output)` builds modules whose param layout
    # matches the saved tree with no hand edits
    if args.merge_lora:
        cfg = cfg.replace(spoken_lm=cfg.spoken_lm.replace(use_lora=False))
    if args.quantize_llama:
        cfg = cfg.replace(spoken_lm=cfg.spoken_lm.replace(
            llama=cfg.spoken_lm.llama.replace(
                quantized_serving="int8",
                fused_qkv_serving=args.fuse_qkv,
                fused_mlp_serving=args.fused_mlp)))
    if args.quantize_s3_decoder:
        cfg = cfg.replace(speech_decoder=cfg.speech_decoder.replace(
            llm=cfg.speech_decoder.llm.replace(
                quantized_serving="int8",
                fused_qkv_serving=args.fuse_qkv,
                fused_mlp_serving=args.fused_mlp)))
    with open(os.path.join(args.output, "config.json"), "w") as f:
        f.write(cfg.to_json())

    n = sum(np.asarray(x).size for x in _flatten(tree))
    print(f"saved {args.output} ({n/1e6:.1f}M values)")


def _flatten(tree):
    import jax
    return jax.tree_util.tree_leaves(tree)


if __name__ == "__main__":
    main()
