"""Model components: whisper tokenizer backbone, conformer stack, RVQ,
audio tower, speech decoder, spoken LM, flow matching, HiFT vocoder."""
