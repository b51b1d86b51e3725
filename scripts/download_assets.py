#!/usr/bin/env python
"""Download the pretrained assets + TASTE-Dump data this framework consumes.

Equivalent of /root/reference/storage/download_pretrained.py:8-30 and
download_data.py:1-47.  After downloading, convert torch checkpoints to
orbax with scripts/convert_checkpoint.py; the two ONNX graphs
(campplus.onnx / speech_tokenizer_v1.onnx inside CosyVoice-300M) run
directly via frontend/onnx_exec.py — no conversion needed.

Requires network egress + huggingface_hub (this build environment has
neither; run where HF Hub is reachable).

Usage:
  python scripts/download_assets.py --root ./storage [--data] [--debug]
"""

import argparse
import os
import sys

PRETRAINED = (
    # (repo_id, local subdir) — download_pretrained.py:8-30
    ("model-scope/CosyVoice-300M", "pretrained_models/CosyVoice-300M"),
    ("distil-whisper/distil-large-v3", "pretrained_models/distil-large-v3"),
    ("openai/whisper-large-v3", "pretrained_models/whisper-large-v3"),
    ("unsloth/Llama-3.2-1B", "pretrained_models/Llama-3.2-1B"),
)

DATA_REPO = "MediaTek-Research/TASTE-Dump"
DATA_PATTERNS = ("data/test/*arrow", "data/dev/*arrow", "data/train/*arrow")
DEBUG_PATTERNS = (
    "data/test/emilia-dataset-train-02207-of-04908-taste.arrow",
    "data/dev/emilia-dataset-train-02191-of-04908-taste.arrow",
    "data/train/emilia-dataset-train-0007*-of-04908-taste.arrow",
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="./storage")
    p.add_argument("--data", action="store_true",
                   help="also fetch the TASTE-Dump arrow shards")
    p.add_argument("--debug", action="store_true",
                   help="small data subset (download_data.py DEBUG_MODE)")
    args = p.parse_args()

    if os.environ.get("HF_HUB_OFFLINE") == "1":
        sys.exit("HF_HUB_OFFLINE=1 — no egress in this environment; run "
                 "this script on a connected machine")
    try:
        from huggingface_hub import snapshot_download
    except ImportError:
        sys.exit("huggingface_hub is not installed")

    for repo_id, sub in PRETRAINED:
        dest = os.path.join(args.root, sub)
        print(f"downloading {repo_id} -> {dest}")
        snapshot_download(repo_id=repo_id, repo_type="model", local_dir=dest)

    if args.data:
        patterns = DEBUG_PATTERNS if args.debug else DATA_PATTERNS
        for pat in patterns:
            print(f"downloading {DATA_REPO}:{pat}")
            snapshot_download(repo_id=DATA_REPO, repo_type="dataset",
                              allow_patterns=[pat], local_dir=args.root)
    print("done; next: scripts/convert_checkpoint.py")


if __name__ == "__main__":
    main()
