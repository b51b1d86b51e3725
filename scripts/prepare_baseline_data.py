#!/usr/bin/env python
"""Baseline-data preparation for the likelihood eval (VERDICT r4 missing-#2).

Re-design of
/root/reference/STAGE1_TRAIN/SpokenLM/scripts/prepare_baseline_data.py:1-134,
which extracts per-utterance (llama-tokenized text, S3 speech tokens) pairs
from TASTE-Dump arrow shards for baseline spoken-LM training/eval.  The
reference implements its `parallel` mode and lists the stream layouts as
TODOs (:2-4); all four are implemented here:

  parallel             {llm_text_token_ids, s3_token_ids} as separate
                       streams (the reference's `-llm.arrow` record)
  padding              both channels padded to one shared length so a
                       two-stream baseline trains on aligned rows
  sentence_interleave  ONE token stream per utterance:
                       [text ids][SEP][s3 ids (offset by text vocab)]
  word_interleave      per word: its text ids then its proportional S3
                       span, concatenated into one stream

Output: jsonl shards (the framework's stage-2 shard convention,
scripts/extract_vq.py) + an optional SELECTION set: per utterance, the
prefix plus the real continuation and a rotated-distractor continuation —
`scripts/eval.py --selection-data` scores both with the spoken LM and
reports choose-the-real-continuation accuracy (the reference's
calculate_log_likelihood protocol, taslm/modeling_taslm.py:324-377, turned
into a round-trip metric).

Usage:
  python scripts/prepare_baseline_data.py --data shard.arrow \
      --llm-tokenizer TOKDIR --output-dir out/ --layout parallel \
      --selection-out out/selection.jsonl
"""

import argparse
import glob as globlib
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEP_TOKEN = -100  # layout-level separator marker (consumers remap)


def word_spans(n_tokens_per_word, s3_len):
    """Proportional S3 span per word (the word-level alignment the
    reference leaves as TODO; durations are unavailable in the dump, so
    spans split the S3 stream proportionally to word count)."""
    n_words = len(n_tokens_per_word)
    bounds = np.linspace(0, s3_len, n_words + 1).round().astype(int)
    return list(zip(bounds[:-1], bounds[1:]))


def make_record(text, llm_ids, s3_ids, layout, text_vocab,
                per_word_ids=None):
    rec = {"text": text,
           "llm_text_token_ids": [int(x) for x in llm_ids],
           "llm_text_token_ids_len": len(llm_ids),
           "s3_token_ids_len": len(s3_ids)}
    if layout == "parallel":
        rec["s3_token_ids"] = [int(x) for x in s3_ids]
        return rec
    if layout == "padding":
        n = max(len(llm_ids), len(s3_ids))
        rec["text_stream"] = [int(x) for x in llm_ids] + \
            [SEP_TOKEN] * (n - len(llm_ids))
        rec["s3_stream"] = [int(x) for x in s3_ids] + \
            [SEP_TOKEN] * (n - len(s3_ids))
        return rec
    if layout == "sentence_interleave":
        rec["stream"] = ([int(x) for x in llm_ids] + [SEP_TOKEN]
                         + [int(x) + text_vocab for x in s3_ids])
        return rec
    if layout == "word_interleave":
        spans = word_spans([len(w) for w in per_word_ids], len(s3_ids))
        stream = []
        for ids, (a, b) in zip(per_word_ids, spans):
            stream.extend(int(x) for x in ids)
            stream.extend(int(x) + text_vocab for x in s3_ids[a:b])
        rec["stream"] = stream
        return rec
    raise ValueError(layout)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", nargs="+", required=True,
                   help="TASTE-Dump arrow shards (globs ok)")
    p.add_argument("--llm-tokenizer", required=True)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--layout", default="parallel",
                   choices=["parallel", "padding", "sentence_interleave",
                            "word_interleave"])
    p.add_argument("--text-vocab", type=int, default=128256,
                   help="text vocab size (S3 ids are offset past it in the "
                        "interleaved streams)")
    p.add_argument("--selection-out", default=None,
                   help="also emit the selection eval set (real vs rotated "
                        "distractor continuations) to this jsonl")
    args = p.parse_args()

    import datasets
    from transformers import AutoTokenizer
    tok = AutoTokenizer.from_pretrained(args.llm_tokenizer)
    os.makedirs(args.output_dir, exist_ok=True)

    files = [f for pat in args.data
             for f in (sorted(globlib.glob(pat)) or [pat])]
    all_rows = []
    for f in files:
        ds = datasets.Dataset.from_file(f)
        base = os.path.basename(f).split(".")[0]
        out_path = os.path.join(args.output_dir, f"{base}-llm.jsonl")
        n = 0
        with open(out_path, "w") as fw:
            for row in ds:
                text = row["json"]["text"].strip()
                llm_ids = tok(text, add_special_tokens=False).input_ids
                s3 = list(row["s3_token"])
                per_word = None
                if args.layout == "word_interleave":
                    per_word = [tok(w, add_special_tokens=False).input_ids
                                for w in (text.split() or [text])]
                rec = make_record(text, llm_ids, s3, args.layout,
                                  args.text_vocab, per_word)
                fw.write(json.dumps(rec) + "\n")
                all_rows.append({"text": text, "llm_ids": llm_ids})
                n += 1
        print(f"{out_path}: {n} records ({args.layout})")

    if args.selection_out:
        # real-vs-distractor continuation pairs: the distractor is the next
        # utterance's continuation (rotation keeps lengths comparable)
        with open(args.selection_out, "w") as fw:
            m = len(all_rows)
            written = 0
            for i, row in enumerate(all_rows):
                ids = row["llm_ids"]
                if len(ids) < 4:
                    continue
                cut = max(len(ids) // 2, 1)
                other = all_rows[(i + 1) % m]["llm_ids"]
                ocut = max(len(other) // 2, 1)
                distract = other[ocut:]
                if not distract:
                    continue
                fw.write(json.dumps({
                    "prefix": [int(x) for x in ids[:cut]],
                    "real": [int(x) for x in ids[cut:]],
                    "distractor": [int(x) for x in distract]}) + "\n")
                written += 1
        print(f"{args.selection_out}: {written} selection pairs")


if __name__ == "__main__":
    main()
