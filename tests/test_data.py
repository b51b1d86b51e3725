"""Data pipeline tests (synthetic examples; arrow reading is gated)."""

import numpy as np

from taste_spokenlm_tpu.data.dataset import (DEFAULT_BUCKETS, BucketBatcher,
                                             BucketSpec, collate, pick_bucket,
                                             shard_files)


def _example(na, nl, ns, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "speaker_embeds": rng.randn(16).astype(np.float32),
        "asr_token_ids": rng.randint(0, 100, na),
        "asr_word_ids": np.minimum(np.arange(na) // 2, na - 1),
        "llm_token_ids": rng.randint(0, 100, nl),
        "llm_word_ids": np.minimum(np.arange(nl) // 2, nl - 1),
        "speech_token_ids": rng.randint(0, 50, ns),
        "audio_features": rng.randn(128, 500).astype(np.float32),
        "audio_feature_lengths": 500,
    }


def test_shard_files_partition():
    files = [f"shard-{i}" for i in range(10)]
    parts = [shard_files(files, h, 3) for h in range(3)]
    together = sorted(sum(parts, []))
    assert together == sorted(files)
    assert all(set(a).isdisjoint(b) for i, a in enumerate(parts)
               for b in parts[i + 1:])


def test_pick_bucket_smallest_fit():
    assert pick_bucket(_example(20, 30, 100), DEFAULT_BUCKETS) == 0
    assert pick_bucket(_example(40, 60, 300), DEFAULT_BUCKETS) == 1
    assert pick_bucket(_example(200, 10, 10), DEFAULT_BUCKETS) is None


def test_batcher_emits_static_shapes():
    batcher = BucketBatcher(token_budget=512)
    seen = []
    examples = [_example(20, 30, 100, seed=i) for i in range(12)]
    for bucket, group in batcher(examples):
        seen.append((bucket, len(group)))
        batch = collate(group, bucket, mel_frames=500)
        assert batch["asr_token_ids"].shape == (len(group), bucket.asr_tokens)
        assert batch["speech_token_ids"].shape == (len(group), bucket.speech_tokens)
        assert batch["audio_features"].shape == (len(group), 128, 500)
        assert (batch["asr_token_lengths"] == 20).all()
    assert seen, "no batches emitted"
    # bucket 0 (speech 256) with budget 512 -> batch size 2
    assert all(n == 2 for _, n in seen)


def test_overlong_dropped_and_counted():
    batcher = BucketBatcher()
    list(batcher([_example(500, 500, 5000)]))
    assert batcher.n_dropped == 1


def test_collate_pads_with_zeros():
    bucket = BucketSpec(32, 48, 256)
    batch = collate([_example(20, 30, 100)], bucket, mel_frames=500)
    assert (batch["asr_token_ids"][0, 20:] == 0).all()
    assert batch["asr_token_lengths"][0] == 20
    assert (batch["speech_token_ids"][0, 100:] == 0).all()


def test_stage2_jsonl_dataset(tmp_path):
    """Stage-2 jsonl shards -> bucketed static batches with IGNORE padding."""
    import json
    from taste_spokenlm_tpu.data.dataset import Stage2JsonlDataset

    rng = np.random.RandomState(0)
    rows = []
    for t in (5, 7, 40, 60, 100, 300):   # last one overlong -> dropped
        rows.append({
            "llm_indices": rng.randint(0, 32, (t, 4)).tolist(),
            "llm_token_ids": rng.randint(1, 100, (t,)).tolist(),
            "llm_word_ids": (np.arange(t) // 2).tolist(),
        })
    f = tmp_path / "part-0.jsonl"
    f.write_text("\n".join(json.dumps(r) for r in rows))

    ds = Stage2JsonlDataset([str(f)], llm_buckets=(8, 48, 128),
                            token_budget=128)
    batches = list(ds.batches(epoch=0))
    assert ds.n_dropped == 1                      # the 300-token row
    total = sum(b["llm_token_ids"].shape[0] for b in batches)
    assert total == 5
    for b in batches:
        t = b["llm_token_ids"].shape[1]
        assert t in (8, 48, 128)
        assert b["llm_indices"].shape == (b["llm_token_ids"].shape[0], t, 4)
        for i, n in enumerate(b["llm_token_lengths"]):
            assert (b["llm_indices"][i, n:] == -1).all()   # IGNORE padding
            assert (b["llm_token_ids"][i, n:] == 0).all()

    # host sharding: two hosts split the shard files disjointly
    f2 = tmp_path / "part-1.jsonl"
    f2.write_text(f.read_text())
    d0 = Stage2JsonlDataset([str(f), str(f2)], host_index=0, host_count=2)
    d1 = Stage2JsonlDataset([str(f), str(f2)], host_index=1, host_count=2)
    assert set(d0.files).isdisjoint(d1.files)
    assert set(d0.files) | set(d1.files) == {str(f), str(f2)}
