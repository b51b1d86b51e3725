#!/usr/bin/env python
"""Training CLI: stage-1 tokenizer curriculum and stage-2 joint LM.

Replaces the reference's three drivers — `accelerate launch scripts/run.py`
(HF Trainer + DeepSpeed), `torchrun cosyvoice/bin/train.py` (DDP executor),
and `train_taslm.py` — with one pjit loop over the ("data","model") mesh.

Stage-1 curriculum (run_train_taste.sh 3 phases):
  --phase text_only   : train decoder on text only   (skip audio)
  --phase no_vq       : + audio path, no quantization (skip_vq)
  --phase rvq         : full RVQ (default)
Stage 2:
  --stage 2           : LoRA joint LM (bridges + adapters trainable)

Usage (synthetic smoke run):
  python scripts/train.py --tiny --synthetic --steps 20 --workdir /tmp/tt
"""

import argparse
import itertools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synthetic_batches(cfg, batch_size, stage):
    """Endless random batches shaped like the data pipeline output (dev/CI)."""
    import numpy as np
    rng = np.random.RandomState(0)
    t_tok, t_sp, t_llm = 8, 12, 8
    t_mel = cfg.audio_tower.whisper.max_source_positions * 2
    while True:
        if stage == 1:
            yield {
                "speaker_embeds": rng.randn(
                    batch_size, cfg.speech_decoder.spk_embed_dim).astype("f4"),
                "asr_token_ids": rng.randint(
                    5, cfg.audio_tower.whisper.vocab_size,
                    (batch_size, t_tok)).astype("i4"),
                "asr_token_lengths": np.full((batch_size,), t_tok, "i4"),
                "asr_word_ids": np.tile((np.arange(t_tok) // 2)[None],
                                        (batch_size, 1)).astype("i4"),
                "audio_features": rng.randn(
                    batch_size, cfg.audio_tower.whisper.n_mels,
                    t_mel).astype("f4"),
                "speech_token_ids": rng.randint(
                    0, cfg.speech_decoder.speech_token_size,
                    (batch_size, t_sp)).astype("i4"),
                "speech_token_lengths": np.full((batch_size,), t_sp, "i4"),
            }
        else:
            yield {
                "llm_indices": rng.randint(
                    -1, cfg.audio_tower.quantizer.codebook_size,
                    (batch_size, t_llm, cfg.audio_tower.quantizer.num_quantizers)
                ).astype("i4"),
                "llm_token_ids": rng.randint(
                    2, cfg.spoken_lm.llama.vocab_size,
                    (batch_size, t_llm)).astype("i4"),
                "llm_token_lengths": np.full((batch_size,), t_llm, "i4"),
                "llm_word_ids": np.tile((np.arange(t_llm) // 2)[None],
                                        (batch_size, 1)).astype("i4"),
            }


def synthetic_flow_batches(cfg, batch_size):
    """Endless random flow-matching batches (dev/CI): S3 tokens + CosyVoice
    mel targets + x-vectors, shaped like data.dataset.FlowDataset output."""
    import numpy as np
    rng = np.random.RandomState(0)
    fc = cfg.flow
    t_tok, t_mel = 16, 24
    while True:
        yield {
            "speech_token_ids": rng.randint(
                0, fc.vocab_size, (batch_size, t_tok)).astype("i4"),
            "speech_token_lengths": np.full((batch_size,), t_tok, "i4"),
            "feat": rng.randn(batch_size, t_mel, fc.output_size).astype("f4"),
            "feat_lengths": np.full((batch_size,), t_mel, "i4"),
            "embedding": rng.randn(
                batch_size, fc.spk_embed_dim).astype("f4"),
        }


def flow_batches(args, cfg):
    """Endless epochs of flow-matching batches from TASTE-Dump arrow shards
    (audio -> 22.05 kHz resample -> CosyVoice mel; s3_token; spk_emb)."""
    import jax
    from taste_spokenlm_tpu.data.dataset import FlowDataset

    if not args.data:
        raise SystemExit("--data <arrow shards> is required without --synthetic")
    ds = FlowDataset(
        _expand_globs(args.data),
        host_index=jax.process_index(), host_count=jax.process_count(),
        seed=args.seed, token_budget=args.token_budget,
        n_mels=cfg.flow.output_size,
        token_frame_rate=cfg.flow.input_frame_rate)
    for epoch in itertools.count():
        yield from ds.batches(epoch)


def _expand_globs(patterns):
    import glob
    files = []
    for pat in patterns:
        hits = sorted(glob.glob(pat))
        files.extend(hits if hits else [pat])
    return files


def stage1_batches(args, cfg):
    """Endless epochs over the TASTE-Dump arrow shards (host-sharded,
    bucket-batched) — the real-data stage-1 path."""
    import jax
    from transformers import AutoTokenizer
    from taste_spokenlm_tpu.data.dataset import Stage1Dataset
    from taste_spokenlm_tpu.frontend.processor import TasteProcessor

    if not args.data:
        raise SystemExit("--data <arrow shards> is required without --synthetic")
    if not (args.asr_tokenizer and args.llm_tokenizer):
        raise SystemExit("--asr-tokenizer/--llm-tokenizer local dirs are "
                         "required for the real-data path")
    proc = TasteProcessor(
        asr_tokenizer=AutoTokenizer.from_pretrained(args.asr_tokenizer),
        llm_tokenizer=AutoTokenizer.from_pretrained(args.llm_tokenizer))
    ds = Stage1Dataset(
        _expand_globs(args.data),
        tokenize_fn=lambda text: proc.process_text(text=text),
        host_index=jax.process_index(), host_count=jax.process_count(),
        seed=args.seed, token_budget=args.token_budget,
        n_mels=cfg.audio_tower.whisper.n_mels,
        mel_frames=2 * cfg.audio_tower.whisper.max_source_positions)
    for epoch in itertools.count():
        yield from ds.batches(epoch)


def stage2_batches(args):
    """Endless epochs over the extract_vq jsonl shards (stage-2 SLM)."""
    import jax
    from taste_spokenlm_tpu.data.dataset import Stage2JsonlDataset

    if not args.stage2_data:
        raise SystemExit("--stage2-data <jsonl shards> is required for "
                         "--stage 2 without --synthetic")
    ds = Stage2JsonlDataset(
        _expand_globs(args.stage2_data),
        host_index=jax.process_index(), host_count=jax.process_count(),
        seed=args.seed, token_budget=args.token_budget)
    for epoch in itertools.count():
        yield from ds.batches(epoch)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stage", type=int, default=1, choices=[1, 2])
    p.add_argument("--model", default="taste", choices=["taste", "flow"],
                   help="taste: the stage-1/2 composite (default). "
                        "flow: the token->mel flow-matching acoustic model "
                        "(OT-CFM loss; the executor generality of "
                        "cosyvoice/bin/train.py:87-151 + "
                        "flow/flow_matching.py:99-138)")
    p.add_argument("--phase", default="rvq",
                   choices=["text_only", "no_vq", "rvq"])
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--data", nargs="*", default=[],
                   help="stage-1 arrow shard files (globs ok)")
    p.add_argument("--stage2-data", nargs="*", default=[],
                   help="stage-2 jsonl shards from scripts/extract_vq.py")
    p.add_argument("--asr-tokenizer", default=None,
                   help="local dir for the whisper tokenizer (AutoTokenizer)")
    p.add_argument("--llm-tokenizer", default=None,
                   help="local dir for the llama tokenizer (AutoTokenizer)")
    p.add_argument("--token-budget", type=int, default=2048,
                   help="per-batch token budget for bucket batching")
    p.add_argument("--seed", type=int, default=0)
    # multihost bootstrap (the torchrun/c10d-rendezvous equivalent)
    p.add_argument("--coordinator", default=None,
                   help="host:port of process 0 (multihost training)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--init", default=None, help="seed-model dir to warm-start")
    p.add_argument("--workdir", default="./workdir")
    p.add_argument("--steps", type=int, default=10000)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--lr", type=float, default=1.6e-4)
    p.add_argument("--warmup", type=int, default=5000)
    p.add_argument("--grad-clip", type=float, default=5.0)
    p.add_argument("--remat", default="off",
                   choices=["off", "full", "dots", "dots_no_batch"],
                   help="per-layer gradient checkpointing policy")
    p.add_argument("--data-parallel", type=int, default=None)
    p.add_argument("--model-parallel", type=int, default=1)
    p.add_argument("--ref-kl", action="store_true",
                   help="stage 2: add KL to the adapter-disabled frozen base "
                        "(computed in-graph; modeling_taste.py:864-877)")
    p.add_argument("--log-every", type=int, default=50)
    p.add_argument("--save-every", type=int, default=1000)
    p.add_argument("--platform", default=None,
                   help="cpu | tpu | default (sitecustomize-proof)")
    args = p.parse_args()

    from taste_spokenlm_tpu.utils.platform import force_platform
    force_platform(args.platform)

    import jax

    # multihost: explicit flags, or env-driven (JAX_COORDINATOR_ADDRESS et
    # al. on cloud TPU pods jax.distributed autodetects with no arguments)
    if args.coordinator is not None:
        jax.distributed.initialize(args.coordinator, args.num_processes,
                                   args.process_id)
    elif os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
    if jax.process_count() > 1:
        # pre-warm the cross-process (per-process-leader) gloo clique NOW,
        # while every process sits in lockstep right after rendezvous: the
        # first checkpoint save runs a process_allgather (orbax v1
        # execution.py mismatch check) whose lazy 2-rank context creation
        # carries a hard 30 s KV deadline — under host load the processes
        # can skew past it mid-training, which kills the whole job.  The
        # warmed clique is cached and reused by every later collective.
        import numpy as _np
        from jax.experimental import multihost_utils
        multihost_utils.process_allgather(_np.zeros((1,), _np.float32))
    import numpy as np
    import jax.numpy as jnp
    from taste_spokenlm_tpu.config import TasteConfig
    from taste_spokenlm_tpu.models.taste import TasteForCausalLM
    from taste_spokenlm_tpu.parallel import mesh as mesh_lib
    from taste_spokenlm_tpu.train import optim, train_step
    from taste_spokenlm_tpu.train.trainer import Trainer, TrainerConfig
    from taste_spokenlm_tpu.utils.checkpoint import load_params

    cfg = TasteConfig.tiny() if args.tiny else TasteConfig.full()
    if args.remat != "off":
        # per-layer gradient checkpointing everywhere gradients flow
        # (reference trains with gradient_checkpointing: true,
        # configs/training/stage1-1_text_only.yml:40); 'dots' saves MXU dot
        # outputs instead of recomputing everything (ops/remat.py)
        from taste_spokenlm_tpu.ops.remat import apply_remat, parse_remat
        cfg = apply_remat(cfg, parse_remat(args.remat))
    mesh = mesh_lib.make_mesh(data=args.data_parallel,
                              model=args.model_parallel)
    schedule = optim.warmup_lr(args.lr, args.warmup)

    if args.model == "flow":
        from taste_spokenlm_tpu.models.flow import MaskedDiffWithXvec
        fmodel = MaskedDiffWithXvec(cfg.flow)
        batches = (synthetic_flow_batches(cfg, args.batch_size)
                   if args.synthetic else flow_batches(args, cfg))
        first = next(batches)
        b = jax.tree_util.tree_map(jnp.asarray, first)
        if args.init:
            variables = load_params(os.path.join(args.init, "params"))
        else:
            variables = fmodel.init(
                jax.random.PRNGKey(0), jax.random.PRNGKey(1),
                b["speech_token_ids"], b["speech_token_lengths"],
                b["feat"], b["feat_lengths"], b["embedding"])
        tx = optim.make_optimizer(schedule, grad_clip=args.grad_clip)
        state = train_step.init_state(jax.random.PRNGKey(0),
                                      variables["params"], None, tx)
        state = jax.device_put(state,
                               train_step.state_shardings(mesh, state))
        step = train_step.make_flow_step(fmodel, tx, mesh=mesh)
    else:
        model = TasteForCausalLM(cfg)
        if args.synthetic:
            batches = synthetic_batches(cfg, args.batch_size, args.stage)
        elif args.stage == 1:
            batches = stage1_batches(args, cfg)
        else:
            batches = stage2_batches(args)

        first = next(batches)
        if args.init:
            variables = load_params(os.path.join(args.init, "params"))
        else:
            b = jax.tree_util.tree_map(jnp.asarray, first)
            if args.stage == 1:
                variables = model.init(
                    jax.random.PRNGKey(0), b["speaker_embeds"],
                    b["asr_token_ids"], b["asr_token_lengths"],
                    b["asr_word_ids"], b["audio_features"],
                    b["speech_token_ids"], b["speech_token_lengths"],
                    method=TasteForCausalLM.forward_speech_autoencoder)
            else:
                variables = model.init(
                    jax.random.PRNGKey(0), b["llm_indices"],
                    b["llm_token_ids"], b["llm_token_lengths"],
                    b["llm_word_ids"],
                    method=TasteForCausalLM.forward_spoken_llm)

        if args.stage == 1:
            patterns = {"text_only": [r"speech_decoder"],
                        "no_vq": [r"audio_tower/decoder", r"speech_decoder"],
                        "rvq": [r"audio_tower/decoder", r"audio_tower/vq",
                                r"speech_decoder"]}[args.phase]
            mask = optim.trainable_mask(variables["params"],
                                        unfreeze_patterns=patterns)
        else:
            mask = optim.lora_only_mask(variables["params"])
        tx = optim.make_optimizer(schedule, mask=mask,
                                  grad_clip=args.grad_clip)

        state = train_step.init_state(jax.random.PRNGKey(0),
                                      variables["params"],
                                      variables.get("quantizer"), tx)
        state = jax.device_put(state,
                               train_step.state_shardings(mesh, state))
        if args.stage == 1:
            step = train_step.make_stage1_step(
                model, tx, mesh=mesh,
                skip_vq=args.phase in ("text_only", "no_vq"),
                skip_audio_in_decoder=args.phase == "text_only",
                trainable_mask=mask)
        else:
            step = train_step.make_stage2_step(model, tx, mesh=mesh,
                                               use_ref_kl=args.ref_kl,
                                               trainable_mask=mask)

    n_data = mesh.shape["data"]

    def _pad_batch(b):
        # bucketed real-data batches can end with a ragged row count; pad by
        # repeating the last row so dim 0 shards evenly over the data axis,
        # then zero the *_lengths fields of the padded rows so every loss
        # mask drops them — padding never re-weights real examples
        b = {k: np.asarray(v) for k, v in b.items()}
        n = next(iter(b.values())).shape[0]
        r = (-n) % n_data
        if r:
            b = {k: np.concatenate([v, np.repeat(v[-1:], r, axis=0)], axis=0)
                 for k, v in b.items()}
            for k, v in b.items():
                if k.endswith("_lengths"):
                    v[n:] = 0
        return {k: jnp.asarray(v) for k, v in b.items()}

    trainer = Trainer(
        TrainerConfig(total_steps=args.steps, log_every=args.log_every,
                      save_every=args.save_every, workdir=args.workdir),
        step, schedule=schedule)
    state = trainer.maybe_resume(state)

    # Deterministic preemption recovery: the data stream is a pure function
    # of (seed, epoch), so replaying it to the resume step makes a
    # killed-and-relaunched run feed the SAME batch at every step as an
    # uninterrupted one — with the rng/EMA state restored from orbax, the
    # whole trajectory is bitwise reproducible (the reference relies on HF
    # Trainer dataloader fast-forward + torchrun @record for this,
    # train_utils.py:156-175).  Skipping happens before device_put, so
    # replay costs host-side batch assembly only.
    raw = itertools.chain([first], batches)
    resume_step = int(jax.device_get(state.step))
    for _ in range(resume_step):
        next(raw)

    def sharded_batches():
        for b in raw:
            b = _pad_batch(b)
            if os.environ.get("TASTE_DEBUG_BATCH_HASH"):
                import hashlib
                h = hashlib.md5(b"".join(
                    np.ascontiguousarray(v).tobytes()
                    for _, v in sorted(b.items()))).hexdigest()
                print(f"batch_hash {h}", file=sys.stderr, flush=True)
            # multihost-correct sharded transfer (each process contributes
            # its local shards; single-process = plain device_put)
            yield mesh_lib.global_batch(mesh, b)
    with mesh:
        trainer.fit(state, sharded_batches())
    print("done")


if __name__ == "__main__":
    main()
