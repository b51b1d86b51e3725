"""pjit train-step builders: DP over the mesh + ZeRO-sharded optimizer state.

Replaces the reference's three training drivers (HF Trainer + DeepSpeed,
scripts/run.py:30-443; CosyVoice Executor + torch DDP,
STAGE1_TRAIN/CosyVoice/cosyvoice/utils/executor.py:30-164) with a single
jitted step: the batch is sharded over the "data" mesh axis, gradients are
reduced by the XLA all-reduce pjit inserts, and optimizer moments live
sharded over "data" (ZeRO-1/2 equivalent).  The VQ EMA state ("quantizer"
collection) is threaded through the step as explicit mutable state — its
updates are global sums, so the cross-chip reduction is automatic.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from taste_spokenlm_tpu.models.taste import TasteForCausalLM
from taste_spokenlm_tpu.parallel import mesh as mesh_lib


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    quantizer: Any           # VQ EMA collection (None for stage 2)
    rng: jax.Array


def init_state(rng, params, quantizer, tx) -> TrainState:
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params), quantizer=quantizer, rng=rng)


def state_shardings(mesh: Mesh, state: TrainState) -> TrainState:
    """Replicated params/quantizer, ZeRO-sharded optimizer moments."""
    rep = NamedSharding(mesh, P())
    return TrainState(
        step=rep,
        params=jax.tree_util.tree_map(lambda _: rep, state.params),
        opt_state=mesh_lib.opt_state_shardings(mesh, state.opt_state,
                                               state.params),
        quantizer=jax.tree_util.tree_map(lambda _: rep, state.quantizer),
        rng=rep,
    )


def _with_frozen_stopped(params, trainable_mask):
    """stop_gradient on frozen leaves so XLA dead-code-eliminates their
    backward (e.g. the whole frozen whisper-encoder backward in stage 1 and
    the base-weight dW matmuls under LoRA in stage 2 — the reference gets
    this from requires_grad=False).  Gradient STILL flows through frozen
    layers' activations where trainable params sit downstream."""
    if trainable_mask is None:
        return params
    return jax.tree_util.tree_map(
        lambda p, m: p if m else jax.lax.stop_gradient(p),
        params, trainable_mask)


def make_stage1_step(model: TasteForCausalLM, tx,
                     mesh: Optional[Mesh] = None,
                     skip_vq: bool = False,
                     skip_audio_in_decoder: bool = False,
                     donate: bool = True,
                     trainable_mask: Optional[Any] = None,
                     on_device_mel: bool = False) -> Callable:
    """Stage-1 speech-autoencoder step (decoder CE + commit loss; VQ EMA
    updates applied; curriculum: text_only phase sets skip_audio_in_decoder,
    no-vq phase sets skip_vq — run_train_taste.sh phases).  Pass the
    optimizer's `trainable_mask` so frozen subtrees (the whisper encoder)
    are excluded from the backward pass entirely.

    on_device_mel: the batch carries raw 16 kHz `audio_samples` (the
    Stage1Dataset mel_on_device layout) and the whisper 128-mel runs
    IN-GRAPH here — the mel FFTs are negligible FLOPs for the chip but are
    exactly what starves a 1-core host pipeline (VERDICT r4 #3)."""

    def _features(batch):
        if not on_device_mel:
            return batch["audio_features"]
        from taste_spokenlm_tpu.ops.audio import whisper_log_mel
        n_samples = batch["audio_samples"].shape[-1]
        return whisper_log_mel(batch["audio_samples"],
                               n_mels=model.config.audio_tower.whisper.n_mels,
                               n_samples=n_samples)

    def loss_fn(params, quantizer, batch, rng):
        params = _with_frozen_stopped(params, trainable_mask)
        variables = {"params": params, "quantizer": quantizer}
        out, mutated = model.apply(
            variables, batch["speaker_embeds"], batch["asr_token_ids"],
            batch["asr_token_lengths"], batch["asr_word_ids"],
            _features(batch), batch["speech_token_ids"],
            batch["speech_token_lengths"], train=True, dropout_rng=rng,
            skip_vq=skip_vq, skip_audio_in_decoder=skip_audio_in_decoder,
            method=TasteForCausalLM.forward_speech_autoencoder,
            mutable=["quantizer"])
        metrics = {
            "loss": out["loss"],
            "speech_token_accuracy": out["speech_token_accuracy"],
        }
        if "commit_loss" in out:
            metrics["commit_loss"] = out["commit_loss"]
        return out["loss"], (metrics, mutated["quantizer"])

    def step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        rng, sub = jax.random.split(state.rng)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (metrics, new_q)), grads = grad_fn(
            state.params, state.quantizer, batch, sub)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(state.step + 1, new_params, new_opt, new_q, rng), metrics

    return _maybe_jit(step, mesh, donate)


def make_stage2_step(model: TasteForCausalLM, tx,
                     mesh: Optional[Mesh] = None,
                     use_ref_kl: bool = False,
                     donate: bool = True,
                     trainable_mask: Optional[Any] = None) -> Callable:
    """Stage-2 joint LM step (text CE (+KL to frozen base) + taste loss;
    LoRA/bridge params trainable via the optimizer mask).  With `use_ref_kl`
    the frozen-base logits are computed IN-GRAPH by an adapter-disabled
    forward over the shared base weights (reference runs a live frozen ref
    model, modeling_taste.py:864-877) — precomputed batch["ref_logits"] is
    honored if present."""

    def loss_fn(params, quantizer, batch, rng):
        params = _with_frozen_stopped(params, trainable_mask)
        variables = {"params": params, "quantizer": quantizer}
        out = model.apply(
            variables, batch["llm_indices"], batch["llm_token_ids"],
            batch["llm_token_lengths"], batch["llm_word_ids"],
            train=True, rng=rng,
            ref_logits=batch.get("ref_logits") if use_ref_kl else None,
            compute_ref_kl=use_ref_kl,
            # memory-lean training: CE+KL are chunked over time so the
            # [B, T, 128k] logits never materialize (ops/losses.chunked_ce_kl)
            return_text_logits=False,
            method=TasteForCausalLM.forward_spoken_llm)
        metrics = {"loss": out["loss"], "text_loss": out["text_loss"],
                   "taste_loss": out["taste_loss"]}
        if "text_kl" in out:
            metrics["text_kl"] = out["text_kl"]
        return out["loss"], metrics

    def step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        rng, sub = jax.random.split(state.rng)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, metrics), grads = grad_fn(state.params, state.quantizer, batch, sub)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(state.step + 1, new_params, new_opt,
                          state.quantizer, rng), metrics

    return _maybe_jit(step, mesh, donate)


def make_flow_step(model, tx, mesh: Optional[Mesh] = None,
                   donate: bool = True,
                   trainable_mask: Optional[Any] = None) -> Callable:
    """Flow-matching (OT-CFM) training step over MaskedDiffWithXvec —
    the executor generality the reference gets from hyperpyyaml-driven
    cosyvoice/bin/train.py:87-151 training any model incl. flow, with the
    loss of flow/flow_matching.py:99-138.  Batch keys: speech_token_ids,
    speech_token_lengths, feat [B,Tm,M] (ops.audio.flow_mel targets),
    feat_lengths, embedding [B, spk]."""

    def loss_fn(params, batch, rng):
        params = _with_frozen_stopped(params, trainable_mask)
        out = model.apply(
            {"params": params}, rng, batch["speech_token_ids"],
            batch["speech_token_lengths"], batch["feat"],
            batch["feat_lengths"], batch["embedding"])
        return out["loss"], {"loss": out["loss"]}

    def step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        rng, sub = jax.random.split(state.rng)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, metrics), grads = grad_fn(state.params, batch, sub)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(state.step + 1, new_params, new_opt,
                          state.quantizer, rng), metrics

    return _maybe_jit(step, mesh, donate)


def _maybe_jit(step, mesh: Optional[Mesh], donate: bool):
    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    def wrapped(state, batch):
        batch = jax.lax.with_sharding_constraint(
            batch, mesh_lib.batch_specs(mesh, batch))
        return step(state, batch)

    return jax.jit(wrapped, donate_argnums=(0,) if donate else ())


def eval_metrics_stage2(out: Dict, num_levels: int = 4) -> Dict:
    """The reference eval metric set (scripts/run.py:68-155): text accuracy,
    per-RVQ-level a0..a{L-1} accuracy."""
    from taste_spokenlm_tpu.ops.losses import IGNORE_ID, masked_accuracy
    metrics = {"text_accuracy": masked_accuracy(out["text_logits"],
                                                out["text_labels"])}
    for l in range(num_levels):
        metrics[f"a{l}_accuracy"] = masked_accuracy(
            out["taste_logits"][..., l, :], out["taste_labels"][..., l])
    return metrics
