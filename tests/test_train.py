"""Training-layer tests: masks, schedules, pjit stage-1/stage-2 steps on the
virtual 8-device mesh, ZeRO sharding, checkpoint round trip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from taste_spokenlm_tpu.config import TasteConfig
from taste_spokenlm_tpu.models.taste import TasteForCausalLM
from taste_spokenlm_tpu.parallel import mesh as mesh_lib
from taste_spokenlm_tpu.train import optim, train_step


def test_trainable_mask_regex():
    params = {"audio_tower": {"vq": {"embed": jnp.zeros((2,))},
                              "encoder": {"w": jnp.zeros((2,))}},
              "speech_decoder": {"w": jnp.zeros((2,))}}
    mask = optim.trainable_mask(params, unfreeze_patterns=[r"audio_tower/vq",
                                                           r"speech_decoder"])
    assert mask["audio_tower"]["vq"]["embed"] is True
    assert mask["audio_tower"]["encoder"]["w"] is False
    assert mask["speech_decoder"]["w"] is True


def test_frozen_params_do_not_move():
    params = {"a": jnp.ones((3,)), "b": jnp.ones((3,))}
    mask = {"a": True, "b": False}
    tx = optim.make_optimizer(1e-1, mask=mask)
    opt_state = tx.init(params)
    grads = {"a": jnp.ones((3,)), "b": jnp.ones((3,))}
    updates, _ = tx.update(grads, opt_state, params)
    import optax
    new = optax.apply_updates(params, updates)
    assert float(jnp.abs(new["a"] - 1.0).max()) > 1e-3
    np.testing.assert_allclose(np.asarray(new["b"]), 1.0)


def test_warmup_schedule_shape():
    sched = optim.warmup_lr(1e-3, 100)
    assert float(sched(1)) < float(sched(100))
    assert float(sched(100)) == pytest.approx(1e-3, rel=1e-3)
    assert float(sched(400)) < float(sched(100))


def test_zero_shard_rule():
    mesh = mesh_lib.make_mesh(data=8, model=1)
    assert mesh_lib.zero_shard_rule((16, 4), mesh) == P("data", None)
    assert mesh_lib.zero_shard_rule((3, 5), mesh) == P()
    assert mesh_lib.zero_shard_rule((), mesh) == P()


@pytest.fixture(scope="module")
def stage1():
    cfg = TasteConfig.tiny()
    model = TasteForCausalLM(cfg)
    rng = np.random.RandomState(0)
    b, t_tok, t_sp = 8, 8, 12
    t_mel = cfg.audio_tower.whisper.max_source_positions * 2
    batch = {
        "speaker_embeds": jnp.asarray(
            rng.randn(b, cfg.speech_decoder.spk_embed_dim), jnp.float32),
        "asr_token_ids": jnp.asarray(rng.randint(
            0, cfg.audio_tower.whisper.vocab_size, (b, t_tok))),
        "asr_token_lengths": jnp.asarray([t_tok] * b),
        "asr_word_ids": jnp.asarray(
            (np.arange(t_tok) // 2)[None].repeat(b, 0)),
        "audio_features": jnp.asarray(
            rng.randn(b, cfg.audio_tower.whisper.n_mels, t_mel), jnp.float32),
        "speech_token_ids": jnp.asarray(rng.randint(
            0, cfg.speech_decoder.speech_token_size, (b, t_sp))),
        "speech_token_lengths": jnp.asarray([t_sp] * b),
    }
    variables = model.init(
        jax.random.PRNGKey(0), batch["speaker_embeds"],
        batch["asr_token_ids"], batch["asr_token_lengths"],
        batch["asr_word_ids"], batch["audio_features"],
        batch["speech_token_ids"], batch["speech_token_lengths"],
        method=TasteForCausalLM.forward_speech_autoencoder)
    return cfg, model, variables, batch


def test_stage1_step_on_mesh_loss_decreases(stage1):
    cfg, model, variables, batch = stage1
    mesh = mesh_lib.make_mesh(data=8, model=1)
    tx = optim.make_optimizer(3e-3, grad_clip=5.0)
    state = train_step.init_state(jax.random.PRNGKey(0), variables["params"],
                                  variables["quantizer"], tx)
    shardings = train_step.state_shardings(mesh, state)
    state = jax.device_put(state, shardings)
    sharded_batch = jax.device_put(batch, mesh_lib.batch_specs(mesh, batch))
    step = train_step.make_stage1_step(model, tx, mesh=mesh, donate=False)

    losses = []
    with mesh:
        for _ in range(6):
            state, metrics = step(state, sharded_batch)
            losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()
    # VQ EMA state actually updated under the mesh
    assert not np.allclose(
        np.asarray(jax.device_get(state.quantizer["audio_tower"]["vq"]["cluster_size"])),
        np.asarray(variables["quantizer"]["audio_tower"]["vq"]["cluster_size"]))


def test_single_device_equals_mesh_step(stage1):
    """DP over the mesh must be numerically equivalent to single-device."""
    cfg, model, variables, batch = stage1
    tx = optim.make_optimizer(1e-3)
    mesh = mesh_lib.make_mesh(data=8, model=1)

    s0 = train_step.init_state(jax.random.PRNGKey(0), variables["params"],
                               variables["quantizer"], tx)
    step_local = train_step.make_stage1_step(model, tx, mesh=None, donate=False)
    s_local, m_local = step_local(s0, batch)

    s1 = train_step.init_state(jax.random.PRNGKey(0), variables["params"],
                               variables["quantizer"], tx)
    s1 = jax.device_put(s1, train_step.state_shardings(mesh, s1))
    step_mesh = train_step.make_stage1_step(model, tx, mesh=mesh, donate=False)
    with mesh:
        s_mesh, m_mesh = step_mesh(s1, jax.device_put(
            batch, mesh_lib.batch_specs(mesh, batch)))
    assert float(m_local["loss"]) == pytest.approx(float(m_mesh["loss"]), rel=1e-4)


def test_zero_length_padded_rows_drop_from_loss(stage1):
    """scripts/train._pad_batch pads ragged epoch tails by repeating the last
    row with ZEROED length fields — such rows must not contribute to the
    loss (same loss as the unpadded batch)."""
    cfg, model, variables, batch = stage1
    sub = {k: v[:6] for k, v in batch.items()}
    padded = {k: jnp.concatenate([v, v[-1:], v[-1:]], axis=0)
              for k, v in sub.items()}
    for k in ("asr_token_lengths", "speech_token_lengths"):
        padded[k] = padded[k].at[6:].set(0)

    def loss(b):
        out = model.apply(
            variables, b["speaker_embeds"], b["asr_token_ids"],
            b["asr_token_lengths"], b["asr_word_ids"], b["audio_features"],
            b["speech_token_ids"], b["speech_token_lengths"],
            method=TasteForCausalLM.forward_speech_autoencoder)
        return float(out["loss"])

    assert loss(padded) == pytest.approx(loss(sub), rel=1e-5)


def test_checkpoint_roundtrip(tmp_path, stage1):
    cfg, model, variables, batch = stage1
    from taste_spokenlm_tpu.utils.checkpoint import CheckpointManager
    tx = optim.make_optimizer(1e-3)
    state = train_step.init_state(jax.random.PRNGKey(0), variables["params"],
                                  variables["quantizer"], tx)
    mgr = CheckpointManager(str(tmp_path / "ckpt"), best_metric="loss")
    mgr.save(1, state, metrics={"loss": 1.0})
    mgr.save(2, state, metrics={"loss": 0.5})
    mgr.wait()
    assert mgr.latest_step() == 2
    assert mgr.best_step() == 2
    restored = mgr.restore(jax.tree_util.tree_map(np.zeros_like, state))
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(restored.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]))
    mgr.close()


def test_stage2_step_with_in_graph_ref_kl(stage1):
    """Stage-2 pjit step with use_ref_kl: the frozen-base logits are computed
    in-graph by the adapter-disabled backbone (modeling_taste.py:864-877);
    only LoRA/bridge params move (the base stays frozen via the mask)."""
    cfg, model, _, s1_batch = stage1
    b = 8
    rng = np.random.RandomState(3)
    t = 6
    k = cfg.audio_tower.quantizer.codebook_size
    lvls = cfg.audio_tower.quantizer.num_quantizers
    batch = {
        "llm_indices": jnp.asarray(rng.randint(0, k, (b, t, lvls))),
        "llm_token_ids": jnp.asarray(
            rng.randint(2, cfg.spoken_lm.llama.vocab_size, (b, t))),
        "llm_token_lengths": jnp.asarray([t, t, t, t, 4, 4, 4, 4]),
        "llm_word_ids": jnp.asarray(
            np.minimum(np.arange(t) // 2, t - 1)[None].repeat(b, 0)),
    }
    variables = model.init(
        jax.random.PRNGKey(0), jax.random.PRNGKey(1),
        s1_batch["speaker_embeds"], s1_batch["asr_token_ids"],
        s1_batch["asr_token_lengths"], s1_batch["asr_word_ids"],
        s1_batch["audio_features"], s1_batch["speech_token_ids"],
        s1_batch["speech_token_lengths"], batch["llm_token_ids"],
        batch["llm_token_lengths"], batch["llm_word_ids"],
        method=TasteForCausalLM.init_all)

    mask = optim.trainable_mask(
        variables["params"], unfreeze_patterns=[r"lora_", r"spoken_lm/(?!language_model)"])
    tx = optim.make_optimizer(1e-3, mask=mask)
    mesh = mesh_lib.make_mesh(data=4, model=2)
    state = train_step.init_state(jax.random.PRNGKey(0), variables["params"],
                                  variables["quantizer"], tx)
    state = jax.device_put(state, train_step.state_shardings(mesh, state))
    sharded = jax.device_put(batch, mesh_lib.batch_specs(mesh, batch))
    step = train_step.make_stage2_step(model, tx, mesh=mesh, use_ref_kl=True,
                                       donate=False)
    base_q = np.asarray(
        variables["params"]["spoken_lm"]["language_model"]["layers_0"]
        ["self_attn"]["q_proj"]["base"]["kernel"])
    with mesh:
        for _ in range(2):
            state, metrics = step(state, sharded)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["text_kl"]))
    # frozen base weights did not move; adapters did
    p = jax.device_get(state.params["spoken_lm"]["language_model"])
    np.testing.assert_allclose(
        np.asarray(p["layers_0"]["self_attn"]["q_proj"]["base"]["kernel"]),
        base_q)
    assert np.abs(np.asarray(
        p["layers_0"]["self_attn"]["q_proj"]["lora_b"])).max() > 0


def test_frozen_dce_step_matches_plain_step(stage1):
    """make_stage1_step(trainable_mask=...) stops gradients through frozen
    subtrees (whisper encoder) — the trainable updates and loss must be
    IDENTICAL to the plain step; frozen params must not move."""
    cfg, model, variables, batch = stage1
    mask = optim.trainable_mask(
        variables["params"],
        unfreeze_patterns=[r"audio_tower/decoder", r"audio_tower/vq",
                           r"speech_decoder"])
    tx = optim.make_optimizer(1e-3, mask=mask)

    def run(tm):
        s0 = train_step.init_state(jax.random.PRNGKey(0),
                                   variables["params"],
                                   variables["quantizer"], tx)
        step = train_step.make_stage1_step(model, tx, mesh=None,
                                           donate=False, trainable_mask=tm)
        return step(s0, batch)

    (s_plain, m_plain), (s_dce, m_dce) = run(None), run(mask)
    assert float(m_plain["loss"]) == pytest.approx(float(m_dce["loss"]),
                                                   rel=1e-6)
    flat_p = jax.tree_util.tree_leaves(s_plain.params)
    flat_d = jax.tree_util.tree_leaves(s_dce.params)
    for a, b in zip(flat_p, flat_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
    # frozen encoder unchanged
    enc0 = jax.tree_util.tree_leaves(
        variables["params"]["audio_tower"]["encoder"])[0]
    enc1 = jax.tree_util.tree_leaves(
        s_dce.params["audio_tower"]["encoder"])[0]
    np.testing.assert_array_equal(np.asarray(enc0), np.asarray(enc1))


def test_remat_dots_policy_equivalent(stage1):
    """remat=True (recompute-all) vs remat='dots' (save MXU dot outputs,
    ops/remat.py) only changes WHAT the backward recomputes — one stage-1
    step must produce the same loss and the same updated params."""
    cfg, model, variables, batch = stage1
    tx = optim.make_optimizer(1e-3)
    outs = {}
    from taste_spokenlm_tpu.ops.remat import apply_remat
    for rm in (True, "dots"):
        m = TasteForCausalLM(apply_remat(cfg, rm))
        s = train_step.init_state(jax.random.PRNGKey(0), variables["params"],
                                  variables["quantizer"], tx)
        step = train_step.make_stage1_step(m, tx, mesh=None, donate=False)
        s2, metrics = step(s, batch)
        outs[rm] = (float(metrics["loss"]), jax.device_get(s2.params))
    assert outs[True][0] == pytest.approx(outs["dots"][0], rel=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6),
        outs[True][1], outs["dots"][1])


@pytest.mark.slow
def test_sigkill_resume_trajectory_bitwise(tmp_path):
    """Fault-tolerance: SIGKILL a training run mid-flight, relaunch it, and
    the resumed trajectory must match an uninterrupted run — the data
    stream replays as a pure function of (seed, step) and the rng/VQ-EMA
    state rides the orbax TrainState (scripts/train.py deterministic-resume
    replay; the reference leans on HF Trainer dataloader fast-forward +
    torchrun @record, train_utils.py:156-175, bin/train.py:29).  Runs
    DPxTP 4x2 on the 8-device virtual CPU mesh.

    Tolerance note: integer state (step) and rng keys must agree BITWISE;
    float leaves to ~1e-5.  The resume logic itself is bitwise exact —
    test_resume_roundtrip_step_bitwise proves save->restore->step equals
    the in-memory step to the bit on this backend — but XLA-CPU float
    results differ at ~1e-9/step BETWEEN PROCESSES with different
    execution histories (verified empirically: identical fresh processes
    match bitwise; a resumed process drifts ~e-9 per step against a
    straight one with bitwise-identical state+batch+rng inputs), and Adam
    amplifies that through m/sqrt(v) into ~1e-6 parameter noise."""
    import glob
    import os
    import signal
    import subprocess
    import sys
    import time

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(REPO, ".jax_cache"))
    base = [sys.executable, "scripts/train.py", "--platform", "cpu",
            "--tiny", "--synthetic", "--stage", "1", "--batch-size", "8",
            "--data-parallel", "4", "--model-parallel", "2",
            "--log-every", "1", "--warmup", "2"]

    def ckpt_steps(w):
        return sorted(int(os.path.basename(p)) for p in
                      glob.glob(os.path.join(w, "ckpt", "*"))
                      if os.path.basename(p).isdigit())

    # uninterrupted reference trajectory
    wa = str(tmp_path / "straight")
    r = subprocess.run(base + ["--steps", "4", "--save-every", "1",
                               "--workdir", wa],
                       cwd=REPO, env=env, capture_output=True, text=True,
                       timeout=540)
    assert r.returncode == 0, r.stderr[-3000:]
    assert 4 in ckpt_steps(wa)

    # victim run: SIGKILL once step-2's checkpoint lands
    wb = str(tmp_path / "preempted")
    proc = subprocess.Popen(
        base + ["--steps", "500", "--save-every", "1", "--workdir", wb],
        cwd=REPO, env=env, stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL)
    try:
        deadline = time.time() + 480
        while time.time() < deadline:
            if proc.poll() is not None:
                raise AssertionError("victim run exited before the kill")
            if 2 in ckpt_steps(wb):
                break
            time.sleep(0.2)
        else:
            raise AssertionError("no step-2 checkpoint before deadline")
    finally:
        if proc.poll() is None:
            os.kill(proc.pid, signal.SIGKILL)
    proc.wait(timeout=60)

    # relaunch: must resume (not restart) and land exactly on step 4
    r = subprocess.run(base + ["--steps", "4", "--save-every", "1",
                               "--workdir", wb],
                       cwd=REPO, env=env, capture_output=True, text=True,
                       timeout=540)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "resuming from step" in (r.stdout + r.stderr)
    assert 4 in ckpt_steps(wb)

    # the step-4 states must agree bit for bit (params, opt state, VQ EMA
    # collection, rng) between the straight and killed-and-resumed runs
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()

    def load(w):
        d = os.path.join(w, "ckpt", "4")
        default = os.path.join(d, "default")
        return ckptr.restore(default if os.path.isdir(default) else d)

    ta, tb = load(wa), load(wb)
    flat_a = jax.tree_util.tree_leaves_with_path(ta)
    flat_b = jax.tree_util.tree_leaves_with_path(tb)
    assert len(flat_a) == len(flat_b) > 0
    for (ka, va), (kb, vb) in zip(flat_a, flat_b):
        assert ka == kb
        va, vb = np.asarray(va), np.asarray(vb)
        if np.issubdtype(va.dtype, np.integer) or va.dtype == np.uint32:
            np.testing.assert_array_equal(
                va, vb, err_msg=f"state leaf diverged after resume: {ka}")
        else:
            np.testing.assert_allclose(
                va, vb, rtol=1e-3, atol=1e-5,
                err_msg=f"state leaf diverged after resume: {ka}")


def test_flow_step_on_mesh_loss_decreases():
    """Flow-matching (OT-CFM) train step on the virtual mesh: finite loss,
    params move, loss trends down over a few steps on a fixed batch
    (scripts/train.py --model flow; reference cosyvoice/bin/train.py:87-151
    trains flow via the same executor, flow_matching.py:99-138 loss)."""
    from taste_spokenlm_tpu.models.flow import MaskedDiffWithXvec

    cfg = TasteConfig.tiny().flow
    model = MaskedDiffWithXvec(cfg)
    rng = np.random.RandomState(0)
    b, t_tok, t_mel = 8, 12, 16
    batch = {
        "speech_token_ids": jnp.asarray(
            rng.randint(0, cfg.vocab_size, (b, t_tok)).astype(np.int32)),
        "speech_token_lengths": jnp.asarray([t_tok] * b),
        "feat": jnp.asarray(
            rng.randn(b, t_mel, cfg.output_size).astype(np.float32)),
        "feat_lengths": jnp.asarray([t_mel] * b),
        "embedding": jnp.asarray(
            rng.randn(b, cfg.spk_embed_dim).astype(np.float32)),
    }
    variables = model.init(
        jax.random.PRNGKey(0), jax.random.PRNGKey(1),
        batch["speech_token_ids"], batch["speech_token_lengths"],
        batch["feat"], batch["feat_lengths"], batch["embedding"])
    mesh = mesh_lib.make_mesh(data=4, model=2)
    tx = optim.make_optimizer(optim.warmup_lr(1e-3, 2), grad_clip=5.0)
    state = train_step.init_state(jax.random.PRNGKey(2),
                                  variables["params"], None, tx)
    state = jax.device_put(state, train_step.state_shardings(mesh, state))
    batch = jax.device_put(batch, mesh_lib.batch_specs(mesh, batch))
    step = train_step.make_flow_step(model, tx, mesh=mesh, donate=False)
    losses = []
    with mesh:
        for _ in range(6):
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses)), losses
    # CFM loss is noisy (fresh t/z each step) but must trend down on a
    # fixed batch
    assert np.mean(losses[3:]) < losses[0], losses


def test_resume_roundtrip_step_bitwise(tmp_path, stage1):
    """The checkpoint/resume machinery is BITWISE exact: running step N+1
    from a state that round-tripped through orbax save->restore produces
    exactly the same TrainState as continuing from the in-memory state —
    params, ZeRO-sharded optimizer moments, VQ-EMA collection, and rng all
    agree to the bit on the 4x2 mesh (the in-process closure of the
    SIGKILL drill above; cross-process float drift is an XLA-CPU
    execution-history artifact, not a resume bug)."""
    from taste_spokenlm_tpu.utils.checkpoint import CheckpointManager
    cfg, model, variables, batch = stage1
    mesh = mesh_lib.make_mesh(data=4, model=2)
    mask = optim.trainable_mask(
        variables["params"],
        unfreeze_patterns=[r"audio_tower/decoder", r"audio_tower/vq",
                           r"speech_decoder"])
    tx = optim.make_optimizer(optim.warmup_lr(1.6e-4, 2), mask=mask,
                              grad_clip=5.0)
    state = train_step.init_state(jax.random.PRNGKey(0), variables["params"],
                                  variables["quantizer"], tx)
    state = jax.device_put(state, train_step.state_shardings(mesh, state))
    step = train_step.make_stage1_step(model, tx, mesh=mesh, donate=False,
                                       trainable_mask=mask)
    sb = jax.device_put(batch, mesh_lib.batch_specs(mesh, batch))
    with mesh:
        state, _ = step(state, sb)
        state, _ = step(state, sb)
        sa, _ = step(state, sb)                  # in-memory continuation
        mgr = CheckpointManager(str(tmp_path / "ck"), max_to_keep=2)
        mgr.save(2, jax.device_get(state))
        mgr.wait()
        restored = mgr.restore(state)
        sb2, _ = step(restored, sb)              # resumed continuation
        mgr.close()
    for (ka, va), (kb, vb) in zip(
            jax.tree_util.tree_leaves_with_path(jax.device_get(sa)),
            jax.tree_util.tree_leaves_with_path(jax.device_get(sb2))):
        assert ka == kb
        np.testing.assert_array_equal(
            np.asarray(va), np.asarray(vb),
            err_msg=f"save/restore round trip changed step output: {ka}")
