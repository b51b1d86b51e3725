"""Golden parity: our flax ResidualVQ vs the reference's vendored
vector-quantize-pytorch fork imported from /root/reference (torch-CPU):

  * eval forward (indices + quantized output, shared project_in/out)
  * 3-step EMA training trajectory (embed / embed_avg / cluster_size after
    each step, plus per-step commit loss) with masking
  * the TASTE extension APIs: get_codes_from_indices /
    get_output_from_indices / get_indices_from_code

The vendored library needs `einx` (not in this image) — a minimal stub
implements exactly the gather/where patterns the library uses
(vector_quantize_pytorch.py:532-534,1198-1205; residual_vq.py:206-222).

Config pins the stochastic knobs off: kmeans_init=False (state injected on
both sides), threshold_ema_dead_code=0 (no code expiry / batch resampling),
quantize_dropout=False, sample_codebook_temp=0.
"""

import importlib
import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from taste_spokenlm_tpu.config import QuantizerConfig
from taste_spokenlm_tpu.models.quantizer import ResidualVQ
from taste_spokenlm_tpu.utils.convert import rvq_state

REF_MT = "/root/reference/taste_speech/modules_taste"

DIM = 16
CDIM = 8
K = 24
Q = 3
DECAY = 0.9


def _install_einx_stub():
    if "einx" in sys.modules:
        return
    einx = types.ModuleType("einx")

    def get_at(pattern, src, idx):
        if pattern == "h [c] d, h b n -> h b n d":
            h, b, n = idx.shape
            return src[torch.arange(h)[:, None, None], idx]
        if pattern == "h b n [c] d, h b n -> h b n d":
            return torch.gather(
                src, -2, idx[..., None, None].expand(*idx.shape, 1,
                                                     src.shape[-1])
            ).squeeze(-2)
        if pattern == "q [c] d, b n q -> q b n d":
            q = src.shape[0]
            return torch.stack([src[i][idx[..., i]] for i in range(q)])
        if pattern == "b n [c] d, b n -> b n d":
            return torch.gather(
                src, -2, idx[..., None, None].expand(*idx.shape, 1,
                                                     src.shape[-1])
            ).squeeze(-2)
        if pattern == "[c] d, b n -> b n d":
            return src[idx]
        raise NotImplementedError(pattern)

    def where(pattern, mask, a, b):
        lhs = pattern.split(",")[0].strip()
        m = mask
        target = a if torch.is_tensor(a) else b
        while m.ndim < target.ndim:
            m = m.unsqueeze(-1)
        if not torch.is_tensor(b):
            b = torch.full_like(target, b)
        if not torch.is_tensor(a):
            a = torch.full_like(target, a)
        return torch.where(m, a, b)

    einx.get_at = get_at
    einx.where = where
    sys.modules["einx"] = einx


@pytest.fixture(scope="module")
def ref_vq_pkg():
    _install_einx_stub()
    pkg = types.ModuleType("ref_mt")
    pkg.__path__ = [REF_MT]
    sys.modules.setdefault("ref_mt", pkg)
    return importlib.import_module("ref_mt.vq.residual_vq")


def _cfg():
    return QuantizerConfig(
        dim=DIM, codebook_dim=CDIM, codebook_size=K, num_quantizers=Q,
        decay=DECAY, kmeans_init=False, threshold_ema_dead_code=0,
        quantize_dropout=False, commitment_weight=1.0)


@pytest.fixture()
def vq_pair(ref_vq_pkg):
    torch.manual_seed(0)
    ref = ref_vq_pkg.ResidualVQ(
        dim=DIM, num_quantizers=Q, codebook_dim=CDIM, codebook_size=K,
        kmeans_init=False, decay=DECAY, threshold_ema_dead_code=0,
        commitment_weight=1.0, sample_codebook_temp=0.0)
    # embed_avg must be consistent with cluster_size=1 for trajectory parity
    state = {k: v.detach().numpy().copy()
             for k, v in ref.state_dict().items()}
    params, quantizer = rvq_state(state, prefix="")
    ours = ResidualVQ(_cfg())
    return ref, ours, {"params": params, "quantizer": quantizer}


def _rand(shape, seed):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


def test_eval_forward_matches_reference(vq_pair):
    ref, ours, variables = vq_pair
    ref.eval()
    b, t = 2, 7
    x = _rand((b, t, DIM), 1)
    mask = np.ones((b, t), bool)
    mask[1, 5:] = False
    with torch.no_grad():
        q_ref, idx_ref, _ = ref(torch.from_numpy(x),
                                mask=torch.from_numpy(mask))
    out = ours.apply(variables, jnp.asarray(x), jnp.asarray(mask))
    valid = mask
    np.testing.assert_array_equal(
        np.asarray(out["quantized_indices"])[valid], idx_ref.numpy()[valid])
    np.testing.assert_allclose(
        np.asarray(out["quantized_feats"])[valid], q_ref.numpy()[valid],
        atol=1e-5)


def test_train_trajectory_matches_reference(vq_pair):
    ref, ours, variables = vq_pair
    ref.train()
    b, t = 2, 9
    mask = np.ones((b, t), bool)
    mask[0, 7:] = False
    qstate = variables["quantizer"]
    for step in range(3):
        x = _rand((b, t, DIM), 10 + step)
        q_ref, idx_ref, loss_ref = ref(torch.from_numpy(x),
                                       mask=torch.from_numpy(mask))
        out, mut = ours.apply(
            {"params": variables["params"], "quantizer": qstate},
            jnp.asarray(x), jnp.asarray(mask), train=True,
            mutable=["quantizer"])
        qstate = mut["quantizer"]
        np.testing.assert_array_equal(
            np.asarray(out["quantized_indices"])[mask],
            idx_ref.detach().numpy()[mask], err_msg=f"step {step}")
        np.testing.assert_allclose(
            float(out["commit_loss"]), float(loss_ref.sum()),
            atol=1e-5, err_msg=f"step {step}")
        ref_embed = np.stack([
            l._codebook.embed.detach().numpy()[0] for l in ref.layers])
        ref_avg = np.stack([
            l._codebook.embed_avg.detach().numpy()[0] for l in ref.layers])
        ref_size = np.stack([
            l._codebook.cluster_size.detach().numpy()[0]
            for l in ref.layers])
        np.testing.assert_allclose(np.asarray(qstate["embed"]), ref_embed,
                                   atol=2e-5, err_msg=f"step {step}")
        np.testing.assert_allclose(np.asarray(qstate["embed_avg"]), ref_avg,
                                   atol=2e-5, err_msg=f"step {step}")
        np.testing.assert_allclose(np.asarray(qstate["cluster_size"]),
                                   ref_size, atol=1e-5,
                                   err_msg=f"step {step}")


def test_extension_apis_match_reference(vq_pair):
    ref, ours, variables = vq_pair
    ref.eval()
    rng = np.random.RandomState(3)
    idx = rng.randint(0, K, size=(2, 6, Q))
    idx[1, 4:, 1:] = -1   # quantize-dropped tail
    idx_t = torch.from_numpy(idx)
    with torch.no_grad():
        codes_ref = ref.get_codes_from_indices(idx_t).numpy()
        out_ref = ref.get_output_from_indices(idx_t).numpy()
    codes = ours.apply(variables, jnp.asarray(idx),
                       method=ours.get_codes_from_indices)
    out = ours.apply(variables, jnp.asarray(idx),
                     method=ours.get_output_from_indices)
    np.testing.assert_allclose(np.asarray(codes), codes_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out), out_ref, atol=1e-5)

    code = _rand((2, 6, CDIM), 4)
    with torch.no_grad():
        idx_from_code_ref = ref.get_indices_from_code(
            torch.from_numpy(code)).numpy()
    idx_from_code = ours.apply(variables, jnp.asarray(code),
                               method=ours.get_indices_from_code)
    np.testing.assert_array_equal(np.asarray(idx_from_code),
                                  idx_from_code_ref)
