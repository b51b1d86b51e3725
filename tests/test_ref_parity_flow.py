"""Golden parity: our flax CFM flow stack vs the reference CosyVoice/Matcha
modules imported from /root/reference (torch-CPU), on converted weights:

  * ConditionalDecoder (1-D U-Net estimator, flow/decoder.py:21-222)
  * ConditionalCFM euler solve with CFG + cosine t-schedule
    (flow/flow_matching.py:18-98)
  * InterpolateRegulator (flow/length_regulator.py:21-50)

The reference chain needs `conformer`, `diffusers`, `omegaconf` and
`lightning`, none of which exist in this image — minimal faithful stubs are
installed (the diffusers `Attention` stub reproduces the eager
bias-mask/softmax math the reference runs through; with the full-length
masks used here the reference's +1/+0 additive mask is a softmax no-op, so
it compares exactly against our hard-masked attention).
"""

import importlib
import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
tnn = torch.nn

from taste_spokenlm_tpu.config import FlowConfig
from taste_spokenlm_tpu.models.flow import (ConditionalCFM,
                                            ConditionalDecoder,
                                            InterpolateRegulator)
from taste_spokenlm_tpu.utils.convert import _conv1d_to_flax, estimator_params

REF_MT = "/root/reference/taste_speech/modules_taste"


def _install_stubs():
    if "conformer" not in sys.modules:
        conf = types.ModuleType("conformer")

        class ConformerBlock(tnn.Module):
            pass

        conf.ConformerBlock = ConformerBlock
        sys.modules["conformer"] = conf

    if "diffusers" not in sys.modules:
        diff = types.ModuleType("diffusers")
        dmodels = types.ModuleType("diffusers.models")
        acts = types.ModuleType("diffusers.models.activations")

        def get_activation(name):
            return {"silu": tnn.SiLU(), "swish": tnn.SiLU(),
                    "mish": tnn.Mish(), "gelu": tnn.GELU(),
                    "relu": tnn.ReLU()}[name]

        acts.get_activation = get_activation
        lora = types.ModuleType("diffusers.models.lora")

        class LoRACompatibleLinear(tnn.Linear):
            pass

        lora.LoRACompatibleLinear = LoRACompatibleLinear
        attnp = types.ModuleType("diffusers.models.attention_processor")

        class Attention(tnn.Module):
            """Faithful minimal diffusers eager Attention: the mask is an
            ADDITIVE bias on the pre-softmax scores."""

            def __init__(self, query_dim, cross_attention_dim=None, heads=8,
                         dim_head=64, dropout=0.0, bias=False,
                         upcast_attention=False, **kw):
                super().__init__()
                inner = heads * dim_head
                self.heads, self.scale = heads, dim_head ** -0.5
                kv = (cross_attention_dim if cross_attention_dim is not None
                      else query_dim)
                self.to_q = LoRACompatibleLinear(query_dim, inner, bias=bias)
                self.to_k = LoRACompatibleLinear(kv, inner, bias=bias)
                self.to_v = LoRACompatibleLinear(kv, inner, bias=bias)
                self.to_out = tnn.ModuleList(
                    [LoRACompatibleLinear(inner, query_dim),
                     tnn.Dropout(dropout)])

            def forward(self, hidden_states, encoder_hidden_states=None,
                        attention_mask=None, **kw):
                ctx = (hidden_states if encoder_hidden_states is None
                       else encoder_hidden_states)
                b, tq, _ = hidden_states.shape
                h = self.heads

                def split(x):
                    return x.reshape(b, -1, h, x.shape[-1] // h).transpose(1, 2)

                q, k, v = (split(self.to_q(hidden_states)),
                           split(self.to_k(ctx)), split(self.to_v(ctx)))
                scores = (q @ k.transpose(-1, -2)) * self.scale
                if attention_mask is not None:
                    m = attention_mask
                    if m.dim() == 3:
                        m = m.unsqueeze(1)
                    scores = scores + m
                probs = scores.softmax(dim=-1)
                out = (probs @ v).transpose(1, 2).reshape(b, tq, -1)
                return self.to_out[1](self.to_out[0](out))

        attnp.Attention = Attention

        attn_mod = types.ModuleType("diffusers.models.attention")

        class GELU(tnn.Module):
            def __init__(self, dim_in, dim_out, approximate="none"):
                super().__init__()
                self.proj = LoRACompatibleLinear(dim_in, dim_out)
                self.approximate = approximate

            def forward(self, x):
                return torch.nn.functional.gelu(
                    self.proj(x), approximate=self.approximate)

        class GEGLU(tnn.Module):
            def __init__(self, dim_in, dim_out):
                super().__init__()
                self.proj = LoRACompatibleLinear(dim_in, dim_out * 2)

            def forward(self, x):
                h, gate = self.proj(x).chunk(2, dim=-1)
                return h * torch.nn.functional.gelu(gate)

        class ApproximateGELU(tnn.Module):
            def __init__(self, dim_in, dim_out):
                super().__init__()
                self.proj = LoRACompatibleLinear(dim_in, dim_out)

            def forward(self, x):
                x = self.proj(x)
                return x * torch.sigmoid(1.702 * x)

        class AdaLayerNorm(tnn.Module):
            pass

        class AdaLayerNormZero(tnn.Module):
            pass

        attn_mod.GELU = GELU
        attn_mod.GEGLU = GEGLU
        attn_mod.ApproximateGELU = ApproximateGELU
        attn_mod.AdaLayerNorm = AdaLayerNorm
        attn_mod.AdaLayerNormZero = AdaLayerNormZero

        dutils = types.ModuleType("diffusers.utils")
        dtorch_utils = types.ModuleType("diffusers.utils.torch_utils")
        dtorch_utils.maybe_allow_in_graph = lambda cls: cls

        diff.models = dmodels
        sys.modules["diffusers"] = diff
        sys.modules["diffusers.models"] = dmodels
        sys.modules["diffusers.models.activations"] = acts
        sys.modules["diffusers.models.lora"] = lora
        sys.modules["diffusers.models.attention_processor"] = attnp
        sys.modules["diffusers.models.attention"] = attn_mod
        sys.modules["diffusers.utils"] = dutils
        sys.modules["diffusers.utils.torch_utils"] = dtorch_utils

    if "lightning" not in sys.modules:
        lightning = types.ModuleType("lightning")
        lpt = types.ModuleType("lightning.pytorch")
        lut = types.ModuleType("lightning.pytorch.utilities")
        lut.rank_zero_only = lambda fn: fn
        sys.modules["lightning"] = lightning
        sys.modules["lightning.pytorch"] = lpt
        sys.modules["lightning.pytorch.utilities"] = lut

    if "omegaconf" not in sys.modules:
        om = types.ModuleType("omegaconf")

        class DictConfig(dict):
            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError as e:
                    raise AttributeError(k) from e

        om.DictConfig = DictConfig
        sys.modules["omegaconf"] = om


@pytest.fixture(scope="module")
def ref_flow_pkg():
    _install_stubs()
    pkg = types.ModuleType("ref_mt")
    pkg.__path__ = [REF_MT]
    sys.modules.setdefault("ref_mt", pkg)
    return {
        "decoder": importlib.import_module("ref_mt.cosyvoice.flow.decoder"),
        "flow_matching": importlib.import_module(
            "ref_mt.cosyvoice.flow.flow_matching"),
        "length_regulator": importlib.import_module(
            "ref_mt.cosyvoice.flow.length_regulator"),
    }


M = 8            # mel bins
CHANNELS = (16, 16)
N_BLOCKS = 1
MID_BLOCKS = 2
HEADS = 2
HEAD_DIM = 8


def _tiny_cfg():
    return FlowConfig.tiny().replace(
        output_size=M, estimator_channels=CHANNELS,
        estimator_attention_head_dim=HEAD_DIM, estimator_n_blocks=N_BLOCKS,
        estimator_num_mid_blocks=MID_BLOCKS, estimator_num_heads=HEADS)


@pytest.fixture(scope="module")
def estimator_pair(ref_flow_pkg):
    torch.manual_seed(0)
    ref = ref_flow_pkg["decoder"].ConditionalDecoder(
        in_channels=4 * M, out_channels=M, channels=CHANNELS, dropout=0.0,
        attention_head_dim=HEAD_DIM, n_blocks=N_BLOCKS,
        num_mid_blocks=MID_BLOCKS, num_heads=HEADS, act_fn="gelu").eval()
    params = estimator_params(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()},
        prefix="", n_channels=len(CHANNELS), n_blocks=N_BLOCKS,
        num_mid_blocks=MID_BLOCKS)
    ours = ConditionalDecoder(_tiny_cfg())
    return ref, ours, {"params": params}


def test_estimator_forward_matches_reference(estimator_pair):
    ref, ours, variables = estimator_pair
    rng = np.random.RandomState(3)
    b, t = 2, 12   # t divisible by 2**len(CHANNELS) (down/upsampling path)
    x = rng.randn(b, t, M).astype(np.float32)
    mu = rng.randn(b, t, M).astype(np.float32)
    spk = rng.randn(b, M).astype(np.float32)
    cond = rng.randn(b, t, M).astype(np.float32)
    tt = np.asarray([0.3, 0.8], np.float32)
    mask = np.ones((b, t), np.float32)

    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(x.transpose(0, 2, 1)),
            torch.from_numpy(mask[:, None, :]),
            torch.from_numpy(mu.transpose(0, 2, 1)),
            torch.from_numpy(tt),
            spks=torch.from_numpy(spk),
            cond=torch.from_numpy(cond.transpose(0, 2, 1)),
        ).numpy().transpose(0, 2, 1)

    out = ours.apply(variables, jnp.asarray(x), jnp.asarray(mask) > 0,
                     jnp.asarray(mu), jnp.asarray(tt), jnp.asarray(spk),
                     jnp.asarray(cond))
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-4)


def test_cfm_euler_solve_matches_reference(ref_flow_pkg, estimator_pair):
    """Full 4-step euler ODE with CFG 0.7 + cosine t-schedule, same initial
    noise on both sides."""
    ref_est, _, variables = estimator_pair
    fm = ref_flow_pkg["flow_matching"]
    from omegaconf import DictConfig
    cfm_params = DictConfig(dict(
        sigma_min=1e-6, solver="euler", t_scheduler="cosine",
        training_cfg_rate=0.2, inference_cfg_rate=0.7, reg_loss_type="l1"))
    ref_cfm = fm.ConditionalCFM(in_channels=M, cfm_params=cfm_params,
                                n_spks=1, spk_emb_dim=M,
                                estimator=ref_est).eval()

    cfg = _tiny_cfg().replace(n_timesteps=4)
    ours = ConditionalCFM(cfg)

    rng = np.random.RandomState(4)
    b, t = 1, 12
    mu = rng.randn(b, t, M).astype(np.float32)
    spk = rng.randn(b, M).astype(np.float32)
    cond = rng.randn(b, t, M).astype(np.float32)
    z = rng.randn(b, t, M).astype(np.float32)
    mask = np.ones((b, t), np.float32)

    with torch.no_grad():
        t_span = torch.linspace(0, 1, 5)
        t_span = 1 - torch.cos(t_span * 0.5 * torch.pi)
        ref_mel = ref_cfm.solve_euler(
            torch.from_numpy(z.transpose(0, 2, 1)), t_span=t_span,
            mu=torch.from_numpy(mu.transpose(0, 2, 1)),
            mask=torch.from_numpy(mask[:, None, :]),
            spks=torch.from_numpy(spk),
            cond=torch.from_numpy(cond.transpose(0, 2, 1)),
        ).numpy().transpose(0, 2, 1)

    mel = ours.apply({"params": {"estimator": variables["params"]}},
                     jax.random.PRNGKey(0), jnp.asarray(mu),
                     jnp.asarray(mask) > 0, jnp.asarray(spk),
                     jnp.asarray(cond), n_timesteps=4, z=jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(mel), ref_mel, atol=5e-4)


def test_length_regulator_matches_reference(ref_flow_pkg):
    lr_mod = ref_flow_pkg["length_regulator"]
    torch.manual_seed(1)
    C = 10
    ref = lr_mod.InterpolateRegulator(channels=C, sampling_ratios=(1, 1, 1, 1)
                                      ).eval()
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    params = {}
    for i in range(4):
        params[f"conv_{i}"] = {
            "kernel": _conv1d_to_flax(state[f"model.{i * 3}.weight"]),
            "bias": state[f"model.{i * 3}.bias"]}
        params[f"norm_{i}"] = {"scale": state[f"model.{i * 3 + 1}.weight"],
                               "bias": state[f"model.{i * 3 + 1}.bias"]}
    params["proj"] = {"kernel": _conv1d_to_flax(state["model.12.weight"]),
                      "bias": state["model.12.bias"]}

    ours = InterpolateRegulator(C)
    rng = np.random.RandomState(5)
    t_in, t_out = 7, 18
    x = rng.randn(1, t_in, C).astype(np.float32)
    with torch.no_grad():
        ref_out, _ = ref(torch.from_numpy(x), ylens=torch.tensor([t_out]))
    out = ours.apply({"params": params}, jnp.asarray(x), t_out,
                     jnp.asarray([t_out]), in_lengths=jnp.asarray([t_in]))
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(), atol=1e-5)
