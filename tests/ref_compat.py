"""Import machinery for golden-parity tests against /root/reference.

The reference's torch modules are importable on this image (torch-CPU) once
a handful of absent third-party packages are stubbed.  Stubs are *minimal
but faithful* where the parity code paths actually execute through them
(diffusers attention/GELU; einx gather/where) and inert placeholders where
they are only touched at import time (librosa, onnxruntime, hyperpyyaml,
torchaudio, s3tokenizer, whisper, lightning, conformer).

Two entry points:

  install_reference_stubs()  -- idempotent; registers every stub
  import_reference(dotted)   -- e.g. import_reference("taste_speech.modeling_taste")
                                 or   import_reference("ref_mt.cosyvoice.flow.decoder")

``ref_mt`` is an alias package rooted at taste_speech/modules_taste so that
sub-modules can be imported without executing the taste_speech package
__init__ (which pulls the whole processing chain).
"""

import importlib
import importlib.machinery
import sys
import types

import torch

tnn = torch.nn

REF_ROOT = "/root/reference"
REF_MT = f"{REF_ROOT}/taste_speech/modules_taste"


def _stub(name, pkg=False, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None, is_package=pkg)
    if pkg:
        m.__path__ = []
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


# ---------------------------------------------------------------------------
# einx: exactly the gather/where patterns the vendored vq library uses
# (vector_quantize_pytorch.py:532-534,1198-1205; residual_vq.py:206-222)
# ---------------------------------------------------------------------------


def _einx_get_at(pattern, src, idx):
    if pattern == "h [c] d, h b n -> h b n d":
        h = idx.shape[0]
        return src[torch.arange(h)[:, None, None], idx]
    if pattern in ("h b n [c] d, h b n -> h b n d",
                   "b n [c] d, b n -> b n d"):
        return torch.gather(
            src, -2, idx[..., None, None].expand(*idx.shape, 1, src.shape[-1])
        ).squeeze(-2)
    if pattern == "q [c] d, b n q -> q b n d":
        return torch.stack([src[i][idx[..., i]] for i in range(src.shape[0])])
    if pattern == "[c] d, b n -> b n d":
        return src[idx]
    raise NotImplementedError(pattern)


def _einx_where(pattern, mask, a, b):
    target = a if torch.is_tensor(a) else b
    m = mask
    while m.ndim < target.ndim:
        m = m.unsqueeze(-1)
    if not torch.is_tensor(a):
        a = torch.full_like(target, a)
    if not torch.is_tensor(b):
        b = torch.full_like(target, b)
    return torch.where(m, a, b)


# ---------------------------------------------------------------------------
# diffusers: the eager Attention / GELU blocks matcha's Transformer1DBlock
# actually runs through (faithful math, minimal surface)
# ---------------------------------------------------------------------------


def _install_diffusers():
    if "diffusers" in sys.modules:
        return
    diff = _stub("diffusers", pkg=True)
    dmodels = _stub("diffusers.models", pkg=True)
    acts = _stub("diffusers.models.activations")

    def get_activation(name):
        return {"silu": tnn.SiLU(), "swish": tnn.SiLU(), "mish": tnn.Mish(),
                "gelu": tnn.GELU(), "relu": tnn.ReLU()}[name]

    acts.get_activation = get_activation

    lora = _stub("diffusers.models.lora")

    class LoRACompatibleLinear(tnn.Linear):
        pass

    lora.LoRACompatibleLinear = LoRACompatibleLinear

    attnp = _stub("diffusers.models.attention_processor")

    class Attention(tnn.Module):
        """Minimal faithful diffusers eager Attention: the mask is an
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
                [LoRACompatibleLinear(inner, query_dim), tnn.Dropout(dropout)])

        def forward(self, hidden_states, encoder_hidden_states=None,
                    attention_mask=None, **kw):
            ctx = (hidden_states if encoder_hidden_states is None
                   else encoder_hidden_states)
            b, tq, _ = hidden_states.shape
            h = self.heads

            def split(x):
                return x.reshape(b, -1, h, x.shape[-1] // h).transpose(1, 2)

            q, k, v = (split(self.to_q(hidden_states)), split(self.to_k(ctx)),
                       split(self.to_v(ctx)))
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

    attn_mod = _stub("diffusers.models.attention")

    class GELU(tnn.Module):
        def __init__(self, dim_in, dim_out, approximate="none"):
            super().__init__()
            self.proj = LoRACompatibleLinear(dim_in, dim_out)
            self.approximate = approximate

        def forward(self, x):
            return torch.nn.functional.gelu(self.proj(x),
                                            approximate=self.approximate)

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

    _stub("diffusers.utils", pkg=True)
    sys.modules["diffusers.utils"].torch_utils = None
    tu = _stub("diffusers.utils.torch_utils")
    tu.maybe_allow_in_graph = lambda cls: cls
    diff.models = dmodels


def install_reference_stubs():
    """Idempotent: register stubs for every third-party import the
    reference package chain touches that is absent on this image."""
    _stub("einx", get_at=_einx_get_at, where=_einx_where)
    _stub("hyperpyyaml", load_hyperpyyaml=lambda *a, **k: None)
    _stub("librosa")
    _stub("onnxruntime")
    _stub("whisper")
    _stub("s3tokenizer")
    _stub("torchaudio", pkg=True)
    _stub("torchaudio.transforms")
    _stub("torchaudio.functional")
    _stub("torchaudio.compliance", pkg=True)
    _stub("torchaudio.compliance.kaldi")

    if "omegaconf" not in sys.modules:
        class DictConfig(dict):
            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError as e:
                    raise AttributeError(k) from e

        _stub("omegaconf", DictConfig=DictConfig)

    if "conformer" not in sys.modules:
        class ConformerBlock(tnn.Module):
            pass

        _stub("conformer", ConformerBlock=ConformerBlock)

    _install_diffusers()

    _stub("lightning", pkg=True)
    _stub("lightning.pytorch", pkg=True)
    _stub("lightning.pytorch.utilities",
          rank_zero_only=lambda fn: fn)

    # alias package rooted at modules_taste (avoids taste_speech/__init__)
    if "ref_mt" not in sys.modules:
        pkg = types.ModuleType("ref_mt")
        pkg.__path__ = [REF_MT]
        sys.modules["ref_mt"] = pkg

    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)


def import_reference(dotted: str):
    """Import a reference module with all stubs installed."""
    install_reference_stubs()
    return importlib.import_module(dotted)
