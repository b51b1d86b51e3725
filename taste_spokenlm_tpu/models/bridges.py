"""LLM bridges: fuse (text+taste)->llm input, extract llm output->taste.

Re-design of /root/reference/taste_speech/modules_taste/bridge.py:42-490.
In-bridges fuse the llama text embedding with the 1280-d taste embedding;
out-bridges read llm hidden states and predict taste (as per-level logits
and/or a continuous codebook-space latent).  Default TASTE-V0 config:
in=weighted_sum (zero_audio init: softmax([-2,2]) starts ~[0.02,0.98]),
out=continue_latent_linear_last (mu/logvar head + reparameterized latent ->
RVQ nearest-index).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from taste_spokenlm_tpu.models.quantizer import (Codebook, codebook_distributed_codes, codebook_indices_from_code)


# ---------------------------------------------------------------------------
# in-bridges (fusion)
# ---------------------------------------------------------------------------


class WeightedSumFusion(nn.Module):
    """softmax([w_a, w_t]) weighted sum of projected audio + text embeds."""

    llm_dim: int = 2048
    weight_init_type: str = "zero_audio"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, text_embeds, audio_embeds):
        init = {"balance": jnp.array([1.0, 1.0]),
                "zero_audio": jnp.array([-2.0, 2.0])}[self.weight_init_type]
        w = jax.nn.softmax(self.param("weights", lambda key: init))
        audio = nn.Dense(self.llm_dim, dtype=self.dtype, name="linear")(audio_embeds)
        return w[0] * audio + w[1] * text_embeds


class SimpleSumFusion(nn.Module):
    """text + relu(alpha) * Linear(audio); alpha starts at 0 (audio off)."""

    llm_dim: int = 2048
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, text_embeds, audio_embeds):
        alpha = self.param("alpha", nn.initializers.zeros, ())
        audio = nn.Dense(self.llm_dim, dtype=self.dtype, name="in_linear")(audio_embeds)
        return text_embeds + nn.relu(alpha) * audio


class AdaptedFFN(nn.Module):
    """Gated reference mixing block (bridge.py:6-30).

    sigmoid(MLP([based, ref])) gates a linear projection of `ref` added
    residually onto `based`.
    """

    based_dim: int
    num_layers: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, based_embeds, ref_embeds):
        hidden = jnp.concatenate([based_embeds, ref_embeds], axis=-1)
        for i in range(self.num_layers):
            hidden = nn.Dense(self.based_dim, dtype=self.dtype,
                              name=f"mix_layers_{i}")(hidden)
        gate = nn.sigmoid(hidden)
        value = nn.Dense(self.based_dim, dtype=self.dtype,
                         name="value_linear")(ref_embeds)
        return based_embeds + gate * value


class ReferenceMixFusion(nn.Module):
    """Stacked gated adapted-FFN blocks mixing audio into text (bridge.py:70-88)."""

    llm_dim: int = 2048
    num_layers: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, text_embeds, audio_embeds):
        hidden = text_embeds
        for i in range(self.num_layers):
            hidden = AdaptedFFN(self.llm_dim, dtype=self.dtype,
                                name=f"layers_{i}")(hidden, audio_embeds)
        return hidden


BRIDGE_FUSION_CLASSES = {
    "weighted_sum": WeightedSumFusion,
    "reference_mix": ReferenceMixFusion,
    "simple_sum": SimpleSumFusion,
}


# ---------------------------------------------------------------------------
# out-bridges (extraction)
# ---------------------------------------------------------------------------


def _layer_weighted_sum(weights: jnp.ndarray, hidden_states) -> jnp.ndarray:
    w = jax.nn.softmax(weights)
    stacked = jnp.stack(hidden_states, axis=0).astype(jnp.float32)
    return jnp.einsum("l,lbtc->btc", w, stacked)


class LinearLastExtract(nn.Module):
    k: int = 512
    l: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, last_hidden, hidden_states=None, cb: Optional[Codebook] = None,
                 train: bool = False, rng=None):
        b, t, _ = last_hidden.shape
        flat = nn.Dense(self.k * self.l, name="linear")(last_hidden.astype(jnp.float32))
        return flat.reshape(b, t, self.l, self.k), {}


class WeightedLayerExtract(nn.Module):
    k: int = 512
    l: int = 4
    num_layers: int = 17  # llm layers + 1 (embedding)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, last_hidden, hidden_states=None, cb=None,
                 train: bool = False, rng=None):
        weights = self.param("weights", nn.initializers.ones, (self.num_layers,))
        hidden = _layer_weighted_sum(weights, hidden_states)
        b, t, _ = hidden.shape
        flat = nn.Dense(self.k * self.l, name="linear")(hidden)
        return flat.reshape(b, t, self.l, self.k), {}


class LinearAllConcatExtract(nn.Module):
    """Linear over the concat of every hidden state (bridge.py:147-172)."""

    k: int = 512
    l: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, last_hidden, hidden_states=None, cb=None,
                 train: bool = False, rng=None):
        hidden = jnp.concatenate(
            [h.astype(jnp.float32) for h in hidden_states], axis=-1)
        b, t, _ = hidden.shape
        flat = nn.Dense(self.k * self.l, name="linear")(hidden)
        return flat.reshape(b, t, self.l, self.k), {}


class ReferenceMixExtract(nn.Module):
    """Gated adapted-FFN stack reading llm last hidden into the taste
    embedding space (bridge.py:207-227): base = the 512-d taste/audio
    embeds, ref = last hidden; output is a continuous embedding (not
    logits), matching the reference's (ab)use of the logits slot."""

    audio_dim: int = 512
    num_layers: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, last_hidden, hidden_states=None, cb=None,
                 train: bool = False, rng=None, audio_embeds=None):
        hidden = audio_embeds
        for i in range(self.num_layers):
            hidden = AdaptedFFN(self.audio_dim, dtype=self.dtype,
                                name=f"layers_{i}")(
                hidden, last_hidden.astype(hidden.dtype))
        return hidden, {}


class ContinueWeightedLayerExtract(nn.Module):
    """Weighted-layer hidden -> linear d -> RVQ nearest indices as scaled
    one-hot logits, no latent reparameterization (bridge.py:230-261)."""

    k: int = 512
    d: int = 256
    num_layers: int = 17
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, last_hidden, hidden_states=None, cb: Optional[Codebook] = None,
                 train: bool = False, rng=None):
        weights = self.param("weights", nn.initializers.ones, (self.num_layers,))
        hidden = _layer_weighted_sum(weights, hidden_states)
        code = nn.Dense(self.d, name="linear")(hidden)
        indices = codebook_indices_from_code(cb, jax.lax.stop_gradient(code))
        logits = jax.nn.one_hot(indices, self.k) * 1000.0
        return logits, {}


class _ContinueLatentBase(nn.Module):
    """mu/logvar head over a hidden, reparameterize, RVQ-nearest indices.

    taste "logits" are emitted as scaled one-hots of the predicted indices
    (bridge.py:418-420), so downstream argmax recovers the indices.
    """

    k: int = 512
    d: int = 256
    use_weighted_layer: bool = False
    num_layers: int = 17
    conduct_reparameterization: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, last_hidden, hidden_states=None, cb: Optional[Codebook] = None,
                 train: bool = False, rng=None):
        if self.use_weighted_layer:
            weights = self.param("weights", nn.initializers.ones, (self.num_layers,))
            hidden = _layer_weighted_sum(weights, hidden_states)
        else:
            hidden = last_hidden.astype(jnp.float32)
        mu = nn.Dense(self.d, name="fc_mu")(hidden)
        logvar = jnp.broadcast_to(
            self.param("b_logvar", nn.initializers.zeros, (self.d,)), mu.shape)
        sigma = jnp.exp(0.5 * logvar)
        if train and self.conduct_reparameterization and rng is not None:
            eps = jax.random.normal(rng, sigma.shape)
            base = mu + sigma
            z = base + jax.lax.stop_gradient(mu + sigma * eps - base)
        else:
            z = mu + sigma
        indices = codebook_indices_from_code(cb, jax.lax.stop_gradient(z))
        logits = jax.nn.one_hot(indices, self.k) * 1000.0
        return logits, {"z": z, "mu": mu, "logvar": logvar}


class ContinueLatentLinearLastExtract(_ContinueLatentBase):
    use_weighted_layer: bool = False


class ContinueLatentWeightedLayerExtract(_ContinueLatentBase):
    use_weighted_layer: bool = True


class MultiLinearLastExtract(nn.Module):
    """4-head logits + soft-code aggregation for the MSE term."""

    k: int = 512
    l: int = 4
    d: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, last_hidden, hidden_states=None, cb: Optional[Codebook] = None,
                 train: bool = False, rng=None):
        b, t, _ = last_hidden.shape
        flat = nn.Dense(self.k * self.l, name="linear")(last_hidden.astype(jnp.float32))
        logits = flat.reshape(b, t, self.l, self.k)
        codes = codebook_distributed_codes(cb, logits)  # [B, T, L, Dc]
        return logits, {"agg_code": jnp.sum(codes, axis=-2)}


BRIDGE_EXTRACT_CLASSES = {
    "linear_last": LinearLastExtract,
    "linear_all_concat": LinearAllConcatExtract,
    "reference_mix": ReferenceMixExtract,
    "weighted_layer": WeightedLayerExtract,
    "continue_weighted_layer": ContinueWeightedLayerExtract,
    "continue_latent_linear_last": ContinueLatentLinearLastExtract,
    "continue_latent_weighted_layer": ContinueLatentWeightedLayerExtract,
    "multi_linear_last": MultiLinearLastExtract,
}
