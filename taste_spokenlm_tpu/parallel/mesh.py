"""Device mesh + sharding layout.

TPU-native replacement for the reference's NCCL DDP / DeepSpeed ZeRO stack
(SURVEY.md §2.5, §5): ONE `jax.sharding.Mesh` with axes ("data", "model").

- Data parallelism: batch sharded over "data"; gradient reduction is the
  XLA all-reduce pjit inserts (replacing torch DDP,
  STAGE1_TRAIN/CosyVoice/cosyvoice/utils/train_utils.py:96-111).
- ZeRO-equivalent optimizer-state sharding: optimizer moments sharded over
  "data" on the largest divisible axis (replacing DeepSpeed stage-1/2,
  configs/deepspeed/zero2.json) — see `zero_shard_rule`.
- Tensor parallelism over "model" for the Llama backbone (idiomatic bonus;
  the reference has no TP): attention/MLP projections sharded on their
  feature axis, embeddings on vocab.
"""

from __future__ import annotations

import re
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // model
    assert data * model == len(devices), (data, model, len(devices))
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P("data"))


def batch_specs(mesh: Mesh, batch: Any) -> Any:
    """Per-leaf batch sharding (leading dim over data)."""
    return jax.tree_util.tree_map(lambda _: batch_sharding(mesh), batch)


def global_batch(mesh: Mesh, batch: Any) -> Any:
    """Host batch -> device batch sharded over the "data" axis, correct in
    BOTH launch modes (the torchrun/accelerate-launch equivalent,
    reference train_utils.py:40-51):

    * single-process (1 host, N local devices): plain sharded device_put —
      byte-identical to the historical path;
    * multi-process (`jax.distributed.initialize`, N hosts x M devices):
      every process holds the FULL global batch (the data stream is a pure
      function of (seed, step), so each host rebuilds it identically —
      preserving the bitwise preemption-resume contract), and each process
      contributes only the shards its local devices own via
      `make_array_from_callback`.  A 2-host x 4-device run therefore feeds
      bit-identical global batches to a 1-host x 8-device run
      (tests/test_multihost.py asserts the loss equivalence).
    """
    if jax.process_count() == 1:
        return jax.device_put(batch, batch_specs(mesh, batch))
    sh = batch_sharding(mesh)

    def one(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sh,
                                            lambda idx: x[idx])

    return jax.tree_util.tree_map(one, batch)


# ---------------------------------------------------------------------------
# parameter sharding (tensor parallel over "model")
# ---------------------------------------------------------------------------

# path-regex -> partition spec on the *last* dims of the weight
#
# NOTE the fused single-GEMV serving layouts (qkv_proj / gateup_proj /
# linear_qkv, *_serving fused_qkv flags) deliberately have NO rule: their
# output dim concatenates tensors that downstream ops slice apart, so
# column-sharding them would put e.g. gate and up on different shards of
# an elementwise product.  They fall through to replicated — fusion is a
# single-chip B=1 decode optimization; shard the UNFUSED layout under TP.
_TP_RULES = [
    # llama attention + mlp: column-parallel qkv/gate/up, row-parallel o/down
    (r".*(q_proj|k_proj|v_proj|gate_proj|up_proj).*/base/kernel$", P(None, "model")),
    (r".*(o_proj|down_proj).*/base/kernel$", P("model", None)),
    # int8 serving layout (utils/quant): base_q shards like kernel, the
    # per-output-channel scale follows the output dim
    (r".*(q_proj|k_proj|v_proj|gate_proj|up_proj).*/base_q$", P(None, "model")),
    (r".*(q_proj|k_proj|v_proj|gate_proj|up_proj).*/base_scale$", P("model")),
    (r".*(o_proj|down_proj).*/base_q$", P("model", None)),
    (r".*embed_tokens/embedding$", P("model", None)),
    (r".*embed_tokens/embedding_q$", P("model", None)),
    (r".*embed_tokens/embedding_scale$", P("model")),
]


def param_spec(path: str, shape, mesh: Mesh) -> P:
    if mesh.shape.get("model", 1) > 1:
        for pat, spec in _TP_RULES:
            if re.match(pat, path):
                # only shard if divisible
                dims = [d for d in spec]
                ok = all(s is None or shape[i] % mesh.shape[s] == 0
                         for i, s in enumerate(dims))
                if ok:
                    return spec
    return P()


def param_shardings(mesh: Mesh, params: Any) -> Any:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def one(path, leaf):
        path_str = "/".join(getattr(p, "key", str(getattr(p, "idx", p)))
                            for p in path)
        return NamedSharding(mesh, param_spec(path_str, leaf.shape, mesh))

    leaves = [one(p, l) for p, l in flat]
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params), leaves)


# ---------------------------------------------------------------------------
# ZeRO: shard optimizer state over the data axis
# ---------------------------------------------------------------------------


def zero_shard_rule(shape, mesh: Mesh) -> P:
    """Shard the largest axis divisible by the data-axis size; replicate
    scalars/small tensors.  This is the pjit equivalent of DeepSpeed
    stage-1 optimizer partitioning."""
    n = mesh.shape["data"]
    if n <= 1 or not shape:
        return P()
    # pick the largest divisible axis
    best = None
    for i, s in enumerate(shape):
        if s % n == 0 and s >= n:
            if best is None or s > shape[best]:
                best = i
    if best is None:
        return P()
    spec = [None] * len(shape)
    spec[best] = "data"
    return P(*spec)


def opt_state_shardings(mesh: Mesh, opt_state: Any, params_example: Any) -> Any:
    """Shardings for an optax state tree: moment tensors (same shape as a
    param) get ZeRO sharding; everything else replicated."""
    def one(leaf):
        if hasattr(leaf, "shape") and leaf.ndim >= 1:
            return NamedSharding(mesh, zero_shard_rule(leaf.shape, mesh))
        return NamedSharding(mesh, P())
    return jax.tree_util.tree_map(one, opt_state)
