"""Test config: run on a virtual 8-device CPU mesh so multi-chip sharding
paths are exercised without TPU hardware (SURVEY.md §4 implication)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# force CPU: the ambient environment presets JAX_PLATFORMS=axon (the real
# TPU tunnel) and a sitecustomize imports jax before this conftest runs, so
# the env var alone is too late — update the live jax config below too.
os.environ["JAX_PLATFORMS"] = "cpu"
# zero-egress environment: stop transformers/datasets probing the network
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
os.environ.setdefault("HF_DATASETS_OFFLINE", "1")
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
# XLA-CPU's oneDNN fastmath makes f32 convs/matmuls ~1e-2 sloppy; parity
# tests against torch need true f32 accumulation.
jax.config.update("jax_default_matmul_precision", "highest")
