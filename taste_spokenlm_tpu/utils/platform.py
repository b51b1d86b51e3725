"""Platform selection helper.

This image's sitecustomize registers the `axon` TPU PJRT plugin at
interpreter start and pins jax to it, so the JAX_PLATFORMS env var set by a
launching shell arrives too late.  Scripts call `force_platform` (driven by
--platform / TASTE_PLATFORM) to override via the live jax config, which works
until the backend is first touched.
"""

from __future__ import annotations

import os
from typing import Optional


def force_platform(name: Optional[str] = None) -> str:
    """name in {'cpu', 'tpu', 'axon', None}.  None reads TASTE_PLATFORM and
    defaults to leaving the ambient platform alone."""
    import jax
    name = name or os.environ.get("TASTE_PLATFORM")
    if not name or name == "default":
        return jax.default_backend()
    if name == "tpu":
        name = os.environ.get("JAX_PLATFORMS", "tpu")  # axon alias
    jax.config.update("jax_platforms", name)
    return name
