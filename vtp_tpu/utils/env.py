"""Environment bootstrap helpers.

The container's sitecustomize force-sets ``jax_platforms=axon,cpu``
AFTER the standard env-var handling, so ``JAX_PLATFORMS=cpu`` in the
environment silently does nothing — a CPU-intended subprocess then
grabs the (single, exclusive) TPU grant. Calling
:func:`apply_jax_platforms_env` early restores standard JAX behavior:
an explicit ``JAX_PLATFORMS`` env var wins.
"""

from __future__ import annotations

import os


def apply_jax_platforms_env() -> None:
    """Honor an explicit JAX_PLATFORMS env var over sitecustomize."""
    plats = os.environ.get("JAX_PLATFORMS")
    if not plats:
        return
    import jax

    if jax.config.jax_platforms != plats:
        jax.config.update("jax_platforms", plats)
