"""Environment bootstrap helpers.

The container's sitecustomize force-sets ``jax_platforms=axon,cpu``
AFTER the standard env-var handling, so ``JAX_PLATFORMS=cpu`` in the
environment silently does nothing — a CPU-intended subprocess then
grabs the (single, exclusive) TPU grant. Calling
:func:`apply_jax_platforms_env` early restores standard JAX behavior:
an explicit ``JAX_PLATFORMS`` env var wins.

:func:`enable_compilation_cache` wires the persistent XLA compilation
cache (``jax_compilation_cache_dir``) so repeated invocations of the
bench / train tools amortize their multi-minute unrolled-step compiles
instead of re-paying them every process (reference has no analogue —
torch eager pays no compile).  :func:`bootstrap` does both and is the
single entry point every CLI tool / bench / test bootstrap should call.
"""

from __future__ import annotations

import os

_DEFAULT_CACHE_DIR = os.path.expanduser("~/.cache/vtp_tpu/xla_cache")


def apply_jax_platforms_env() -> None:
    """Honor an explicit JAX_PLATFORMS env var over sitecustomize."""
    plats = os.environ.get("JAX_PLATFORMS")
    if not plats:
        return
    import jax

    if jax.config.jax_platforms != plats:
        jax.config.update("jax_platforms", plats)


def enable_compilation_cache() -> None:
    """Point JAX's persistent compilation cache at a writable dir.

    Overridable via ``VTP_XLA_CACHE_DIR`` (empty string disables).  Safe
    to call more than once; errors never propagate (the cache is a pure
    optimization — ``jax_raise_persistent_cache_errors`` is False by
    default so unsupported backends silently skip it).
    """
    cache_dir = os.environ.get("VTP_XLA_CACHE_DIR", _DEFAULT_CACHE_DIR)
    if not cache_dir:
        return
    import jax

    # Never cache on the CPU backend: deserializing a cached MULTI-device
    # CPU executable hard-aborts the process in jax 0.9 (reproduced: a
    # cache-hit re-run of the 8-virtual-device sharded train-step test
    # dies with 'Fatal Python error: Aborted' inside the result fetch).
    # CPU compiles are cheap; the multi-minute compiles this cache exists
    # for are all on TPU. Platform is read from config, not by
    # initializing a backend (callers may still be pre-init).
    plats = os.environ.get("JAX_PLATFORMS") or jax.config.jax_platforms or ""
    if plats.split(",")[0].strip() == "cpu":
        return

    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Persist anything non-trivial: through the axon tunnel even the
        # ~0.35 s helper jits (broadcast_in_dim/threefry/...) recur ~90x
        # per process = ~30 s of avoidable compile per invocation; the
        # unrolled train steps this cache exists for take minutes.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - never block startup on cache
        pass


def bootstrap() -> None:
    """Standard process bootstrap: platforms env + persistent XLA cache."""
    apply_jax_platforms_env()
    enable_compilation_cache()
