"""Activation functions (reference: vtp/models/layers/activation.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quick_gelu(x: jax.Array) -> jax.Array:
    """``x * sigmoid(1.702 x)`` (activation.py:5-12)."""
    return x * jax.nn.sigmoid(1.702 * x)


def gelu_exact(x: jax.Array) -> jax.Array:
    """erf-based GELU — torch ``nn.GELU()`` default."""
    return jax.nn.gelu(x, approximate=False)


ACT = {
    "gelu": gelu_exact,
    "quick_gelu": quick_gelu,
    "silu": jax.nn.silu,
}
