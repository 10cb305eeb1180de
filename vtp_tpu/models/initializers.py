"""Parameter initializers matching the reference's torch init schemes."""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def trunc_normal(key: jax.Array, shape: Sequence[int], std: float = 0.02,
                 dtype: jnp.dtype = jnp.float32) -> jax.Array:
    """timm-style truncated normal (±2σ), as used by ``init_weights_vit``
    (vision_transformer.py:43-55)."""
    return std * jax.random.truncated_normal(key, -2.0, 2.0, tuple(shape), dtype)


def normal(key: jax.Array, shape: Sequence[int], std: float,
           dtype: jnp.dtype = jnp.float32) -> jax.Array:
    return std * jax.random.normal(key, tuple(shape), dtype)


def patch_embed_uniform(key: jax.Array, shape: Sequence[int], in_chans: int,
                        patch: int, dtype: jnp.dtype = jnp.float32) -> jax.Array:
    """PatchEmbed.reset_parameters (embeddings.py:79-83): U(-√k, √k) with
    k = 1/(C·p²)."""
    bound = math.sqrt(1.0 / (in_chans * patch * patch))
    return jax.random.uniform(key, tuple(shape), dtype, -bound, bound)


def linear_init(key: jax.Array, in_dim: int, out_dim: int, bias: bool = True,
                std: Optional[float] = 0.02, dtype: jnp.dtype = jnp.float32) -> dict:
    """Linear params in JAX layout: kernel ``(in, out)``, bias ``(out,)``.
    std=None -> torch default (kaiming-uniform) is irrelevant here since
    every reference tower re-inits with trunc_normal(0.02) + zero bias."""
    p = {"kernel": trunc_normal(key, (in_dim, out_dim), std or 0.02, dtype)}
    p["bias"] = jnp.zeros((out_dim,), dtype) if bias else None
    return p
