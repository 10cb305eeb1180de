"""2D sin/cos positional embeddings + resolution interpolation.

Behavioral reference: ``vtp/models/layers/embeddings.py:198-275``
(MAE-style helpers; unused by the shipped VTP models, which are RoPE
only, but part of the layer inventory). Implemented directly from the
sincos definition, vectorized in jnp.

Layout per position (matching the reference): the feature dim splits
into [h-embed | w-embed], each of which is [sin(pos*omega) | cos(...)]
with omega_k = 10000^{-2k/d}.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def sincos_1d(embed_dim: int, pos: jax.Array) -> jax.Array:
    """(M,) positions -> (M, embed_dim) as [sin | cos] halves."""
    assert embed_dim % 2 == 0, embed_dim
    k = jnp.arange(embed_dim // 2, dtype=jnp.float64) / (embed_dim / 2.0)
    omega = 1.0 / (10000.0**k)
    angles = pos.reshape(-1).astype(jnp.float64)[:, None] * omega[None, :]
    return jnp.concatenate([jnp.sin(angles), jnp.cos(angles)], axis=1).astype(
        jnp.float32
    )


def sincos_2d(embed_dim: int, grid_size: int, cls_token: bool = False) -> jax.Array:
    """(grid² [+1], embed_dim) 2D table; row-major over (h, w). The
    reference's xy-indexed meshgrid puts the fast-varying w coordinate
    in the FIRST feature half (embeddings.py:210-215) — replicated."""
    assert embed_dim % 2 == 0, embed_dim
    coords = jnp.arange(grid_size, dtype=jnp.float32)
    hh, ww = jnp.meshgrid(coords, coords, indexing="ij")
    emb = jnp.concatenate(
        [sincos_1d(embed_dim // 2, ww), sincos_1d(embed_dim // 2, hh)], axis=1
    )
    if cls_token:
        emb = jnp.concatenate([jnp.zeros((1, embed_dim), jnp.float32), emb], axis=0)
    return emb


def interpolate_pos_embed(
    pos_embed: jax.Array,
    new_grid_size: int,
    num_extra_tokens: Optional[int] = None,
) -> jax.Array:
    """Bicubic-resample a learned ``(1, n_extra + g², D)`` positional
    table to a new grid size, keeping the extra (cls/storage) rows
    unchanged (embeddings.py:257-275). No-op when sizes already match."""
    n_total = pos_embed.shape[-2]
    d = pos_embed.shape[-1]
    if num_extra_tokens is None:
        g = int(n_total**0.5)
        num_extra_tokens = n_total - g * g
    orig = int((n_total - num_extra_tokens) ** 0.5)
    if orig == new_grid_size:
        return pos_embed
    extra = pos_embed[:, :num_extra_tokens]
    grid = pos_embed[:, num_extra_tokens:].reshape(-1, orig, orig, d)
    grid = jax.image.resize(
        grid, (grid.shape[0], new_grid_size, new_grid_size, d), method="bicubic"
    )
    grid = grid.reshape(grid.shape[0], new_grid_size * new_grid_size, d)
    return jnp.concatenate([extra, grid], axis=1)
