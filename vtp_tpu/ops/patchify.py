"""Patch embedding and pixel-shuffle as pure reshape/GEMM ops.

The reference uses ``nn.Conv2d(k=stride=patch)`` for patchify
(embeddings.py:58) and ``nn.PixelShuffle`` for upsampling
(pixel_decoder.py:118). On TPU both lower to reshape/transpose plus one
large GEMM, which maps straight onto the MXU with no conv overhead.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def extract_patches(images: jax.Array, patch: int) -> jax.Array:
    """``(B, C, H, W) -> (B, H/p * W/p, C*p*p)`` with the feature order
    matching ``conv_weight.reshape(D, C*p*p)`` (channel-major, then the
    p×p window row-major)."""
    B, C, H, W = images.shape
    gh, gw = H // patch, W // patch
    x = images.reshape(B, C, gh, patch, gw, patch)
    # -> (B, gh, gw, C, ph, pw)
    x = x.transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(B, gh * gw, C * patch * patch)


def patchify(
    images: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    *,
    patch: int,
    compute_dtype: Optional[jnp.dtype] = None,
) -> jax.Array:
    """Patch embedding: ``(B, C, H, W) -> (B, N, D)``.

    kernel: ``(C*p*p, D)`` — the torch conv weight ``(D, C, p, p)``
    reshaped to ``(D, C*p*p)`` and transposed.
    """
    x = extract_patches(images, patch)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        kernel = kernel.astype(compute_dtype)
    y = x @ kernel
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def pixel_shuffle(x: jax.Array, upscale: int) -> jax.Array:
    """``(B, C*r^2, H, W) -> (B, C, H*r, W*r)`` — torch PixelShuffle
    semantics: out[b, c, h*r+i, w*r+j] = in[b, (c*r + i)*r + j, h, w]."""
    B, Cr2, H, W = x.shape
    r = upscale
    C = Cr2 // (r * r)
    x = x.reshape(B, C, r, r, H, W)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # (B, C, H, r, W, r)
    return x.reshape(B, C, H * r, W * r)


def patch_tokens_to_4d(patch_tokens: jax.Array, feat_h: int, feat_w: int) -> jax.Array:
    """``(B, N, C) -> (B, C, H', W')`` (modeling_vtp.py:379-395)."""
    B, N, C = patch_tokens.shape
    if N != feat_h * feat_w:
        raise ValueError(f"Patch count mismatch: {N} vs {feat_h * feat_w}")
    return patch_tokens.transpose(0, 2, 1).reshape(B, C, feat_h, feat_w)
