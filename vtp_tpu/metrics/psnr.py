"""PSNR, matching the reference's formula
(tools/test_reconstruction_hf.py:49-62): inputs in [0, 255],
``20 log10(255 / sqrt(mse))`` per image."""

from __future__ import annotations

import jax.numpy as jnp


def psnr(original: jnp.ndarray, processed: jnp.ndarray, max_val: float = 255.0) -> jnp.ndarray:
    """Per-image PSNR over (B, ...) tensors; returns (B,). Infinite for
    exact matches, like the reference."""
    b = original.shape[0]
    diff = (original.astype(jnp.float32) - processed.astype(jnp.float32)).reshape(b, -1)
    mse = jnp.mean(diff * diff, axis=-1)
    return jnp.where(
        mse == 0, jnp.inf, 20.0 * jnp.log10(max_val / jnp.sqrt(jnp.maximum(mse, 1e-20)))
    )
