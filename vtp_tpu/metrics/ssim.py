"""SSIM with torchmetrics' defaults (the reference uses
``StructuralSimilarityIndexMeasure(data_range=1.0)``,
tools/test_reconstruction_hf.py:82-91): 11x11 gaussian kernel with
sigma 1.5, K1=0.01, K2=0.03, valid (un-padded) windows, mean over
batch+channels+positions."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache()
def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    coords = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(coords**2) / (2 * sigma**2))
    g /= g.sum()
    k2d = np.outer(g, g)
    return k2d.astype(np.float32)


def _filter(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """Depthwise valid conv over (B, C, H, W)."""
    c = x.shape[1]
    k = jnp.broadcast_to(kernel[None, None], (c, 1, *kernel.shape))
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=c,
    )


def ssim(
    img1: jax.Array,
    img2: jax.Array,
    *,
    data_range: float = 1.0,
    kernel_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
    per_image: bool = False,
) -> jax.Array:
    """SSIM over (B, C, H, W) images. Returns the scalar batch mean, or
    per-image means with ``per_image=True``."""
    x = img1.astype(jnp.float32)
    y = img2.astype(jnp.float32)
    kernel = jnp.asarray(_gaussian_kernel(kernel_size, sigma))
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    mu_x = _filter(x, kernel)
    mu_y = _filter(y, kernel)
    mu_xx = _filter(x * x, kernel)
    mu_yy = _filter(y * y, kernel)
    mu_xy = _filter(x * y, kernel)

    sigma_x = mu_xx - mu_x * mu_x
    sigma_y = mu_yy - mu_y * mu_y
    sigma_xy = mu_xy - mu_x * mu_y

    num = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    den = (mu_x * mu_x + mu_y * mu_y + c1) * (sigma_x + sigma_y + c2)
    ssim_map = num / den
    if per_image:
        return jnp.mean(ssim_map, axis=(1, 2, 3))
    return jnp.mean(ssim_map)
