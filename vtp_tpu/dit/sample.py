"""Class-conditional sampling: DiT latents -> VTP decode -> images.

Mirrors the reference inference wrapper
(generation/tools/inference_lightningdit_vtp.py): euler 250 steps,
timestep_shift 0.075, cfg 1.0 (off) for the headline no-cfg gFID, then
latents are de-normalized with the extracted per-channel stats and
decoded through the VTP pixel decoder.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vtp_tpu.dit.model import DiTConfig, dit_forward
from vtp_tpu.dit.transport import euler_sample


def make_sampler(
    cfg: DiTConfig,
    *,
    num_steps: int = 250,
    timestep_shift: float = 0.075,
    cfg_scale: float = 1.0,
    compute_dtype=jnp.bfloat16,
):
    """Returns jitted ``sample(params, key, labels) -> latents``."""

    def sample(params, key, labels):
        model_fn = lambda x, t, y: dit_forward(
            params, cfg, x, t, y, compute_dtype=compute_dtype
        )
        shape = (labels.shape[0], cfg.in_channels, cfg.input_size, cfg.input_size)
        return euler_sample(
            model_fn, key, shape, labels,
            num_steps=num_steps, timestep_shift=timestep_shift,
            cfg_scale=cfg_scale, null_label=cfg.null_label,
        )

    return jax.jit(sample)


def sample_images(
    dit_params: dict,
    dit_cfg: DiTConfig,
    tokenizer,                       # vtp_tpu.generation.VTPTokenizer
    labels: np.ndarray,
    key: jax.Array,
    *,
    latent_stats: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    num_steps: int = 250,
    timestep_shift: float = 0.075,
    cfg_scale: float = 1.0,
) -> np.ndarray:
    """-> (B, H, W, 3) uint8 images."""
    sampler = make_sampler(
        dit_cfg, num_steps=num_steps, timestep_shift=timestep_shift,
        cfg_scale=cfg_scale,
    )
    z = sampler(dit_params, key, jnp.asarray(labels))
    z = np.asarray(z, np.float32)
    if latent_stats is not None:
        mean, std = latent_stats
        z = z * std + mean
    return tokenizer.decode_to_images(z)
