"""Latent shard IO + statistics for DiT training.

Behavioral reference: ``generation/tools/extract_features_vtp.py:87-124``
(safetensors shards ``latents_rank{r}_shard{s}`` holding
{latents, latents_flip, labels}) and LightningDiT's
``ImgLatentDataset(latent_norm=True)`` which derives per-channel
mean/std of shape (1, d, 1, 1) fp32 saved as ``latents_stats.pt``.

We write the same shard format (numpy safetensors — binary compatible)
plus a ``latents_stats.safetensors`` (and a .pt when torch is present,
for LightningDiT interop).
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np


def save_latent_shard(
    output_dir: str,
    rank: int,
    shard_idx: int,
    latents: np.ndarray,
    latents_flip: np.ndarray,
    labels: np.ndarray,
) -> str:
    from safetensors.numpy import save_file

    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(output_dir, f"latents_rank{rank:02d}_shard{shard_idx:03d}.safetensors")
    save_file(
        {
            "latents": np.ascontiguousarray(latents),
            "latents_flip": np.ascontiguousarray(latents_flip),
            "labels": np.ascontiguousarray(labels),
        },
        path,
        metadata={
            "total_size": str(latents.shape[0]),
            "dtype": str(latents.dtype),
        },
    )
    return path


def list_latent_shards(output_dir: str) -> List[str]:
    pat = re.compile(r"latents_rank\d+_shard\d+\.safetensors$")
    return sorted(
        os.path.join(output_dir, f) for f in os.listdir(output_dir) if pat.match(f)
    )


def load_latent_shards(output_dir: str) -> Iterator[Dict[str, np.ndarray]]:
    from safetensors.numpy import load_file

    for path in list_latent_shards(output_dir):
        yield load_file(path)


def compute_latent_stats(output_dir: str, save: bool = True) -> Tuple[np.ndarray, np.ndarray]:
    """Per-channel mean/std (1, d, 1, 1) fp32 over all shards (both flip
    variants), streaming — never loads the full set at once."""
    total = None
    total_sq = None
    count = 0
    for shard in load_latent_shards(output_dir):
        for key in ("latents", "latents_flip"):
            z = shard[key].astype(np.float64)  # (N, d, h, w)
            s = z.sum(axis=(0, 2, 3))
            sq = (z * z).sum(axis=(0, 2, 3))
            n = z.shape[0] * z.shape[2] * z.shape[3]
            total = s if total is None else total + s
            total_sq = sq if total_sq is None else total_sq + sq
            count += n
    mean = (total / count).astype(np.float32).reshape(1, -1, 1, 1)
    var = total_sq / count - (total / count) ** 2
    std = np.sqrt(np.maximum(var, 0)).astype(np.float32).reshape(1, -1, 1, 1)
    if save:
        _save_stats(output_dir, mean, std)
    return mean, std


def _save_stats(output_dir: str, mean: np.ndarray, std: np.ndarray) -> None:
    from safetensors.numpy import save_file

    save_file(
        {"mean": mean, "std": std},
        os.path.join(output_dir, "latents_stats.safetensors"),
    )
    try:  # LightningDiT expects a torch-pickled latents_stats.pt
        import torch

        torch.save(
            {"mean": torch.from_numpy(mean), "std": torch.from_numpy(std)},
            os.path.join(output_dir, "latents_stats.pt"),
        )
    except ImportError:
        pass


def load_latent_stats(output_dir: str) -> Tuple[np.ndarray, np.ndarray]:
    st = os.path.join(output_dir, "latents_stats.safetensors")
    if os.path.exists(st):
        from safetensors.numpy import load_file

        d = load_file(st)
        return d["mean"], d["std"]
    pt = os.path.join(output_dir, "latents_stats.pt")
    if os.path.exists(pt):
        import torch

        d = torch.load(pt, map_location="cpu", weights_only=True)
        return d["mean"].numpy(), d["std"].numpy()
    raise FileNotFoundError(f"no latent stats in {output_dir}")
