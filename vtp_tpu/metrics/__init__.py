from vtp_tpu.metrics.psnr import psnr
from vtp_tpu.metrics.ssim import ssim
from vtp_tpu.metrics.fid import FrechetStats, fid_from_stats, frechet_distance
from vtp_tpu.metrics.lpips import LPIPS, lpips_available

__all__ = [
    "psnr",
    "ssim",
    "FrechetStats",
    "fid_from_stats",
    "frechet_distance",
    "LPIPS",
    "lpips_available",
]
