from vtp_tpu.data.imagefolder import ImageFolder, list_image_files
from vtp_tpu.data.loader import DataLoader, InfiniteSampler, ShardedSampler

__all__ = [
    "ImageFolder",
    "list_image_files",
    "DataLoader",
    "InfiniteSampler",
    "ShardedSampler",
]
