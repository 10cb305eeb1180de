from vtp_tpu.data.imagefolder import ImageFolder, list_image_files
from vtp_tpu.data.loader import DataLoader, InfiniteSampler, ShardedSampler
from vtp_tpu.data.ssl_crops import (
    MultiCropDataset,
    MultiCropTransform,
    collate_multicrop,
    make_mask_bookkeeping,
    random_resized_crop,
)

__all__ = [
    "ImageFolder",
    "list_image_files",
    "DataLoader",
    "InfiniteSampler",
    "ShardedSampler",
    "MultiCropDataset",
    "MultiCropTransform",
    "collate_multicrop",
    "make_mask_bookkeeping",
    "random_resized_crop",
]
