"""Image preprocessing.

Two paths, per SURVEY.md section 7 "hard parts":
  * **eval-parity mode** — host-side PIL ops identical to the reference
    (ADM center-crop with BOX halving + BICUBIC, image_utils.py:5-32;
    naive Resize for zero-shot, test_zero_shot_hf.py:455-459). rFID is
    defined on PIL resampling, so these stay on host.
  * **throughput mode** — fused on-device normalize (and jax.image
    resize) for serving/extraction pipelines where bit-parity with PIL
    is not required.
"""

from __future__ import annotations

from typing import Iterable, Tuple

import numpy as np
from PIL import Image

import jax.numpy as jnp

# constants from the reference (models/utils/text_utils.py:12-17)
OPENAI_DATASET_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_DATASET_STD = (0.26862954, 0.26130258, 0.27577711)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
INCEPTION_MEAN = (0.5, 0.5, 0.5)
INCEPTION_STD = (0.5, 0.5, 0.5)


def center_crop_arr(pil_image: Image.Image, image_size: int) -> Image.Image:
    """ADM center crop (vtp/utils/image_utils.py:5-32): halve with BOX
    while >= 2x target, BICUBIC to scale, crop the center."""
    while min(*pil_image.size) >= 2 * image_size:
        pil_image = pil_image.resize(
            tuple(x // 2 for x in pil_image.size), resample=Image.BOX
        )
    scale = image_size / min(*pil_image.size)
    pil_image = pil_image.resize(
        tuple(round(x * scale) for x in pil_image.size), resample=Image.BICUBIC
    )
    arr = np.array(pil_image)
    cy = (arr.shape[0] - image_size) // 2
    cx = (arr.shape[1] - image_size) // 2
    return Image.fromarray(arr[cy : cy + image_size, cx : cx + image_size])


def resize_naive(pil_image: Image.Image, size: int) -> Image.Image:
    """torchvision ``Resize((s, s))`` equivalent (BILINEAR), used by the
    zero-shot eval (test_zero_shot_hf.py:455-459)."""
    return pil_image.resize((size, size), resample=Image.BILINEAR)


def to_nchw_float(pil_image: Image.Image) -> np.ndarray:
    """PIL -> (3, H, W) float32 in [0, 1] (torchvision ToTensor)."""
    arr = np.asarray(pil_image.convert("RGB"), np.float32) / 255.0
    return arr.transpose(2, 0, 1)


def normalize_nchw(
    x: np.ndarray | jnp.ndarray,
    mean: Iterable[float] = IMAGENET_MEAN,
    std: Iterable[float] = IMAGENET_STD,
):
    xp = jnp if isinstance(x, jnp.ndarray) else np
    mean = xp.asarray(tuple(mean), xp.float32).reshape(1, 3, 1, 1) if x.ndim == 4 else \
        xp.asarray(tuple(mean), xp.float32).reshape(3, 1, 1)
    std = xp.asarray(tuple(std), xp.float32).reshape(mean.shape)
    return (x - mean) / std


def denormalize_nchw(
    x,
    mean: Iterable[float] = IMAGENET_MEAN,
    std: Iterable[float] = IMAGENET_STD,
):
    xp = jnp if isinstance(x, jnp.ndarray) else np
    shape = (1, 3, 1, 1) if x.ndim == 4 else (3, 1, 1)
    mean = xp.asarray(tuple(mean), xp.float32).reshape(shape)
    std = xp.asarray(tuple(std), xp.float32).reshape(shape)
    return x * std + mean


def load_image_for_reconstruction(path: str, image_size: int = 256) -> np.ndarray:
    """README-quickstart preprocessing: ADM crop + ImageNet normalize ->
    (1, 3, s, s) float32."""
    img = Image.open(path).convert("RGB")
    img = center_crop_arr(img, image_size)
    x = to_nchw_float(img)
    return normalize_nchw(x[None])
