"""VTP-as-VAE adapter for diffusion (LightningDiT) training.

Behavioral reference: ``generation/tokenizer/vtp_tokenizer.py:14-111`` —
exposes the tokenizer with the VAE interface LightningDiT expects:
``img_transform`` (ADM crop + optional hflip + normalize),
``encode_images`` -> (B, d, H/p, W/p) host latents,
``decode_to_images`` -> uint8 HWC, plus ``latent_size``/``embed_dim``/
``downsample_ratio`` attributes.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from vtp_tpu.config import VTPConfig
from vtp_tpu.models.vtp_model import (
    get_latents_decoded_images,
    get_reconstruction_latents,
)
from vtp_tpu.utils.image import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    center_crop_arr,
    to_nchw_float,
)

NORMALIZE_HALF = {"mean": (0.5, 0.5, 0.5), "std": (0.5, 0.5, 0.5)}
NORMALIZE_IMAGENET = {"mean": IMAGENET_MEAN, "std": IMAGENET_STD}


class VTPTokenizer:
    """Stateless-weights adapter around (config, params)."""

    def __init__(
        self,
        config: VTPConfig,
        params: dict,
        img_size: int = 256,
        normalize_type: str = "imagenet",
        compute_dtype=jnp.bfloat16,
        data_sharding=None,  # optional NamedSharding for batch DP
        quantize_int8: bool = False,
    ):
        self.data_sharding = data_sharding
        self.config = config
        if quantize_int8:
            # int8 W8A8 encoder for bulk extraction (utils/quantization);
            # the decode path (rFID protocol) always stays fp32.
            from vtp_tpu.utils.quantization import quantize_matmul_params

            params = dict(params)
            params["trunk"] = quantize_matmul_params(params["trunk"])
        self.params = params
        self.img_size = img_size
        self.normalize_type = normalize_type
        if normalize_type == "half":
            norm = NORMALIZE_HALF
        elif normalize_type == "imagenet":
            norm = NORMALIZE_IMAGENET
        else:
            raise ValueError(f"Unknown normalize_type: {normalize_type}")
        self.norm_mean = np.asarray(norm["mean"], np.float32).reshape(3, 1, 1)
        self.norm_std = np.asarray(norm["std"], np.float32).reshape(3, 1, 1)

        self.patch_size = config.vision_patch_size
        self.embed_dim = config.vision_feature_bottleneck
        self.downsample_ratio = self.patch_size
        self.latent_size = img_size // self.downsample_ratio

        self._encode = jax.jit(
            lambda p, x: get_reconstruction_latents(p, config, x, compute_dtype)
        )
        self._decode = jax.jit(
            lambda p, z: get_latents_decoded_images(p, config, z, None)
        )

    @classmethod
    def from_checkpoint(cls, hf_model_path: str, **kw) -> "VTPTokenizer":
        from vtp_tpu.convert.from_torch import load_vtp_checkpoint

        config, params = load_vtp_checkpoint(hf_model_path)
        return cls(config, jax.device_put(params), **kw)

    # ------------------------------------------------------------ API

    def img_transform(self, p_hflip: float = 0.0, img_size: Optional[int] = None,
                      seed: int = 0) -> Callable[[Image.Image], np.ndarray]:
        """PIL -> normalized (3, S, S) float32 (vtp_tokenizer.py:74-81).
        p_hflip in {0, 1} gives the deterministic pair the extraction
        tool uses; fractional values flip via a seeded RNG."""
        size = img_size or self.img_size
        rng = np.random.default_rng(seed)

        def transform(img: Image.Image) -> np.ndarray:
            img = center_crop_arr(img, size)
            if p_hflip >= 1.0 or (p_hflip > 0.0 and rng.random() < p_hflip):
                img = img.transpose(Image.FLIP_LEFT_RIGHT)
            return (to_nchw_float(img) - self.norm_mean) / self.norm_std

        return transform

    def _put(self, x):
        x = jnp.asarray(x)
        if (self.data_sharding is not None
                and x.shape[0] % self.data_sharding.mesh.shape["data"] == 0):
            return jax.device_put(x, self.data_sharding)
        return x

    def encode_images(self, images) -> np.ndarray:
        """(B, 3, H, W) normalized -> (B, d, H/p, W/p) fp32 host latents.
        With ``data_sharding`` set, the batch shards over the device
        mesh (the SPMD replacement for the reference's per-rank DDP
        loaders, extract_features_vtp.py:54-66)."""
        z = self._encode(self.params, self._put(images))
        return np.asarray(z, np.float32)

    def decode_to_images(self, z) -> np.ndarray:
        """(B, d, h, w) latents -> (B, H, W, 3) uint8
        (vtp_tokenizer.py:95-111)."""
        decoded = self._decode(self.params, self._put(jnp.asarray(z, jnp.float32)))
        decoded = np.asarray(decoded, np.float32)
        decoded = decoded * self.norm_std[None] + self.norm_mean[None]
        images = np.clip(decoded * 255.0, 0, 255)
        return images.transpose(0, 2, 3, 1).astype(np.uint8)


# reference-compatible alias (generation/tokenizer/vtp_tokenizer.py:14)
VTP_Tokenizer = VTPTokenizer
