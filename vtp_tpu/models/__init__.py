from vtp_tpu.models.vit import (
    ViTConfig,
    init_vit_params,
    vit_forward_features,
    vit_get_intermediate_layers,
)
from vtp_tpu.models.pixel_decoder import (
    PixelDecoderConfig,
    init_pixel_decoder_params,
    pixel_decoder_forward,
)
from vtp_tpu.models.text_encoder import (
    TextConfig,
    init_text_params,
    text_encode,
)
from vtp_tpu.models.vtp_model import VTPModel, init_vtp_params
from vtp_tpu.models.dino_head import DinoHeadConfig, init_dino_head_params, dino_head_forward

__all__ = [
    "ViTConfig",
    "init_vit_params",
    "vit_forward_features",
    "vit_get_intermediate_layers",
    "PixelDecoderConfig",
    "init_pixel_decoder_params",
    "pixel_decoder_forward",
    "TextConfig",
    "init_text_params",
    "text_encode",
    "VTPModel",
    "init_vtp_params",
    "DinoHeadConfig",
    "init_dino_head_params",
    "dino_head_forward",
]
