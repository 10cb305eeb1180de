from vtp_tpu.models.vit import (
    VIT_FACTORIES,
    ViTConfig,
    init_vit_params,
    vit_7b,
    vit_base,
    vit_forward_features,
    vit_get_intermediate_layers,
    vit_giant2,
    vit_huge2,
    vit_large,
    vit_small,
    vit_so400m,
)
from vtp_tpu.models.pixel_decoder import (
    DECODER_FACTORIES,
    PixelDecoderConfig,
    init_pixel_decoder_params,
    pixel_decoder_base,
    pixel_decoder_forward,
    pixel_decoder_large,
    pixel_decoder_small,
)
from vtp_tpu.models.text_encoder import (
    TextConfig,
    init_text_params,
    text_encode,
)
from vtp_tpu.models.vtp_model import VTPModel, init_vtp_params
from vtp_tpu.models.dino_head import DinoHeadConfig, init_dino_head_params, dino_head_forward

__all__ = [
    "VIT_FACTORIES",
    "DECODER_FACTORIES",
    "vit_small", "vit_base", "vit_large", "vit_so400m",
    "vit_huge2", "vit_giant2", "vit_7b",
    "pixel_decoder_small", "pixel_decoder_base", "pixel_decoder_large",
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
