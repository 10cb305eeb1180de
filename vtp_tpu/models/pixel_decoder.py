"""Transformer + pixel-shuffle decoder: f16d64 latents -> RGB.

Behavioral reference: ``vtp/models/decoders/pixel_decoder.py:15-162``.
The 1x1 conv in/out projections are plain GEMMs on (B, N, C) tokens;
PixelShuffle is a pure reshape/transpose (ops/patchify.py).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Union

import jax
import jax.numpy as jnp

from vtp_tpu.models.blocks import BlockConfig, init_stacked_blocks, scan_blocks
from vtp_tpu.models.initializers import trunc_normal
from vtp_tpu.models.vit import ROPE_DTYPES, _norm_init
from vtp_tpu.ops.ffn import linear
from vtp_tpu.ops.norms import apply_norm, norm_eps
from vtp_tpu.ops.patchify import pixel_shuffle
from vtp_tpu.ops.rope import rope_periods_init, rope_sincos


@dataclasses.dataclass(frozen=True)
class PixelDecoderConfig:
    in_chans: int = 64
    out_chans: int = 3
    upscale_factor: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    ffn_ratio: float = 4.0
    ffn_layer: str = "swiglu"
    norm_layer: str = "layernorm"
    layerscale_init: Optional[float] = None
    use_qk_norm: bool = False
    qkv_bias: bool = True
    proj_bias: bool = True
    ffn_bias: bool = True
    rope_base: Optional[float] = 100.0
    rope_min_period: Optional[float] = None
    rope_max_period: Optional[float] = None
    rope_normalize_coords: str = "separate"
    rope_dtype: str = "bf16"

    @property
    def block(self) -> BlockConfig:
        return BlockConfig(
            dim=self.embed_dim,
            num_heads=self.num_heads,
            ffn_ratio=self.ffn_ratio,
            ffn_layer=self.ffn_layer,
            norm_kind=self.norm_layer,
            qkv_bias=self.qkv_bias,
            proj_bias=self.proj_bias,
            ffn_bias=self.ffn_bias,
            layerscale_init=self.layerscale_init,
            use_qk_norm=self.use_qk_norm,
        )

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads


def init_pixel_decoder_params(key: jax.Array, cfg: PixelDecoderConfig) -> dict:
    k = jax.random.split(key, 4)
    d = cfg.embed_dim
    out_dim = cfg.out_chans * cfg.upscale_factor**2
    return {
        # 1x1 convs stored as (in, out) GEMM kernels
        "proj_in": {
            "kernel": trunc_normal(k[0], (cfg.in_chans, d), 0.02),
            "bias": jnp.zeros((d,), jnp.float32) if cfg.proj_bias else None,
        },
        "proj_out": {
            "kernel": trunc_normal(k[1], (d, out_dim), 0.02),
            "bias": jnp.zeros((out_dim,), jnp.float32) if cfg.proj_bias else None,
        },
        "rope": {"periods": rope_periods_init(
            cfg.head_dim, cfg.rope_base, cfg.rope_min_period, cfg.rope_max_period,
            dtype=ROPE_DTYPES[cfg.rope_dtype],
        )},
        "blocks": init_stacked_blocks(k[2], cfg.block, cfg.depth),
        "norm": _norm_init(cfg.norm_layer, d),
    }


def pixel_decoder_forward(
    params: dict,
    cfg: PixelDecoderConfig,
    latents: jax.Array,
    *,
    compute_dtype: Optional[jnp.dtype] = None,
    remat: Union[bool, str] = False,
    unroll: bool = False,
    precision: str = "float32",
) -> jax.Array:
    """(B, C_in, H', W') latents -> (B, 3, H'*u, W'*u) images
    (pixel_decoder.py:134-162). Runs fp32 by default, matching the
    reference's decode-under-fp32 eval protocol; in that mode matmuls
    are pinned to ``precision`` (TPU's DEFAULT would silently truncate
    fp32 operands to bf16 on the MXU and drift rFID).

    ``precision="high"`` selects 3-pass (tf32-class) fp32 matmuls
    (~1.6x faster decode; measured output error 38x below the
    protocol's own bf16-latent noise floor — PERF.md); "float32" is the
    reference-exact 6-pass mode. An explicit argument — not an env var —
    so the mode is part of every trace (round-4 verdict: trace-time env
    reads were a jit-cache hazard). Ignored when ``compute_dtype`` is
    set (bf16 serving path uses DEFAULT-precision MXU dots)."""
    if compute_dtype is None:
        with jax.default_matmul_precision(precision):
            return _pixel_decoder_forward(params, cfg, latents, None, remat, unroll)
    return _pixel_decoder_forward(params, cfg, latents, compute_dtype, remat, unroll)


def _pixel_decoder_forward(
    params: dict,
    cfg: PixelDecoderConfig,
    latents: jax.Array,
    compute_dtype: Optional[jnp.dtype],
    remat: Union[bool, str] = False,
    unroll: bool = False,
) -> jax.Array:
    B, _, H, W = latents.shape
    x = latents.transpose(0, 2, 3, 1).reshape(B, H * W, cfg.in_chans)
    x = linear(x, params["proj_in"], compute_dtype)

    rope = rope_sincos(
        params["rope"]["periods"], H, W,
        normalize_coords=cfg.rope_normalize_coords,
    )
    (x,), _ = scan_blocks(
        (x,), params["blocks"], cfg.block, [rope],
        depth=cfg.depth, compute_dtype=compute_dtype, remat=remat, unroll=unroll,
    )
    x = apply_norm(x, params["norm"], cfg.norm_layer, norm_eps(cfg.norm_layer))
    x = linear(x, params["proj_out"], compute_dtype)  # (B, HW, 3*u^2)
    x = x.transpose(0, 2, 1).reshape(B, -1, H, W)
    return pixel_shuffle(x, cfg.upscale_factor)


# ---------------------------------------------------------------- factories
# Size factories mirroring the reference's dinov3_pixel_decoder_*
# constructors (pixel_decoder.py:166-214); same in_chans/upscale
# defaults. VTP tokenizers override to in_chans=64, upscale_factor=16.

def pixel_decoder_small(in_chans: int = 256, out_chans: int = 3,
                        upscale_factor: int = 4, **kw) -> PixelDecoderConfig:
    """pixel_decoder.py:166-180."""
    return PixelDecoderConfig(in_chans=in_chans, out_chans=out_chans,
                              upscale_factor=upscale_factor,
                              embed_dim=384, depth=12, num_heads=6, ffn_ratio=4.0, **kw)


def pixel_decoder_base(in_chans: int = 256, out_chans: int = 3,
                       upscale_factor: int = 4, **kw) -> PixelDecoderConfig:
    """pixel_decoder.py:183-197."""
    return PixelDecoderConfig(in_chans=in_chans, out_chans=out_chans,
                              upscale_factor=upscale_factor,
                              embed_dim=768, depth=12, num_heads=12, ffn_ratio=4.0, **kw)


def pixel_decoder_large(in_chans: int = 256, out_chans: int = 3,
                        upscale_factor: int = 4, **kw) -> PixelDecoderConfig:
    """pixel_decoder.py:200-214."""
    return PixelDecoderConfig(in_chans=in_chans, out_chans=out_chans,
                              upscale_factor=upscale_factor,
                              embed_dim=1024, depth=24, num_heads=16, ffn_ratio=4.0, **kw)


DECODER_FACTORIES = {
    "pixel_decoder_small": pixel_decoder_small,
    "pixel_decoder_base": pixel_decoder_base,
    "pixel_decoder_large": pixel_decoder_large,
}
