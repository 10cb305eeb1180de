"""Named size factories match the reference constructors
(vision_transformer.py:328-410, pixel_decoder.py:166-214)."""

import jax
import jax.numpy as jnp
import pytest

from vtp_tpu.models import (
    DECODER_FACTORIES,
    VIT_FACTORIES,
    init_vit_params,
    vit_forward_features,
)

# (embed_dim, depth, num_heads, ffn_ratio) from the reference factories.
VIT_EXPECTED = {
    "vit_small": (384, 12, 6, 4.0),
    "vit_base": (768, 12, 12, 4.0),
    "vit_large": (1024, 24, 16, 4.0),
    "vit_so400m": (1152, 27, 18, 3.777777778),
    "vit_huge2": (1280, 32, 20, 4.0),
    "vit_giant2": (1536, 40, 24, 4.0),
    "vit_7b": (4096, 40, 32, 3.0),
}

DEC_EXPECTED = {
    "pixel_decoder_small": (384, 12, 6),
    "pixel_decoder_base": (768, 12, 12),
    "pixel_decoder_large": (1024, 24, 16),
}


@pytest.mark.parametrize("name", sorted(VIT_EXPECTED))
def test_vit_factory_hparams(name):
    cfg = VIT_FACTORIES[name](patch_size=14)
    dim, depth, heads, ratio = VIT_EXPECTED[name]
    assert (cfg.embed_dim, cfg.depth, cfg.num_heads) == (dim, depth, heads)
    assert cfg.ffn_ratio == pytest.approx(ratio)
    assert cfg.patch_size == 14


@pytest.mark.parametrize("name", sorted(DEC_EXPECTED))
def test_decoder_factory_hparams(name):
    cfg = DECODER_FACTORIES[name]()
    dim, depth, heads = DEC_EXPECTED[name]
    assert (cfg.embed_dim, cfg.depth, cfg.num_heads) == (dim, depth, heads)
    # reference defaults (pixel_decoder.py:167-168)
    assert (cfg.in_chans, cfg.out_chans, cfg.upscale_factor) == (256, 3, 4)
    # VTP tokenizer overrides plumb through
    vtp = DECODER_FACTORIES[name](in_chans=64, upscale_factor=16)
    assert (vtp.in_chans, vtp.upscale_factor) == (64, 16)


def test_vit_small_factory_forward():
    cfg = VIT_FACTORIES["vit_small"]()
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    img = jnp.zeros((1, 3, 32, 32), jnp.float32)
    out = vit_forward_features(params, cfg, img)
    assert out["x_norm_clstoken"].shape == (1, 384)
    assert out["x_norm_patchtokens"].shape == (1, 4, 384)
