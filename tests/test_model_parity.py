"""End-to-end parity of VTPModel against the PyTorch reference HF model
(vtp/models/vtp_hf/modeling_vtp.py) on a tiny random-weight config."""

import numpy as np
import pytest

import jax.numpy as jnp

from tests.reference_loader import (
    load_reference,
    reference_available,
    torch_state_dict_to_numpy,
)

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference not mounted")

vtp_hf = load_reference()

import torch  # noqa: E402

from vtp_tpu.config import VTPConfig  # noqa: E402
from vtp_tpu.convert.from_torch import convert_state_dict  # noqa: E402
from vtp_tpu.models.vtp_model import VTPModel  # noqa: E402

TINY = dict(
    image_size=64,
    vision_patch_size=16,
    vision_embed_dim=64,
    vision_depth=2,
    vision_num_heads=2,
    vision_feature_bottleneck=16,
    text_context_length=16,
    text_vocab_size=512,
    text_embed_dim=64,
    text_num_heads=2,
    text_depth=2,
    decoder_embed_dim=64,
    decoder_num_heads=2,
    decoder_depth=2,
)


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(0)
    tmodel = vtp_hf.VTPModel(vtp_hf.VTPConfig(**TINY)).eval()
    cfg = VTPConfig.from_dict(TINY)
    params = convert_state_dict(torch_state_dict_to_numpy(tmodel), cfg)
    # fp32 compute for tight parity; bf16 protocol is benched separately
    jmodel = VTPModel(cfg, params, encode_dtype=None, decode_dtype=None)
    return tmodel, jmodel


@pytest.fixture(scope="module")
def image(rng):
    return rng.standard_normal((2, 3, 64, 64)).astype(np.float32)


def close(j, t, atol=5e-4, rtol=5e-3, what=""):
    np.testing.assert_allclose(
        np.asarray(j, np.float32), t.detach().numpy(), atol=atol, rtol=rtol, err_msg=what
    )


def test_last_layer_feature(models, image):
    tmodel, jmodel = models
    with torch.no_grad():
        ref = tmodel.get_last_layer_feature(torch.from_numpy(image))
    ours = jmodel.get_last_layer_feature(jnp.asarray(image))
    close(ours["cls_token"], ref["cls_token"], what="cls")
    close(ours["patch_tokens"], ref["patch_tokens"], what="patch")


def test_last_layer_feature_with_bottleneck(models, image):
    tmodel, jmodel = models
    with torch.no_grad():
        ref = tmodel.get_last_layer_feature(torch.from_numpy(image), use_bottleneck=True)
    ours = jmodel.get_last_layer_feature(jnp.asarray(image), use_bottleneck=True)
    close(ours["cls_token"], ref["cls_token"], what="cls-bottleneck")
    close(ours["patch_tokens"], ref["patch_tokens"], what="patch-bottleneck")


def test_reconstruction_latents(models, image):
    tmodel, jmodel = models
    with torch.no_grad():
        ref = tmodel.get_reconstruction_latents(torch.from_numpy(image))
    ours = jmodel.get_reconstruction_latents(jnp.asarray(image))
    assert ours.shape == tuple(ref.shape)  # (B, 16, 4, 4)
    close(ours, ref, what="latents")


def test_decode(models, rng):
    tmodel, jmodel = models
    latents = rng.standard_normal((2, 16, 4, 4)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel.get_latents_decoded_images(torch.from_numpy(latents))
    ours = jmodel.get_latents_decoded_images(jnp.asarray(latents))
    assert ours.shape == tuple(ref.shape)  # (B, 3, 64, 64)
    close(ours, ref, what="decoded")


def test_roundtrip(models, image):
    tmodel, jmodel = models
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(image), forward_type="rec")
    ours = jmodel.forward(jnp.asarray(image), forward_type="rec")
    close(ours["reconstructed_image"], ref["reconstructed_image"], what="roundtrip")


def test_clip_image_feature(models, image):
    tmodel, jmodel = models
    with torch.no_grad():
        ref = tmodel.get_clip_image_feature(torch.from_numpy(image))
    ours = jmodel.get_clip_image_feature(jnp.asarray(image))
    close(ours, ref, what="clip image")


def test_clip_text_feature(models, rng):
    tmodel, jmodel = models
    text = rng.integers(1, 500, (3, 16))
    text[:, 0] = 510
    text[0, 10:] = 0
    text[:, -1] = 511  # EOT = argmax position
    with torch.no_grad():
        ref = tmodel.get_clip_text_feature(torch.from_numpy(text))
    ours = jmodel.get_clip_text_feature(jnp.asarray(text))
    close(ours, ref, what="clip text")


def test_clip_logits(models, image, rng):
    tmodel, jmodel = models
    text = rng.integers(1, 500, (3, 16))
    text[:, -1] = 511
    with torch.no_grad():
        ref_i2t, ref_t2i = tmodel.get_clip_logits(torch.from_numpy(image), torch.from_numpy(text))
    ours_i2t, ours_t2i = jmodel.get_clip_logits(jnp.asarray(image), jnp.asarray(text))
    close(ours_i2t, ref_i2t, atol=2e-3, what="logits")
    close(ours_t2i, ref_t2i, atol=2e-3, what="logits.T")


def test_intermediate_layers(models, image):
    tmodel, jmodel = models
    with torch.no_grad():
        ref = tmodel.get_intermediate_layers_feature(
            torch.from_numpy(image), n=2, return_class_token=True
        )
    ours = jmodel.get_intermediate_layers_feature(
        jnp.asarray(image), n=2, return_class_token=True
    )
    assert len(ours) == len(ref) == 2
    for (jp, jc), (tp, tc) in zip(ours, ref):
        close(jp, tp, what="intermediate patches")
        close(jc, tc, what="intermediate cls")


def test_intermediate_layers_reshape(models, image):
    tmodel, jmodel = models
    with torch.no_grad():
        ref = tmodel.get_intermediate_layers_feature(torch.from_numpy(image), n=1, reshape=True)
    ours = jmodel.get_intermediate_layers_feature(jnp.asarray(image), n=1, reshape=True)
    assert ours[0].shape == tuple(ref[0].shape)  # (B, D, h, w)
    close(ours[0], ref[0], what="reshaped")


def test_bf16_protocol_close_to_fp32(models, image):
    """The bf16 encode protocol must track fp32 within bf16 noise."""
    tmodel, jmodel = models
    bf16_model = VTPModel(jmodel.config, jmodel.params, encode_dtype=jnp.bfloat16)
    lat32 = jmodel.get_reconstruction_latents(jnp.asarray(image))
    lat16 = bf16_model.get_reconstruction_latents(jnp.asarray(image))
    scale = float(np.abs(np.asarray(lat32)).mean())
    err = float(np.abs(np.asarray(lat16, np.float32) - np.asarray(lat32)).mean())
    assert err < 0.05 * max(scale, 1e-3), (err, scale)


def test_intermediate_layers_index_list(models, image):
    tmodel, jmodel = models
    with torch.no_grad():
        ref = tmodel.get_intermediate_layers_feature(torch.from_numpy(image), n=[0])
    ours = jmodel.get_intermediate_layers_feature(jnp.asarray(image), n=[0])
    assert len(ours) == len(ref) == 1
    close(ours[0], ref[0], what="block-0 patches via index list")
