"""Int8 serving quantization (utils/quantization + the ops.ffn.linear
dispatch). Quality protocol stays fp32/bf16; these tests pin the
quantizer's error bounds and that the quantized tree drops into the
standard forwards unchanged."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vtp_tpu.config import VTPConfig
from vtp_tpu.models.vtp_model import VTPModel
from vtp_tpu.ops.ffn import linear
from vtp_tpu.utils.quantization import (
    int8_linear,
    quantize_kernel,
    quantize_matmul_params,
)


def _tiny_cfg():
    return VTPConfig(
        image_size=32, vision_patch_size=16, vision_embed_dim=64,
        vision_depth=2, vision_num_heads=2, vision_feature_bottleneck=16,
        text_context_length=12, text_vocab_size=128, text_embed_dim=64,
        text_num_heads=2, text_depth=2, decoder_embed_dim=64,
        decoder_num_heads=2, decoder_depth=2,
    )


def test_quantize_kernel_error_bound():
    k = jax.random.normal(jax.random.key(0), (96, 64)) * 0.07
    qk = quantize_kernel(k)
    deq = qk["q"].astype(jnp.float32) * qk["scale"][None, :]
    # symmetric round-to-nearest: per-element error <= scale/2
    err = jnp.abs(deq - k)
    assert float(jnp.max(err - qk["scale"][None, :] / 2)) <= 1e-7


def test_quantize_kernel_stacked_matches_per_layer():
    """Leading (depth) axes quantize per layer: slicing layer i off the
    stacked result equals quantizing layer i alone (the property the
    scan/unroll block params rely on)."""
    k = jax.random.normal(jax.random.key(1), (3, 32, 16))
    stacked = quantize_kernel(k)
    for i in range(3):
        single = quantize_kernel(k[i])
        np.testing.assert_array_equal(np.asarray(stacked["q"][i]),
                                      np.asarray(single["q"]))
        np.testing.assert_allclose(np.asarray(stacked["scale"][i]),
                                   np.asarray(single["scale"]), rtol=1e-7)


def test_int8_linear_close_to_fp():
    x = jax.random.normal(jax.random.key(2), (17, 96))
    k = jax.random.normal(jax.random.key(3), (96, 64)) * 0.05
    b = jax.random.normal(jax.random.key(4), (64,)) * 0.01
    ref = x @ k + b
    got = int8_linear(x, quantize_kernel(k), b)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel


def test_linear_dispatches_on_quantized_params():
    x = jax.random.normal(jax.random.key(5), (4, 7, 32))
    p = {"kernel": jax.random.normal(jax.random.key(6), (32, 24)) * 0.1,
         "bias": jnp.zeros((24,))}
    ref = linear(x, p, jnp.float32)
    qp = quantize_matmul_params(p)
    assert set(qp) == {"q", "scale", "bias"}
    got = linear(x, qp, jnp.float32)
    assert got.dtype == jnp.float32 and got.shape == ref.shape
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel


def test_quantized_model_end_to_end():
    """quantize_for_serving drops into every encode/CLIP method; outputs
    stay close to the fp path at tiny scale."""
    model = VTPModel.init(jax.random.key(0), _tiny_cfg(),
                          encode_dtype=jnp.float32)
    # text included here to cover the dispatch; the DEFAULT is trunk-only
    # (int8 text measured slower on v5e — PERF.md round 3)
    qmodel = model.quantize_for_serving(parts=("trunk", "text"))

    img = jax.random.normal(jax.random.key(7), (2, 3, 32, 32))
    txt = jax.random.randint(jax.random.key(8), (2, 12), 1, 120)

    lat = model.get_reconstruction_latents(img)
    qlat = qmodel.get_reconstruction_latents(img)
    assert qlat.shape == lat.shape
    a, b = np.asarray(lat, np.float32).ravel(), np.asarray(qlat, np.float32).ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    assert cos > 0.99, cos

    f = np.asarray(model.get_clip_text_feature(txt), np.float32)
    qf = np.asarray(qmodel.get_clip_text_feature(txt), np.float32)
    cos = float((f.ravel() @ qf.ravel())
                / (np.linalg.norm(f) * np.linalg.norm(qf) + 1e-12))
    assert cos > 0.99, cos

    # default serving tree keeps the protocol decode path: fp weights,
    # fp32 output
    rec = qmodel.get_latents_decoded_images(qlat)
    assert rec.dtype == jnp.float32

    # explicit int8-decoder serving tier: quantized weights force a
    # bf16 serving decode dtype (never silently the protocol path) and
    # the images stay close to the fp32 decode of the same latents
    # (measured 47.8 dB PSNR at VTP-L — PERF.md round 3b)
    qdec = model.quantize_for_serving(parts=("trunk", "pixel_decoder"))
    assert "q" in qdec.params["pixel_decoder"]["proj_in"]
    rec_ref = np.asarray(model.get_latents_decoded_images(qlat), np.float32)
    rec_q = np.asarray(qdec.get_latents_decoded_images(qlat), np.float32)
    rel = np.linalg.norm(rec_q - rec_ref) / (np.linalg.norm(rec_ref) + 1e-12)
    assert np.isfinite(rec_q).all() and rel < 0.2, rel
