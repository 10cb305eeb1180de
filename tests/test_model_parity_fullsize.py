"""Full-scale parity gate: VTP-S-sized model (384-dim / depth-12 trunk,
768/12 text tower, 256px, N=257 tokens) with converted random weights vs
the live torch reference, across the full public API
(vtp/models/vtp_hf/modeling_vtp.py:184-472).

The everyday tests prove parity at toy dimensions only (64-dim depth-2,
64px — tests/test_model_parity.py); scale-dependent numerics (fp32 norm
accumulation at 384/768 dims, the N=257 -> 264 token-alignment padding,
RoPE tables at 16x16, drift over 12 blocks) are only exercised here.

Opt-in (slow: full VTP-S on one CPU core — minutes of compile):
    VTP_RUN_FULLSIZE=1 python -m pytest tests/test_model_parity_fullsize.py -q
Measured tolerances are recorded in PARITY.md.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from tests.reference_loader import (
    load_reference,
    reference_available,
    torch_state_dict_to_numpy,
)

pytestmark = [
    pytest.mark.skipif(not reference_available(), reason="reference not mounted"),
    pytest.mark.skipif(
        not os.environ.get("VTP_RUN_FULLSIZE"),
        reason="full-size parity is opt-in: set VTP_RUN_FULLSIZE=1",
    ),
]

if reference_available():
    vtp_hf = load_reference()

import torch  # noqa: E402

from vtp_tpu.config import VTPConfig  # noqa: E402
from vtp_tpu.convert.from_torch import convert_state_dict  # noqa: E402
from vtp_tpu.models.vtp_model import VTPModel  # noqa: E402

# VTP-S-f16d64 at the protocol resolution (reference
# vision_transformer.py:328 vit_small + pixel_decoder.py:166 small +
# configuration_vtp.py text defaults). Full 49408-token CLIP vocab and
# 256px inputs -> N = 1 + 256 = 257 vision tokens, the shape the
# token-alignment padding path (vit.token_pad_len) actually handles.
FULL = dict(
    image_size=256,
    vision_patch_size=16,
    vision_embed_dim=384,
    vision_depth=12,
    vision_num_heads=6,
    vision_feature_bottleneck=64,
    text_context_length=77,
    text_vocab_size=49408,
    text_embed_dim=768,
    text_num_heads=12,
    text_depth=12,
    decoder_embed_dim=384,
    decoder_num_heads=6,
    decoder_depth=12,
)

ATOL = 5e-4   # VERDICT r2 #2 gate: fp32 <= 5e-4 at protocol scale
RTOL = 5e-3


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(0)
    tmodel = vtp_hf.VTPModel(vtp_hf.VTPConfig(**FULL)).eval()
    cfg = VTPConfig.from_dict(FULL)
    params = convert_state_dict(torch_state_dict_to_numpy(tmodel), cfg)
    jmodel = VTPModel(cfg, params, encode_dtype=None, decode_dtype=None)
    return tmodel, jmodel


@pytest.fixture(scope="module")
def image(rng):
    return rng.standard_normal((2, 3, 256, 256)).astype(np.float32)


@pytest.fixture(scope="module")
def text(rng):
    t = rng.integers(1, 49000, (3, 77))
    t[:, 0] = 49406      # SOT
    t[0, 40:] = 0        # padded row
    t[:, -1] = 49407     # EOT = argmax pool position
    return t


def close(j, t, atol=ATOL, rtol=RTOL, what=""):
    np.testing.assert_allclose(
        np.asarray(j, np.float32), t.detach().numpy(), atol=atol, rtol=rtol,
        err_msg=what,
    )


def close_or_oracle(j, t32, t64, what=""):
    """Primary gate: fp32-vs-fp32 <= 5e-4. At protocol scale a handful
    of cls elements drift past that from fp32 reduction-order alone, so
    the fallback gate uses the fp64 torch ORACLE: our fp32 must sit as
    close to the true value as the reference's own fp32 (within 2x).
    Measured numbers live in PARITY.md."""
    ours = np.asarray(j, np.float32)
    ref32 = t32.detach().numpy()
    if np.allclose(ours, ref32, atol=ATOL, rtol=RTOL):
        return
    ref64 = t64.detach().numpy()
    d_ours = np.abs(ours.astype(np.float64) - ref64).max()
    d_torch = np.abs(ref32.astype(np.float64) - ref64).max()
    print(f"\n[fullsize oracle] {what}: |ours-fp64|={d_ours:.3e} "
          f"|torch32-fp64|={d_torch:.3e}")
    assert d_ours <= max(ATOL, 2.0 * d_torch), (
        f"{what}: ours {d_ours:.3e} vs torch-fp32 {d_torch:.3e} from fp64 oracle"
    )


@pytest.fixture(scope="module")
def tmodel64(models):
    tmodel, _ = models
    import copy

    return copy.deepcopy(tmodel).double().eval()


def test_last_layer_feature(models, tmodel64, image):
    tmodel, jmodel = models
    with torch.no_grad():
        ref = tmodel.get_last_layer_feature(torch.from_numpy(image))
        ref64 = tmodel64.get_last_layer_feature(torch.from_numpy(image).double())
    ours = jmodel.get_last_layer_feature(jnp.asarray(image))
    close_or_oracle(ours["cls_token"], ref["cls_token"], ref64["cls_token"],
                    what="cls")
    close(ours["patch_tokens"], ref["patch_tokens"], what="patch")


def test_reconstruction_latents(models, image):
    tmodel, jmodel = models
    with torch.no_grad():
        ref = tmodel.get_reconstruction_latents(torch.from_numpy(image))
    ours = jmodel.get_reconstruction_latents(jnp.asarray(image))
    assert ours.shape == tuple(ref.shape) == (2, 64, 16, 16)
    close(ours, ref, what="latents")


def test_decode(models, rng):
    tmodel, jmodel = models
    latents = rng.standard_normal((2, 64, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel.get_latents_decoded_images(torch.from_numpy(latents))
    ours = jmodel.get_latents_decoded_images(jnp.asarray(latents))
    assert ours.shape == tuple(ref.shape) == (2, 3, 256, 256)
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


def test_clip_text_feature(models, text):
    tmodel, jmodel = models
    with torch.no_grad():
        ref = tmodel.get_clip_text_feature(torch.from_numpy(text))
    ours = jmodel.get_clip_text_feature(jnp.asarray(text))
    close(ours, ref, what="clip text")


def test_clip_logits(models, image, text):
    tmodel, jmodel = models
    with torch.no_grad():
        ref_i2t, ref_t2i = tmodel.get_clip_logits(
            torch.from_numpy(image), torch.from_numpy(text)
        )
    ours_i2t, ours_t2i = jmodel.get_clip_logits(jnp.asarray(image), jnp.asarray(text))
    close(ours_i2t, ref_i2t, atol=2e-3, what="logits")
    close(ours_t2i, ref_t2i, atol=2e-3, what="logits.T")


def test_intermediate_layers(models, tmodel64, image):
    tmodel, jmodel = models
    with torch.no_grad():
        ref = tmodel.get_intermediate_layers_feature(
            torch.from_numpy(image), n=4, return_class_token=True
        )
        ref64 = tmodel64.get_intermediate_layers_feature(
            torch.from_numpy(image).double(), n=4, return_class_token=True
        )
    ours = jmodel.get_intermediate_layers_feature(
        jnp.asarray(image), n=4, return_class_token=True
    )
    assert len(ours) == len(ref) == 4
    for (jp, jc), (tp, tc), (_, tc64) in zip(ours, ref, ref64):
        close(jp, tp, what="intermediate patches")
        close_or_oracle(jc, tc, tc64, what="intermediate cls")


def test_bf16_protocol_drift_stats(models, image):
    """Record bf16-encode drift vs fp32 at protocol shape (the numbers
    live in PARITY.md). The protocol itself quantizes latents to bf16,
    so rel. drift must sit at bf16 noise (~1e-2), not blow up over 12
    blocks."""
    tmodel, jmodel = models
    bf16_model = VTPModel(jmodel.config, jmodel.params, encode_dtype=jnp.bfloat16)
    lat32 = np.asarray(jmodel.get_reconstruction_latents(jnp.asarray(image)))
    lat16 = np.asarray(
        bf16_model.get_reconstruction_latents(jnp.asarray(image)), np.float32
    )
    scale = float(np.abs(lat32).mean())
    abs_err = np.abs(lat16 - lat32)
    rel_mean = float(abs_err.mean()) / scale
    rel_p99 = float(np.quantile(abs_err, 0.99)) / scale
    print(f"\n[fullsize] bf16 encode drift: rel_mean={rel_mean:.3e} "
          f"rel_p99={rel_p99:.3e} (signal scale {scale:.3e})")
    assert rel_mean < 0.05, rel_mean

    # and vs the torch bf16-autocast rounding (the actual protocol)
    with torch.autocast("cpu", dtype=torch.bfloat16), torch.no_grad():
        tl16 = tmodel.get_reconstruction_latents(torch.from_numpy(image))
    tl16 = tl16.float().numpy()
    cross = float(np.abs(lat16 - tl16).mean()) / scale
    print(f"[fullsize] bf16 ours-vs-torch-autocast: rel_mean={cross:.3e}")
    assert cross < 0.08, cross
