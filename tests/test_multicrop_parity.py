"""Multi-crop list-mode forward parity vs the reference
(vision_transformer.py:221-258 forward_features_list) — the SSL path
with mixed crop resolutions and mask tokens."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.reference_loader import (
    load_reference,
    reference_available,
    torch_state_dict_to_numpy,
)

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference not mounted")

vtp_hf = load_reference()

import torch  # noqa: E402

from vtp.models.encoders import DinoVisionTransformerWithBottleneck  # noqa: E402

from vtp_tpu.convert.from_torch import convert_trunk  # noqa: E402
from vtp_tpu.config import VTPConfig  # noqa: E402
from vtp_tpu.models.vit import vit_forward_features  # noqa: E402
from vtp_tpu.models.vtp_model import vit_config_from  # noqa: E402


@pytest.fixture(scope="module")
def setup():
    torch.manual_seed(0)
    ref = DinoVisionTransformerWithBottleneck(
        img_size=64, patch_size=16, embed_dim=64, depth=2, num_heads=2,
        ffn_ratio=4.0, ffn_layer="swiglu", norm_layer="rmsnorm",
        vit_feature_bottleneck=16,
    ).eval()
    sd = {f"trunk.{k}": v for k, v in torch_state_dict_to_numpy(ref).items()}
    cfg = vit_config_from(VTPConfig(
        image_size=64, vision_embed_dim=64, vision_depth=2, vision_num_heads=2,
        vision_feature_bottleneck=16,
    ))
    params = convert_trunk(sd, VTPConfig(vision_embed_dim=64, vision_depth=2))
    return ref, cfg, params


def test_multicrop_list_forward_matches(setup, rng):
    ref, cfg, params = setup
    g = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)   # global crops
    l = rng.standard_normal((4, 3, 32, 32)).astype(np.float32)   # local crops

    with torch.no_grad():
        ref_out = ref.forward_features(
            [torch.from_numpy(g), torch.from_numpy(l)], masks=[None, None],
            use_bottleneck=False,
        )
    ours = vit_forward_features(
        params, cfg, [jnp.asarray(g), jnp.asarray(l)], masks=None,
        use_bottleneck=False, compute_dtype=None,
    )
    for i in range(2):
        np.testing.assert_allclose(
            np.asarray(ours[i]["x_norm_clstoken"], np.float32),
            ref_out[i]["x_norm_clstoken"].numpy(), atol=5e-4, rtol=5e-3,
        )
        np.testing.assert_allclose(
            np.asarray(ours[i]["x_norm_patchtokens"], np.float32),
            ref_out[i]["x_norm_patchtokens"].numpy(), atol=5e-4, rtol=5e-3,
        )


def test_masked_forward_matches(setup, rng):
    """Mask-token substitution path (prepare_tokens_with_masks,
    vision_transformer.py:189-219) with a nonzero mask token."""
    ref, cfg, params = setup
    with torch.no_grad():
        ref.mask_token.copy_(torch.randn(1, 64))
    params = dict(params)
    params["mask_token"] = jnp.asarray(ref.mask_token.detach().numpy())

    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    masks = rng.random((2, 16)) < 0.4

    with torch.no_grad():
        ref_out = ref.forward_features(
            torch.from_numpy(x), masks=torch.from_numpy(masks), use_bottleneck=False
        )
    ours = vit_forward_features(
        params, cfg, jnp.asarray(x), masks=jnp.asarray(masks),
        use_bottleneck=False, compute_dtype=None,
    )
    np.testing.assert_allclose(
        np.asarray(ours["x_norm_patchtokens"], np.float32),
        ref_out["x_norm_patchtokens"].numpy(), atol=5e-4, rtol=5e-3,
    )
