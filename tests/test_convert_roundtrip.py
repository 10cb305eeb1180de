"""Converter round-trips: ours -> HF naming -> ours, and export loads
into the torch reference with identical outputs."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.reference_loader import (
    load_reference,
    reference_available,
    torch_state_dict_to_numpy,
)

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference not mounted")

vtp_hf = load_reference()

from vtp_tpu.config import VTPConfig  # noqa: E402
from vtp_tpu.convert.from_torch import convert_state_dict  # noqa: E402
from vtp_tpu.convert.to_torch import export_state_dict  # noqa: E402
from vtp_tpu.models.vtp_model import VTPModel, init_vtp_params  # noqa: E402

TINY = dict(
    image_size=32, vision_patch_size=16, vision_embed_dim=64, vision_depth=2,
    vision_num_heads=2, vision_feature_bottleneck=16, text_context_length=8,
    text_vocab_size=64, text_embed_dim=64, text_num_heads=2, text_depth=2,
    decoder_embed_dim=64, decoder_num_heads=2, decoder_depth=2,
)


def test_param_roundtrip_ours_to_hf_to_ours(rng):
    cfg = VTPConfig.from_dict(TINY)
    params = init_vtp_params(jax.random.key(0), cfg)
    sd = export_state_dict(params, cfg)
    back = convert_state_dict(sd, cfg)

    flat1, _ = jax.tree_util.tree_flatten_with_path(params)
    flat2 = dict(jax.tree_util.tree_flatten_with_path(back)[0])
    flat2 = {jax.tree_util.keystr(p): l for p, l in jax.tree_util.tree_flatten_with_path(back)[0]}
    for path, leaf in flat1:
        key = jax.tree_util.keystr(path)
        got = flat2[key]
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(leaf, np.float32),
            atol=1e-6, err_msg=key,
        )


def test_export_loads_in_torch_reference(rng):
    cfg = VTPConfig.from_dict(TINY)
    params = init_vtp_params(jax.random.key(1), cfg)
    sd_np = export_state_dict(params, cfg)

    tmodel = vtp_hf.VTPModel(vtp_hf.VTPConfig(**TINY)).eval()
    missing, unexpected = tmodel.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd_np.items()},
        strict=False,
    )
    # attn_mask is a non-persistent buffer (absent from state_dict), so
    # NOTHING may be missing or unexpected — exact coverage both ways.
    assert not unexpected, unexpected
    assert not missing, missing

    x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = tmodel.get_reconstruction_latents(torch.from_numpy(x)).numpy()
    ours = VTPModel(cfg, params, encode_dtype=None)
    got = np.asarray(ours.get_reconstruction_latents(jnp.asarray(x)), np.float32)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=5e-3)
