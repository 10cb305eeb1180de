"""Token alignment padding (vit.token_pad_len/_pad_tokens) must be
output-invariant: padded rows are masked as attention keys and sliced
off after the block stack, so features match the unpadded forward
exactly (the per-row math never mixes rows outside attention)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vtp_tpu.models.vit import ViTConfig, init_vit_params, vit_forward_features
from vtp_tpu.models.vit import vit_get_intermediate_layers
from vtp_tpu.ops.dispatch import kernel_overrides


CFG = ViTConfig(embed_dim=32, depth=2, num_heads=2, patch_size=8,
                n_storage_tokens=2, feature_bottleneck=8)


@pytest.fixture()
def setup():
    params = init_vit_params(jax.random.key(0), CFG)
    img = jax.random.normal(jax.random.key(1), (2, 3, 24, 24))  # 9+3 = 12 tokens
    return params, img


def _forward(params, img, force_pad):
    with kernel_overrides(force_token_pad=force_pad,
                          disable_token_pad=not force_pad):
        return vit_forward_features(params, CFG, img)


def test_padding_invariant_forward(setup):
    params, img = setup
    a = _forward(params, img, force_pad=False)
    b = _forward(params, img, force_pad=True)
    for k in ("x_norm_clstoken", "x_norm_patchtokens", "x_prenorm"):
        np.testing.assert_allclose(
            np.asarray(a[k], np.float32), np.asarray(b[k], np.float32),
            atol=1e-6, err_msg=k,
        )
    assert a["x_prenorm"].shape == b["x_prenorm"].shape  # pads sliced off


def test_padding_invariant_intermediates(setup):
    params, img = setup
    with kernel_overrides(disable_token_pad=True):
        a = vit_get_intermediate_layers(params, CFG, img, n=2, return_class_token=True)
    with kernel_overrides(force_token_pad=True):
        b = vit_get_intermediate_layers(params, CFG, img, n=2, return_class_token=True)
    for (pa, ca), (pb, cb) in zip(a, b):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), atol=1e-6)
        np.testing.assert_allclose(np.asarray(ca), np.asarray(cb), atol=1e-6)


def test_padding_invariant_grad(setup):
    params, img = setup

    def loss(p, force):
        out = _forward(p, img, force_pad=force)
        return (out["x_norm_patchtokens"].astype(jnp.float32) ** 2).mean()

    ga = jax.grad(lambda p: loss(p, False))(params)
    gb = jax.grad(lambda p: loss(p, True))(params)
    flat_a = jax.tree_util.tree_leaves_with_path(ga)
    flat_b = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(gb)}
    for k, va in flat_a:
        np.testing.assert_allclose(
            np.asarray(va, np.float32),
            np.asarray(flat_b[jax.tree_util.keystr(k)], np.float32),
            atol=1e-5, err_msg=jax.tree_util.keystr(k),
        )
