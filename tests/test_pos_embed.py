"""2D sincos pos-embed helpers vs the reference implementations
(embeddings.py:198-275)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tests.reference_loader import load_reference, reference_available

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference not mounted")

load_reference()

import torch  # noqa: E402
from vtp.models.layers.embeddings import (  # noqa: E402
    get_2d_sincos_pos_embed,
    interpolate_pos_embed as ref_interpolate,
)

from vtp_tpu.ops.pos_embed import interpolate_pos_embed, sincos_2d  # noqa: E402


@pytest.mark.parametrize("cls_token", [False, True])
def test_sincos_2d_matches_reference(cls_token):
    want = get_2d_sincos_pos_embed(32, 7, cls_token=cls_token)
    got = sincos_2d(32, 7, cls_token=cls_token)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


def test_interpolate_pos_embed_matches_torch(rng):
    d, orig, new = 16, 4, 6
    table = rng.standard_normal((1, 1 + orig * orig, d)).astype(np.float32)

    class _PE:  # the attribute shapes ref_interpolate reads
        pass

    model = _PE()
    model.patch_embed = _PE()
    model.patch_embed.num_patches = new * new
    model.pos_embed = torch.zeros((1, 1 + new * new, d))
    ckpt = {"pos_embed": torch.from_numpy(table)}
    ref_interpolate(model, ckpt)
    want = ckpt["pos_embed"].numpy()

    got = interpolate_pos_embed(jnp.asarray(table), new, num_extra_tokens=1)
    # jax.image bicubic vs torch bicubic differ slightly at boundaries
    np.testing.assert_allclose(np.asarray(got), want, atol=0.35, rtol=0.1)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got[:, 0]), want[:, 0], atol=1e-6)
