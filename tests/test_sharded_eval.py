"""Data-parallel eval paths on the 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vtp_tpu.config import VTPConfig
from vtp_tpu.models.vtp_model import VTPModel, init_vtp_params
from vtp_tpu.parallel import batch_sharding, make_mesh, shard_params

TINY = VTPConfig(
    image_size=32, vision_patch_size=16, vision_embed_dim=64, vision_depth=2,
    vision_num_heads=2, vision_feature_bottleneck=16, text_context_length=8,
    text_vocab_size=64, text_embed_dim=64, text_num_heads=2, text_depth=2,
    decoder_embed_dim=64, decoder_num_heads=2, decoder_depth=2,
)


def test_zero_shot_eval_sharded(rng):
    assert len(jax.devices()) == 8
    mesh = make_mesh(8, 1)
    params = init_vtp_params(jax.random.key(0), TINY)
    params = shard_params(params, mesh)

    from vtp_tpu.eval.zero_shot import evaluate_zero_shot

    classifier = jnp.asarray(rng.standard_normal((64, 10)), jnp.float32)
    batches = [
        (rng.standard_normal((16, 3, 32, 32)).astype(np.float32),
         rng.integers(0, 10, 16))
        for _ in range(3)
    ]
    top1, top5 = evaluate_zero_shot(
        params, TINY, classifier, batches,
        compute_dtype=None, sharding=batch_sharding(mesh),
    )
    assert 0.0 <= top1 <= top5 <= 100.0

    # sharded result == single-device result
    t1, t5 = evaluate_zero_shot(params, TINY, classifier, batches, compute_dtype=None)
    assert abs(top1 - t1) < 1e-6 and abs(top5 - t5) < 1e-6


def test_roundtrip_sharded_matches_replicated(rng):
    mesh = make_mesh(8, 1)
    params = init_vtp_params(jax.random.key(0), TINY)
    model = VTPModel(TINY, params, encode_dtype=None)
    x = rng.standard_normal((16, 3, 32, 32)).astype(np.float32)

    plain = np.asarray(model.get_reconstruction_latents(jnp.asarray(x)))

    sharded_params = shard_params(params, mesh)
    xs = jax.device_put(jnp.asarray(x), batch_sharding(mesh))
    model_s = VTPModel(TINY, sharded_params, encode_dtype=None)
    sharded = np.asarray(model_s.get_reconstruction_latents(xs))
    np.testing.assert_allclose(sharded, plain, atol=1e-5)
