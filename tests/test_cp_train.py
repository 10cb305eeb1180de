"""Context-parallel TRAINING: the full VTP train step under an ambient
(data, seq) mesh must match the single-device step. The encoder/decoder
attention rides the ring (ops/ring_attention.py — differentiable
online-softmax shard_map), everything else stays SPMD; parameters are
replicated so GSPMD inserts the gradient psum.

Reference: the torch reference trains DDP-only (SURVEY §2.8); CP is a
beyond-reference scaling axis, so parity is against our own no-mesh
step, not torch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vtp_tpu.config import VTPConfig
from vtp_tpu.parallel.mesh import make_cp_mesh
from vtp_tpu.train.step import TrainConfig, build_train_step, init_state

TINY = VTPConfig(
    image_size=32,
    vision_patch_size=16,
    vision_embed_dim=64,
    vision_depth=2,
    vision_num_heads=2,
    vision_feature_bottleneck=16,
    text_context_length=8,
    text_vocab_size=128,
    text_embed_dim=64,
    text_num_heads=2,
    text_depth=2,
    decoder_embed_dim=64,
    decoder_num_heads=2,
    decoder_depth=2,
)

TTINY = TrainConfig(
    train_ssl=False,
    dino_out_dim=64,
    learning_rate=1e-2,
    warmup_steps=0,
    total_steps=10,
    compute_dtype=None,  # fp32 for tight cross-sharding comparison
    remat=False,
)


def _batch(b=8):
    k1, k2 = jax.random.split(jax.random.key(1))
    return {
        "image": jax.random.normal(k1, (b, 3, 32, 32)),
        "text": jax.random.randint(k2, (b, 8), 1, 127),
        "rec_image": jax.random.normal(k1, (b, 3, 32, 32)),
    }


def test_train_step_under_cp_mesh(kernels):
    # pad N=5 -> 8 so the token dim divides the seq axis; the ring's
    # n_valid mask covers the padded key columns
    kernels(force_token_pad=True)
    batch = _batch()
    step = build_train_step(TINY, TTINY)

    state0 = init_state(jax.random.key(0), TINY, TTINY)
    out_r, metrics_r = jax.jit(step)(state0, batch, jax.random.key(3))

    mesh = make_cp_mesh(4, 2)  # batch 8 over data=2, tokens over seq=4
    with jax.set_mesh(mesh):
        cp_step = jax.jit(step)
        hlo = cp_step.lower(state0, batch, jax.random.key(3)).compile().as_text()
        out_c, metrics_c = cp_step(state0, batch, jax.random.key(3))

    assert "collective-permute" in hlo, "ring attention did not engage"
    np.testing.assert_allclose(
        float(metrics_c["loss/total"]), float(metrics_r["loss/total"]),
        rtol=1e-5,
    )
    pr = jax.device_get(out_r["params"])
    pc = jax.device_get(out_c["params"])
    # same rationale as test_fsdp_step_matches_replicated: Adam's
    # 1/sqrt(v) amplifies fp32 reduction-order drift where grads ~ 0;
    # atol 1e-3 = 10% of one lr=1e-2 update still catches any wrong or
    # missing collective (those diverge by O(update))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-3, rtol=5e-3),
        pr, pc,
    )
