"""Pipeline parallelism (parallel/pipeline.py): the GPipe-style
ppermute schedule over stage-sharded stacked blocks must reproduce the
sequential ``scan_blocks`` forward exactly, and be differentiable."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vtp_tpu.models.blocks import (
    BlockConfig,
    init_stacked_blocks,
    pack,
    scan_blocks,
    unpack,
)
from vtp_tpu.parallel.pipeline import (
    make_pipeline_mesh,
    pipeline_apply,
    pipeline_blocks,
)

CFG = BlockConfig(dim=32, num_heads=2, ffn_ratio=2.0)
DEPTH = 8


@pytest.fixture(scope="module")
def stack():
    return init_stacked_blocks(jax.random.key(0), CFG, DEPTH)


def _tokens(b=8, n=4):
    return jax.random.normal(jax.random.key(1), (b, n, CFG.dim), jnp.float32)


def test_pipeline_apply_matches_scan_linear():
    """Generic executor on a trivial per-layer body: y = x @ W_i."""
    mesh = make_pipeline_mesh(4)
    ws = jax.random.normal(jax.random.key(2), (DEPTH, 16, 16)) * 0.1
    x = jax.random.normal(jax.random.key(3), (6, 4, 16))  # (M, mB, F)

    body = lambda w, x: jnp.tanh(x @ w)
    out = pipeline_apply(body, ws, x, mesh=mesh)

    ref = x
    for i in range(DEPTH):
        ref = body(ws[i], ref)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_pipeline_blocks_matches_scan_blocks(stack):
    """Real transformer stack: pipeline over 4 stages == lax.scan."""
    mesh = make_pipeline_mesh(4)
    x = _tokens(b=8, n=4)

    (seq_out,), _ = scan_blocks((x,), stack, CFG, [None], depth=DEPTH)

    # microbatch the batch dim BEFORE packing: 2 microbatches of 4
    n_micro, b, n = 2, 8, 4
    mb = b // n_micro
    micros = []
    for m in range(n_micro):
        flat, shapes = pack([x[m * mb:(m + 1) * mb]])
        micros.append(flat)
    xs_micro = jnp.stack(micros)

    out = pipeline_blocks(
        xs_micro, stack, CFG, [None], shapes, mesh=mesh
    )
    got = jnp.concatenate(
        [unpack(out[m], shapes)[0] for m in range(n_micro)], axis=0
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(seq_out), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("remat", [False, True])
def test_pipeline_differentiable(stack, remat):
    """Gradients flow through the ppermute schedule; the bubble's
    garbage paths contribute nothing (grads match the sequential
    stack's grads)."""
    mesh = make_pipeline_mesh(4)
    x = _tokens(b=4, n=4)
    flat, shapes = pack([x])
    xs_micro = flat.reshape(2, -1, CFG.dim)  # 2 microbatches

    def loss_seq(p):
        (out,), _ = scan_blocks((x,), p, CFG, [None], depth=DEPTH)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    # per-microbatch shapes: each microbatch carries 2 samples x 4 tokens
    shapes_micro = [(2, 4)]

    def loss_pipe2(p):
        out = pipeline_blocks(
            xs_micro, p, CFG, [None], shapes_micro, mesh=mesh, remat=remat
        )
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g_pipe = jax.grad(loss_pipe2)(stack)
    g_seq = jax.grad(loss_seq)(stack)
    for a, b_ in zip(jax.tree.leaves(g_pipe), jax.tree.leaves(g_seq)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-4, atol=5e-4
        )


def test_pipeline_depth_must_divide():
    mesh = make_pipeline_mesh(4)
    ws = jnp.zeros((6, 8, 8))
    x = jnp.zeros((2, 2, 8))
    with pytest.raises(ValueError, match="divide"):
        pipeline_apply(lambda w, x: x @ w, ws, x, mesh=mesh)
