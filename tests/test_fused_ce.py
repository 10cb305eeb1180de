"""Fused DINO/iBOT CE kernel (ops/fused_ce.py) vs the XLA reference
formula, in Pallas interpret mode on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vtp_tpu.ops.fused_ce import (
    BLOCK_C,
    fused_ce_rows,
    fused_ce_rows_auto,
    fused_ce_supported,
)


@pytest.fixture(autouse=True)
def _interpret(kernels):
    # interpret-mode Pallas on CPU, scoped to this module only
    kernels(interpret=True)


@pytest.fixture()
def data():
    R, C = 16, 2 * BLOCK_C
    t = jax.random.normal(jax.random.key(0), (R, C), jnp.float32) * 3
    s = jax.random.normal(jax.random.key(1), (R, C), jnp.float32) * 3
    center = jax.random.normal(jax.random.key(2), (C,)) * 0.5
    return t, s, center


def _ref_rows(t, s, center, t_temp, s_temp):
    pt = jax.nn.softmax((t - center[None]) / t_temp, axis=-1)
    ls = jax.nn.log_softmax(s / s_temp, axis=-1)
    return -jnp.sum(pt * ls, axis=-1)


def test_forward_matches_reference(data):
    t, s, center = data
    assert fused_ce_supported(t, s)
    got = fused_ce_rows(t, s, center, 0.07, 0.1)
    want = _ref_rows(t, s, center, 0.07, 0.1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_backward_matches_reference(data):
    t, s, center = data
    w = jnp.linspace(0.0, 1.0, t.shape[0])  # arbitrary row weights
    g0 = jax.grad(lambda ss: (_ref_rows(t, ss, center, 0.07, 0.1) * w).sum())(s)
    g1 = jax.grad(lambda ss: (fused_ce_rows(t, ss, center, 0.07, 0.1) * w).sum())(s)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-4, atol=1e-6)


def test_teacher_and_center_get_zero_grads(data):
    t, s, center = data
    gt = jax.grad(lambda tt: fused_ce_rows(tt, s, center, 0.07, 0.1).sum())(t)
    gc = jax.grad(lambda cc: fused_ce_rows(t, s, cc, 0.07, 0.1).sum())(center)
    assert float(jnp.abs(gt).max()) == 0.0
    assert float(jnp.abs(gc).max()) == 0.0


def test_nondivisible_rows_use_halved_block(data):
    # R = 24 is % 8 but not a divisor-friendly power-of-two multiple of
    # BLOCK_R; the forward must halve its row block (like the backward)
    # instead of loading all rows as one VMEM block.
    t, s, center = data
    t, s = t[:8], s[:8]
    t = jnp.concatenate([t, t, t], axis=0)  # R = 24
    s = jnp.concatenate([s, s, s], axis=0)
    assert fused_ce_supported(t, s)
    got = fused_ce_rows(t, s, center, 0.07, 0.1)
    want = _ref_rows(t, s, center, 0.07, 0.1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_sharded_mesh_runs_kernel_per_shard(data):
    """Under a multi-device data mesh the kernel must run inside
    shard_map over rows (pallas_call has no SPMD rule — without this the
    full (R, C) logits replicate on every device; ADVICE r2)."""
    from vtp_tpu.parallel.mesh import DATA_AXIS

    _, _, center = data
    R, C = 64, 2 * BLOCK_C  # 8 rows per shard (>= kernel row alignment)
    t = jax.random.normal(jax.random.key(3), (R, C), jnp.float32) * 3
    s = jax.random.normal(jax.random.key(4), (R, C), jnp.float32) * 3
    n = jax.device_count()
    assert n >= 8, "conftest forces 8 virtual CPU devices"
    mesh = jax.make_mesh((8,), (DATA_AXIS,))
    want = _ref_rows(t, s, center, 0.07, 0.1)
    w = jnp.linspace(0.0, 1.0, t.shape[0])
    g_want = jax.grad(lambda ss: (_ref_rows(t, ss, center, 0.07, 0.1) * w).sum())(s)

    with jax.set_mesh(mesh):
        assert fused_ce_supported(t, s)
        got = jax.jit(
            lambda t_, s_, c_: fused_ce_rows_auto(t_, s_, c_, 0.07, 0.1)
        )(t, s, center)
        g_got = jax.jit(
            jax.grad(lambda ss: (fused_ce_rows_auto(t, ss, center, 0.07, 0.1) * w).sum())
        )(s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want), rtol=1e-4, atol=1e-6)


def test_unshardable_rows_fall_back(data):
    """R that can't split 8-aligned across the data axis must report
    unsupported (XLA path shards fine; kernel would replicate)."""
    from vtp_tpu.parallel.mesh import DATA_AXIS

    t, s, center = data  # R = 16 -> 2 rows/shard, not % 8
    mesh = jax.make_mesh((8,), (DATA_AXIS,))
    with jax.set_mesh(mesh):
        assert not fused_ce_supported(t[:16], s[:16])


def test_bf16_inputs(data):
    t, s, center = data
    got = fused_ce_rows(t.astype(jnp.bfloat16), s.astype(jnp.bfloat16),
                        center, 0.07, 0.1)
    want = _ref_rows(t.astype(jnp.bfloat16).astype(jnp.float32),
                     s.astype(jnp.bfloat16).astype(jnp.float32),
                     center, 0.07, 0.1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=1e-3)
