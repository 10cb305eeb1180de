"""Pallas attention kernels under a multi-device data mesh.

``pallas_call`` has no SPMD partitioning rule, so under a mesh the
kernels must run inside ``jax.shard_map`` over the data (batch) axis
(ops/flash_attention.py) — otherwise GSPMD replicates the full batch
into every device's kernel, silently multiplying the attention work by
the device count. The reference's SDPA composes with DDP for free
(vtp/models/layers/attention.py:124); this is our equivalent contract.

Runs in Pallas interpret mode on the 8-virtual-CPU-device mesh
(conftest), mirroring tests/test_fused_ce.py's sharded coverage.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vtp_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


@pytest.fixture(autouse=True)
def _interpret(kernels):
    kernels(interpret=True)


@pytest.fixture()
def mesh():
    assert jax.device_count() >= 8, "conftest forces 8 virtual CPU devices"
    return jax.make_mesh((8,), (DATA_AXIS,))


def _mk(rng, B=16, N=16, H=2, d=32, dtype=jnp.bfloat16, rope=True):
    qkv = jnp.asarray(rng.standard_normal((B, N, 3 * H * d)), dtype)
    sin_t = jnp.asarray(rng.standard_normal((N, d)) * 0.5, jnp.bfloat16) if rope else None
    cos_t = jnp.asarray(rng.standard_normal((N, d)) * 0.5, jnp.bfloat16) if rope else None
    return qkv, sin_t, cos_t


def test_sharded_forward_matches_unsharded(rng, mesh):
    """Kernel forward under the 8-way data mesh == the same kernel
    single-device (bit-comparable: identical per-row math)."""
    from vtp_tpu.ops.flash_attention import (
        fused_attention_supported,
        fused_qkv_rope_attention,
    )

    qkv, sin_t, cos_t = _mk(rng)
    H = 2
    want = fused_qkv_rope_attention(qkv, sin_t, cos_t, H)  # no mesh

    with jax.set_mesh(mesh):
        assert fused_attention_supported(qkv.shape, qkv.dtype, H)
        got = jax.jit(
            lambda x: fused_qkv_rope_attention(x, sin_t, cos_t, H)
        )(qkv)
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(want, np.float32)
    )


def test_sharded_backward_matches_unsharded(rng, mesh):
    """d(qkv) through the dedicated backward kernel under the mesh ==
    single-device (per-batch-row math; cross-shard reduction only in
    the caller's loss sum)."""
    from vtp_tpu.ops.flash_attention import fused_qkv_rope_attention

    qkv, sin_t, cos_t = _mk(rng)
    H = 2

    def loss(x):
        o = fused_qkv_rope_attention(x, sin_t, cos_t, H)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    want = jax.grad(loss)(qkv)
    with jax.set_mesh(mesh):
        got = jax.jit(jax.grad(loss))(qkv)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=1e-6, rtol=1e-6,
    )


def test_sharded_qk_norm_scale_grads(rng, mesh):
    """The qk-norm arm's scale grads reduce over the (sharded) batch —
    the .sum(0) over the per-batch dws rows must cross shards."""
    from vtp_tpu.ops.flash_attention import fused_qkv_rope_attention

    qkv, sin_t, cos_t = _mk(rng)
    H, d = 2, 32
    qs = jnp.asarray(rng.standard_normal(d).astype(np.float32) * 0.1 + 1.0)
    ks = jnp.asarray(rng.standard_normal(d).astype(np.float32) * 0.1 + 1.0)

    def loss(x, wq, wk):
        o = fused_qkv_rope_attention(x, sin_t, cos_t, H, q_scale=wq, k_scale=wk)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    want = jax.grad(loss, argnums=(0, 1, 2))(qkv, qs, ks)
    with jax.set_mesh(mesh):
        got = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(qkv, qs, ks)
    for g, w, name in zip(got, want, ("d_qkv", "dwq", "dwk")):
        np.testing.assert_allclose(
            np.asarray(g, np.float32), np.asarray(w, np.float32),
            atol=1e-4, rtol=1e-4, err_msg=name,
        )


def test_sharded_causal_text_arm(rng, mesh):
    """The text tower's causal arm under the mesh vs single-device."""
    from vtp_tpu.ops.flash_attention import fused_qkv_rope_attention

    qkv, _, _ = _mk(rng, B=8, N=8, rope=False)
    H = 2
    want = fused_qkv_rope_attention(qkv, None, None, H, is_causal=True)
    with jax.set_mesh(mesh):
        got = jax.jit(
            lambda x: fused_qkv_rope_attention(x, None, None, H, is_causal=True)
        )(qkv)
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(want, np.float32)
    )


def test_sharded_bnhd(rng, mesh):
    """flash_attention_bnhd under the mesh vs the einsum oracle."""
    from vtp_tpu.ops.attention import sdpa_reference
    from vtp_tpu.ops.flash_attention import (
        flash_attention_bnhd,
        flash_supported_bnhd,
    )

    B, N, H, d = 8, 16, 2, 32
    q = jnp.asarray(rng.standard_normal((B, N, H, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, N, H, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, N, H, d)), jnp.bfloat16)
    want = sdpa_reference(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3)
    ).transpose(0, 2, 1, 3)
    with jax.set_mesh(mesh):
        assert flash_supported_bnhd(q, k, v)
        got = jax.jit(flash_attention_bnhd)(q, k, v)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_unsupported_layouts_fall_back(rng, mesh):
    """Batch not divisible by the data axis, or a tensor-parallel model
    axis, must report unsupported (the XLA path shards correctly)."""
    from vtp_tpu.ops.flash_attention import (
        flash_supported_bnhd,
        fused_attention_supported,
    )

    with jax.set_mesh(mesh):
        # B=12 does not split 8 ways
        assert not fused_attention_supported((12, 16, 3 * 64), jnp.bfloat16, 2)
        q = jnp.zeros((12, 16, 2, 32), jnp.bfloat16)
        assert not flash_supported_bnhd(q, q, q)

    tp_mesh = jax.make_mesh((4, 2), (DATA_AXIS, MODEL_AXIS))
    with jax.set_mesh(tp_mesh):
        assert not fused_attention_supported((16, 16, 3 * 64), jnp.bfloat16, 2)


def test_tp_head_sharded_bnhd(rng):
    """Under a (data, model) mesh the bnhd kernel engages with heads
    sharded over ``model`` (round 5 — previously any model axis > 1
    forced the XLA fallback, a measured 47% step cost, PERF.md r5)."""
    from vtp_tpu.ops.attention import sdpa_reference
    from vtp_tpu.ops.flash_attention import (
        flash_attention_bnhd,
        flash_supported_bnhd,
    )

    B, N, H, d = 8, 16, 4, 32
    q = jnp.asarray(rng.standard_normal((B, N, H, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, N, H, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, N, H, d)), jnp.bfloat16)
    want = sdpa_reference(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3)
    ).transpose(0, 2, 1, 3)
    tp_mesh = jax.make_mesh((4, 2), (DATA_AXIS, MODEL_AXIS))
    with jax.set_mesh(tp_mesh):
        assert flash_supported_bnhd(q, k, v)
        got = jax.jit(flash_attention_bnhd)(q, k, v)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2,
    )
    # heads not divisible by the model axis -> XLA fallback
    q3 = jnp.zeros((8, 16, 3, 32), jnp.bfloat16)
    with jax.set_mesh(tp_mesh):
        assert not flash_supported_bnhd(q3, q3, q3)


def test_tp_head_sharded_bhnd(rng):
    """The (B, H, N, d) flash_attention entry under a model mesh."""
    from vtp_tpu.ops.attention import sdpa_reference
    from vtp_tpu.ops.flash_attention import flash_attention, flash_supported

    B, H, N, d = 8, 4, 16, 32
    q = jnp.asarray(rng.standard_normal((B, H, N, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, N, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, N, d)), jnp.bfloat16)
    want = sdpa_reference(q, k, v)
    tp_mesh = jax.make_mesh((4, 2), (DATA_AXIS, MODEL_AXIS))
    with jax.set_mesh(tp_mesh):
        assert flash_supported(q, k, v)
        got = jax.jit(flash_attention)(q, k, v)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_bnhd_recompute_vjp(rng, mesh):
    """flash_attention_bnhd is differentiable via its recompute VJP
    (backward = grad of the XLA einsum attention), single-device and
    under a data mesh."""
    from vtp_tpu.ops.flash_attention import _sdpa_bnhd_xla, flash_attention_bnhd

    B, N, H, d = 8, 16, 2, 32
    q = jnp.asarray(rng.standard_normal((B, N, H, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, N, H, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, N, H, d)), jnp.bfloat16)

    def loss(fn):
        return lambda q, k, v: jnp.sum(fn(q, k, v).astype(jnp.float32) ** 2)

    want = jax.grad(loss(_sdpa_bnhd_xla), argnums=(0, 1, 2))(q, k, v)
    got = jax.grad(loss(flash_attention_bnhd), argnums=(0, 1, 2))(q, k, v)
    with jax.set_mesh(mesh):
        got_mesh = jax.jit(
            jax.grad(loss(flash_attention_bnhd), argnums=(0, 1, 2))
        )(q, k, v)
    for g, gm, w, name in zip(got, got_mesh, want, ("dq", "dk", "dv")):
        np.testing.assert_allclose(
            np.asarray(g, np.float32), np.asarray(w, np.float32),
            atol=3e-2, rtol=3e-2, err_msg=name,
        )
        np.testing.assert_allclose(
            np.asarray(gm, np.float32), np.asarray(w, np.float32),
            atol=3e-2, rtol=3e-2, err_msg=name + " (mesh)",
        )


def test_no_allgather_in_compiled_forward(rng, mesh):
    """The sharded kernel program must contain NO all-gather: batch rows
    are independent, so a correct shard_map dispatch needs zero
    collectives in the forward (an all-gather would mean GSPMD pulled
    the global batch into each device — the exact bug this guards)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vtp_tpu.ops.flash_attention import fused_qkv_rope_attention

    qkv, sin_t, cos_t = _mk(rng)
    H = 2
    with jax.set_mesh(mesh):
        qkv_s = jax.device_put(qkv, NamedSharding(mesh, P(DATA_AXIS, None, None)))
        fn = jax.jit(lambda x: fused_qkv_rope_attention(x, sin_t, cos_t, H))
        txt = fn.lower(qkv_s).compile().as_text()
    assert "all-gather" not in txt, "batch operand was gathered before the kernel"
    assert "all-reduce" not in txt


def test_sharded_block_attention_end_to_end(rng, mesh):
    """attention_apply (the model-level dispatch) under the mesh picks
    the kernel and matches the disable_flash oracle."""
    from vtp_tpu.models.blocks import BlockConfig, attention_apply, init_block_params
    from vtp_tpu.ops.dispatch import kernel_overrides

    cfg = BlockConfig(dim=64, num_heads=2, use_qk_norm=False)
    p = init_block_params(jax.random.key(0), cfg)
    B, N = 8, 16
    x = jnp.asarray(rng.standard_normal((B, N, cfg.dim)), jnp.bfloat16)
    flat = x.reshape(-1, cfg.dim)
    shapes = [(B, N)]
    sin_t = jnp.asarray(rng.standard_normal((N, 32)) * 0.5, jnp.bfloat16)
    cos_t = jnp.asarray(rng.standard_normal((N, 32)) * 0.5, jnp.bfloat16)
    ropes = [(sin_t, cos_t)]

    with kernel_overrides(disable_flash=True):
        want = attention_apply(flat, shapes, p["attn"], cfg, ropes, jnp.bfloat16)
    with jax.set_mesh(mesh):
        got = jax.jit(
            lambda f: attention_apply(f, shapes, p["attn"], cfg, ropes, jnp.bfloat16)
        )(flat)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2,
    )
