"""Ring attention (ops/ring_attention.py): online-softmax K/V rotation
over a seq-sharded mesh must equal full SDPA, forward and backward."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from vtp_tpu.models.blocks import sdpa_bnhd
from vtp_tpu.ops.ring_attention import ring_attention


def _mesh(n=8):
    return Mesh(np.asarray(jax.devices()[:n]), ("seq",))


def _qkv(b=2, n=32, h=2, d=8, dtype=jnp.float32):
    ks = jax.random.split(jax.random.key(0), 3)
    return tuple(
        jax.random.normal(k, (b, n, h, d), dtype) for k in ks
    )


def test_ring_attention_matches_sdpa():
    mesh = _mesh()
    q, k, v = _qkv()
    out = ring_attention(q, k, v, mesh=mesh)
    ref = sdpa_bnhd(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_ring_attention_bf16():
    mesh = _mesh()
    q, k, v = _qkv(dtype=jnp.bfloat16)
    out = ring_attention(q, k, v, mesh=mesh)
    ref = sdpa_bnhd(q, k, v)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_ring_attention_grads_match():
    mesh = _mesh(4)
    q, k, v = _qkv(n=16)

    def loss_ring(q, k, v):
        return jnp.sum(ring_attention(q, k, v, mesh=mesh) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(sdpa_bnhd(q, k, v) ** 2)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ring, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-5
        )


def test_ring_attention_divisibility_error():
    mesh = _mesh()
    q, k, v = _qkv(n=20)  # 20 % 8 != 0
    try:
        ring_attention(q, k, v, mesh=mesh)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "divide" in str(e)
