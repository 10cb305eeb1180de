"""Pallas TPU flash-attention kernel.

Replaces the reference's ``F.scaled_dot_product_attention`` hot kernel
(vtp/models/layers/attention.py:124) for the ViT trunk and pixel
decoder. VTP sequences are short (257 tokens at 256 resolution, 77 for
text) with head_dim 64 across every released size, so the kernel
processes whole (batch, head) rows per grid step with the K/V sequence
padded to the lane width and masked inside the softmax.

The einsum path in ``vtp_tpu.ops.attention`` is the parity oracle.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

_LANE = 128
_MAX_SEQ_FULL = 2048  # beyond this, fall back to XLA attention for now


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def flash_supported(q, k, v, *, is_causal: bool = False) -> bool:
    if is_causal:
        return False  # causal path (text tower) uses the XLA fallback today
    if q.ndim != 4 or q.shape != k.shape or k.shape != v.shape:
        return False
    if q.dtype != jnp.bfloat16:
        # fp32 attention (decoder parity mode) stays on the XLA path,
        # which honors jax.default_matmul_precision('float32'); Mosaic
        # only lowers DEFAULT/HIGHEST dot precisions.
        return False
    n = q.shape[2]
    return 2 <= n <= _MAX_SEQ_FULL and q.shape[3] in (32, 64, 128)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, n_valid: int, scale: float):
    from jax.experimental import pallas as pl  # noqa: F401

    q = q_ref[0].astype(jnp.float32)  # (Np, d)
    k = k_ref[0].astype(jnp.float32)  # (Np, d)
    v = v_ref[0]  # (Np, d) in value dtype

    scores = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    ) * scale  # (Np, Np)

    n_pad = scores.shape[-1]
    if n_pad != n_valid:
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col < n_valid, scores, -jnp.inf)

    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    probs = (p / denom).astype(v.dtype)

    out = jax.lax.dot_general(
        probs, v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("is_causal",))
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array, *, is_causal: bool = False) -> jax.Array:
    """Non-causal flash attention over ``(B, H, N, d)``.

    Numerics match torch SDPA / the einsum reference: fp32 QK^T
    accumulation, fp32 softmax, probabilities cast to the value dtype
    for the PV matmul, fp32 PV accumulation, output in q's dtype.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert not is_causal
    B, H, N, d = q.shape
    scale = d**-0.5

    sublane = 16 if q.dtype == jnp.bfloat16 else 8
    n_pad = max(_round_up(N, _LANE), _LANE)
    pad = n_pad - N
    if pad:
        padding = [(0, 0), (0, 0), (0, pad), (0, 0)]
        q = jnp.pad(q, padding)
        k = jnp.pad(k, padding)
        v = jnp.pad(v, padding)

    qf = q.reshape(B * H, n_pad, d)
    kf = k.reshape(B * H, n_pad, d)
    vf = v.reshape(B * H, n_pad, d)

    kernel = functools.partial(_attn_kernel, n_valid=N, scale=scale)
    spec = pl.BlockSpec((1, n_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(B * H,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B * H, n_pad, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * (B * H) * n_pad * n_pad * d,
            bytes_accessed=4 * (B * H) * n_pad * d * q.dtype.itemsize,
            transcendentals=(B * H) * n_pad * n_pad,
        ),
    )(qf, kf, vf)

    out = out.reshape(B, H, n_pad, d)
    return out[:, :, :N, :] if pad else out
