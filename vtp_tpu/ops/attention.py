"""Scaled dot-product attention.

``sdpa`` is the einsum reference path with flash-attention numerics
(fp32 score accumulation, fp32 softmax, probabilities cast to the value
dtype for the PV matmul) — matching
``F.scaled_dot_product_attention`` semantics used throughout the
reference (attention.py:124, :169, :248).

On TPU the hot path dispatches to the Pallas flash kernel in
``vtp_tpu.ops.flash_attention`` for supported shapes; this module is the
always-correct fallback and the parity oracle for that kernel.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def sdpa_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    is_causal: bool = False,
) -> jax.Array:
    """Attention over ``(B, heads, N, head_dim)`` tensors.

    bias: optional additive mask broadcastable to ``(B, heads, Nq, Nk)``.
    """
    head_dim = q.shape[-1]
    scale = head_dim**-0.5
    scores = jnp.einsum(
        "...qd,...kd->...qk", q, k, preferred_element_type=jnp.float32
    )
    scores = scores * scale
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    if is_causal:
        nq, nk = scores.shape[-2], scores.shape[-1]
        causal = jnp.tril(jnp.ones((nq, nk), dtype=bool), k=nk - nq)
        scores = jnp.where(causal, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    probs = probs.astype(v.dtype)
    out = jnp.einsum(
        "...qk,...kd->...qd", probs, v, preferred_element_type=jnp.float32
    )
    return out.astype(q.dtype)


def sdpa(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    is_causal: bool = False,
    use_flash: Optional[bool] = None,
) -> jax.Array:
    """Dispatching SDPA: Pallas flash kernel on TPU when supported,
    einsum reference otherwise."""
    if use_flash is None:
        from vtp_tpu.ops.flash_attention import pallas_enabled

        use_flash = pallas_enabled()
    if use_flash and bias is None:
        from vtp_tpu.ops.flash_attention import flash_attention, flash_supported

        if flash_supported(q, k, v, is_causal=is_causal):
            return flash_attention(q, k, v, is_causal=is_causal)
    return sdpa_reference(q, k, v, bias=bias, is_causal=is_causal)
