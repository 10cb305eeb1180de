"""Normalization ops with the reference's exact mixed-precision semantics.

Behavioral reference: ``vtp/models/layers/normalization.py``.

All statistics are computed in fp32 regardless of input dtype (the TPU
VPU is fp32 anyway); what differs between variants is the dtype of the
returned value, which the reference uses deliberately:

  * ``rms_norm``: normalized value is rounded to the *input* dtype, then
    multiplied by the fp32 weight — under bf16 compute the result
    promotes to fp32 exactly like torch (normalization.py:20-22).
  * ``layer_norm``: computed in fp32, result cast back to the input
    dtype (normalization.py:25-40 covers both LayerNorm subclasses; the
    plain fp32 path is the identity cast).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-5) -> jax.Array:
    xf = x.astype(jnp.float32)
    normed = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    # Round to input dtype first (torch `.type_as(x)`), then scale by the
    # fp32 weight — dtype promotion matches torch exactly.
    return normed.astype(x.dtype) * weight


def layer_norm(
    x: jax.Array,
    weight: jax.Array,
    bias: Optional[jax.Array],
    eps: float = 1e-5,
    *,
    restore_dtype: bool = True,
) -> jax.Array:
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    centered = xf - mean
    var = jnp.mean(centered * centered, axis=-1, keepdims=True)
    out = centered * jax.lax.rsqrt(var + eps)
    out = out * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(orig_dtype) if restore_dtype else out


def apply_norm(x: jax.Array, params: dict, kind: str, eps: float) -> jax.Array:
    """Dispatch on the reference's norm-layer registry names
    (vision_transformer.py:30-34): layernorm / layernormbf16 / rmsnorm."""
    if kind == "rmsnorm":
        return rms_norm(x, params["scale"], eps)
    return layer_norm(x, params["scale"], params.get("bias"), eps)


def norm_eps(kind: str) -> float:
    """Epsilons from the reference registry (vision_transformer.py:30-34);
    the text tower's LayerNorm uses the torch default 1e-5."""
    return {"layernorm": 1e-6, "layernormbf16": 1e-5, "rmsnorm": 1e-5}[kind]
