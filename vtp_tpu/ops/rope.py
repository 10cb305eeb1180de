"""Axial 2D rotary position embeddings (RoPE), DINOv3 convention.

Behavioral reference: ``vtp/models/layers/embeddings.py:86-195`` (tables)
and ``vtp/models/layers/attention.py:12-23,70-89`` (application).

Layout: for head dim ``Dh`` there are ``P = Dh // 4`` periods. Per token
the angle vector is ``[h*p0..h*pP, w*p0..w*pP]`` tiled twice to length
``Dh``; rotation uses the rotate-half convention
(``x -> [-x2, x1]`` where ``x = [x1, x2]`` split at Dh/2).

TPU notes: tables are computed once per (H, W) per forward — the
reference recomputes them per block. ``sin``/``cos`` live in the rope
dtype (bf16 for released checkpoints); q/k are rotated in that dtype and
cast back, matching the reference exactly.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def rope_periods_init(
    head_dim: int,
    base: Optional[float] = 100.0,
    min_period: Optional[float] = None,
    max_period: Optional[float] = None,
    dtype: jnp.dtype = jnp.bfloat16,
) -> jax.Array:
    """Period table of shape ``(head_dim // 4,)``.

    Mirrors ``RopePositionEmbedding._init_weights`` (embeddings.py:182-195).
    This is a *persistent buffer* in reference checkpoints — the converter
    overwrites it with the checkpoint value.
    """
    quarter = head_dim // 4
    if base is not None:
        idx = jnp.arange(quarter, dtype=jnp.float32)
        periods = jnp.asarray(base, jnp.float32) ** (2.0 * idx / (head_dim // 2))
    else:
        if min_period is None or max_period is None:
            raise ValueError("Either base or min_period+max_period required")
        ratio = max_period / min_period
        exponents = jnp.linspace(0.0, 1.0, quarter, dtype=jnp.float32)
        periods = (ratio**exponents) / ratio * max_period
    return periods.astype(dtype)


def _normalized_coords(n: int, denom: int, dtype: jnp.dtype) -> jax.Array:
    # torch.arange(0.5, n, dtype=d) / denom computed at rope precision.
    c = (jnp.arange(n, dtype=jnp.float32) + 0.5).astype(dtype)
    return c / denom


def rope_sincos(
    periods: jax.Array,
    H: int,
    W: int,
    *,
    normalize_coords: str = "separate",
    shift_coords: Optional[float] = None,
    jitter_coords: Optional[float] = None,
    rescale_coords: Optional[float] = None,
    key: Optional[jax.Array] = None,
    training: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Build ``(sin, cos)`` tables of shape ``(H*W, head_dim)``.

    The train-time shift/jitter/rescale coordinate augmentations
    (embeddings.py:155-171) are applied only when ``training`` and a PRNG
    ``key`` is given.
    """
    dtype = periods.dtype
    if normalize_coords == "max":
        d = max(H, W)
        ch, cw = _normalized_coords(H, d, dtype), _normalized_coords(W, d, dtype)
    elif normalize_coords == "min":
        d = min(H, W)
        ch, cw = _normalized_coords(H, d, dtype), _normalized_coords(W, d, dtype)
    elif normalize_coords == "separate":
        ch, cw = _normalized_coords(H, H, dtype), _normalized_coords(W, W, dtype)
    else:
        raise ValueError(f"Unknown normalize_coords: {normalize_coords}")

    grid_h, grid_w = jnp.meshgrid(ch, cw, indexing="ij")
    coords = jnp.stack([grid_h, grid_w], axis=-1).reshape(H * W, 2)
    coords = 2.0 * coords - 1.0  # [0,1] -> [-1,1]

    if training and key is not None:
        k_shift, k_jitter, k_rescale = jax.random.split(key, 3)
        if shift_coords is not None:
            shift = jax.random.uniform(
                k_shift, (2,), dtype=jnp.float32,
                minval=-shift_coords, maxval=shift_coords,
            ).astype(dtype)
            coords = coords + shift[None, :]
        if jitter_coords is not None:
            jmax = math.log(jitter_coords)
            jitter = jnp.exp(
                jax.random.uniform(k_jitter, (2,), dtype=jnp.float32, minval=-jmax, maxval=jmax)
            ).astype(dtype)
            coords = coords * jitter[None, :]
        if rescale_coords is not None:
            rmax = math.log(rescale_coords)
            rescale = jnp.exp(
                jax.random.uniform(k_rescale, (1,), dtype=jnp.float32, minval=-rmax, maxval=rmax)
            ).astype(dtype)
            coords = coords * rescale

    # (HW, 2, P) -> (HW, 2P) -> tile -> (HW, 4P = head_dim)
    # Match torch's rounding exactly: each op computes in fp32 with the
    # *full-precision* 2*pi scalar and rounds to the rope dtype, rather
    # than pre-rounding the scalar to bf16 (JAX weak-type default).
    angles = (coords[:, :, None].astype(jnp.float32) * (2.0 * math.pi)).astype(dtype)
    angles = (
        angles.astype(jnp.float32) / periods[None, None, :].astype(jnp.float32)
    ).astype(dtype)
    angles = angles.reshape(H * W, -1)
    angles = jnp.tile(angles, (1, 2))
    sin = jnp.sin(angles.astype(jnp.float32)).astype(dtype)
    cos = jnp.cos(angles.astype(jnp.float32)).astype(dtype)
    return sin, cos


def rope_rotate_half(x: jax.Array) -> jax.Array:
    """``[x1, x2] -> [-x2, x1]`` split at the midpoint of the last dim."""
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def rope_apply(x: jax.Array, sin: jax.Array, cos: jax.Array) -> jax.Array:
    return x * cos + rope_rotate_half(x) * sin


def pad_rope_prefix(sin: jax.Array, cos: jax.Array, prefix: int) -> Tuple[jax.Array, jax.Array]:
    """Extend (HW, D) tables to (prefix+HW, D) with identity rotation
    (sin=0, cos=1) for the cls/storage prefix. Numerically identical to
    slicing the prefix around the rotation (x*1 + rot(x)*0 = x) but lets
    the per-layer application be a single fused elementwise op instead
    of slice+rotate+concat copies of the full activation tensor."""
    if prefix == 0:
        return sin, cos
    zeros = jnp.zeros((prefix, sin.shape[-1]), sin.dtype)
    ones = jnp.ones((prefix, cos.shape[-1]), cos.dtype)
    return jnp.concatenate([zeros, sin]), jnp.concatenate([ones, cos])


def apply_rope_with_prefix(
    q: jax.Array,
    k: jax.Array,
    sin: jax.Array,
    cos: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Rotate the trailing ``HW`` tokens of q/k, leaving a prefix
    (cls + storage tokens) unrotated.

    q, k: ``(B, heads, N, head_dim)``; sin/cos: ``(HW, head_dim)`` with
    ``HW <= N``. Computation happens in the rope dtype and is cast back,
    mirroring ``SelfAttention.apply_rope`` (attention.py:70-89).
    """
    q_dtype, k_dtype = q.dtype, k.dtype
    rope_dtype = sin.dtype
    n = q.shape[-2]
    prefix = n - sin.shape[-2]
    if prefix < 0:
        raise ValueError(f"rope table longer than sequence: {sin.shape[-2]} > {n}")
    qr = q.astype(rope_dtype)
    kr = k.astype(rope_dtype)
    if prefix == 0:
        q_out = rope_apply(qr, sin, cos)
        k_out = rope_apply(kr, sin, cos)
    else:
        q_out = jnp.concatenate(
            [qr[..., :prefix, :], rope_apply(qr[..., prefix:, :], sin, cos)], axis=-2
        )
        k_out = jnp.concatenate(
            [kr[..., :prefix, :], rope_apply(kr[..., prefix:, :], sin, cos)], axis=-2
        )
    return q_out.astype(q_dtype), k_out.astype(k_dtype)
