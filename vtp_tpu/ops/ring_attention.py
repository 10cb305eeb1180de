"""Ring attention: context parallelism for the attention op itself.

DP/TP/FSDP/SP/PP live in ``parallel/``; this op covers the remaining
scaling axis — the TOKEN dim of attention. For resolution scaling
(1024px images at patch 16 are 4096 tokens; the reference caps at what
one GPU holds) the (N, N) score matrix and the KV stream outgrow one
chip. Ring attention (Liu et al. 2023, arXiv:2310.01889) shards Q/K/V
over a ``seq`` mesh axis and rotates the K/V shards around the ring
with ``jax.lax.ppermute`` while accumulating the softmax online —
each chip ever holds 1/S of the tokens and an (N/S, N/S) score block,
and the rotation overlaps with compute on ICI.

Pure-JAX online-softmax accumulation (the flash-attention recurrence),
so it is differentiable end-to-end and XLA fuses the rescale chain;
the per-block math runs on the MXU via einsum. The Pallas flash kernel
stays the single-chip fast path (ops/flash_attention.py) — this op is
the beyond-single-chip escape hatch, dispatched explicitly.

Reference behavior matched: ``F.scaled_dot_product_attention``
(vtp/models/layers/attention.py:124) — full bidirectional attention,
fp32 softmax accumulation, same scale convention.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

SEQ_AXIS = "seq"


def _ring_attention_local(
    q: jax.Array, k: jax.Array, v: jax.Array, *, axis: str, scale: float
) -> jax.Array:
    """Per-device body (inside shard_map): q/k/v are (B, Nl, H, D)
    token shards; K/V rotate S times around the ring."""
    n_dev = jax.lax.axis_size(axis)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    B, Nl, H, D = q.shape
    qf = q.astype(jnp.float32)

    def step(carry, _):
        acc, m, l, k_blk, v_blk = carry
        # (B, Nl_q, H, Nl_kv) score block on the MXU
        s = jnp.einsum(
            "bqhd,bkhd->bqhk", qf, k_blk.astype(jnp.float32)
        ) * scale
        m_new = jnp.maximum(m, s.max(axis=-1))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new[..., None])
        l = l * alpha + p.sum(axis=-1)
        acc = acc * alpha[..., None] + jnp.einsum(
            "bqhk,bkhd->bqhd", p, v_blk.astype(jnp.float32)
        )
        # rotate the K/V shard to the next ring neighbour
        k_blk = jax.lax.ppermute(k_blk, axis, perm)
        v_blk = jax.lax.ppermute(v_blk, axis, perm)
        return (acc, m_new, l, k_blk, v_blk), None

    acc0 = jnp.zeros((B, Nl, H, D), jnp.float32)
    m0 = jnp.full((B, Nl, H), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((B, Nl, H), jnp.float32)
    (acc, m, l, _, _), _ = jax.lax.scan(
        step, (acc0, m0, l0, k, v), None, length=n_dev
    )
    return (acc / l[..., None]).astype(q.dtype)


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    mesh: Mesh,
    axis: str = SEQ_AXIS,
    scale: Optional[float] = None,
) -> jax.Array:
    """Bidirectional SDPA with the token dim sharded over ``axis``.

    Args:
      q, k, v: ``(B, N, H, D)`` — the repo's canonical attention layout
        (models/blocks.sdpa_bnhd). ``N`` must divide by the ``axis``
        size; each device holds an ``N/S`` token shard and the score
        matrix never materializes beyond ``(N/S, N/S)`` per chip.
      mesh: mesh containing ``axis``.
      scale: defaults to ``D ** -0.5``.

    Returns ``(B, N, H, D)``, numerically the full-attention result
    (online-softmax accumulation in fp32).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    n_dev = dict(mesh.shape)[axis]
    if q.shape[1] % n_dev:
        raise ValueError(f"N={q.shape[1]} must divide by {n_dev} ({axis})")

    body = partial(_ring_attention_local, axis=axis, scale=scale)
    spec = P(None, axis, None, None)
    sharded = jax.shard_map(
        body, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )
    return jax.jit(sharded)(q, k, v)
