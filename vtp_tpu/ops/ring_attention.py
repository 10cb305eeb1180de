"""Ring attention: context parallelism for the attention op itself.

DP/TP/FSDP/SP/PP live in ``parallel/``; this op covers the remaining
scaling axis — the TOKEN dim of attention. For resolution scaling
(1024px images at patch 16 are 4096 tokens; the reference caps at what
one GPU holds) the (N, N) score matrix and the KV stream outgrow one
chip. Ring attention (Liu et al. 2023, arXiv:2310.01889) shards Q/K/V
over a ``seq`` mesh axis and rotates the K/V shards around the ring
with ``jax.lax.ppermute`` while accumulating the softmax online —
each chip ever holds 1/S of the tokens: Q resident, one rotating (N/S)
KV block, an (N/S, N/S) score block, with the rotation overlapping
compute on ICI. The BACKWARD holds the same 1/S (round-5): a custom
VJP saves only the home q/k/v shards + output + per-row log-sum-exp
and runs the flash-attention adjoint as its own ppermute ring, dK/dV
accumulators traveling with their blocks (``_ring_sdpa_bwd``) — naive
autodiff of the forward scan would save all S rotated KV shards (full
K/V per chip), defeating the memory scaling CP exists for.

Pure-JAX online-softmax accumulation (the flash-attention recurrence),
so it is differentiable end-to-end and XLA fuses the rescale chain;
the per-block math runs on the MXU via einsum. The Pallas flash kernel
stays the single-chip fast path (ops/flash_attention.py) — this op is
the beyond-single-chip arm, dispatched from ``models/blocks.sdpa_bnhd``
whenever the ambient mesh (``jax.set_mesh``) carries a ``seq`` axis
(``parallel.mesh.make_cp_mesh``), so the whole encoder composes with
context parallelism through the public API.

Reference behavior matched: ``F.scaled_dot_product_attention``
(vtp/models/layers/attention.py:124) — full bidirectional attention,
fp32 softmax accumulation, same scale convention; ``n_valid`` mirrors
the token-alignment key-padding mask of ``sdpa_bnhd``.
"""

from __future__ import annotations

import functools
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from vtp_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, SEQ_AXIS, mesh_axis_size

# Finite stand-in for -inf in the online-softmax max: keeps
# exp(m - m_new) well-defined when an entire KV block is masked out
# (alpha hits exp(0)=1 while acc/l are still 0 — a no-op, not a NaN).
_NEG_BIG = -1e30


def _global_col_mask(s, t, dev, n_dev, Nl, n_valid):
    """Mask GLOBAL key columns >= n_valid: after t rotations this device
    holds the KV shard that started on device (dev - t) mod S, i.e. the
    global column offset of the resident block."""
    src = jax.lax.rem(dev - t + n_dev, n_dev)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 3) + src * Nl
    return jnp.where(col < n_valid, s, -jnp.inf)


def _ring_scan_fwd(q, k, v, *, axis, scale, n_valid):
    """Forward ring: online-softmax over S rotating KV blocks. Returns
    the normalized output AND the per-row log-sum-exp (the flash
    residual the custom backward reconstructs probabilities from)."""
    n_dev = jax.lax.axis_size(axis)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    B, Nl, H, D = q.shape
    qf = q.astype(jnp.float32)
    dev = jax.lax.axis_index(axis)

    def step(carry, t):
        acc, m, l, k_blk, v_blk = carry
        # (B, Nl_q, H, Nl_kv) score block on the MXU
        s = jnp.einsum(
            "bqhd,bkhd->bqhk", qf, k_blk.astype(jnp.float32)
        ) * scale
        if n_valid:
            s = _global_col_mask(s, t, dev, n_dev, Nl, n_valid)
        m_new = jnp.maximum(m, jnp.maximum(s.max(axis=-1), _NEG_BIG))
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
    m0 = jnp.full((B, Nl, H), _NEG_BIG, jnp.float32)
    l0 = jnp.zeros((B, Nl, H), jnp.float32)
    (acc, m, l, _, _), _ = jax.lax.scan(
        step, (acc0, m0, l0, k, v), jnp.arange(n_dev)
    )
    return (acc / l[..., None]).astype(q.dtype), m + jnp.log(l)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _ring_sdpa(axis, scale, n_valid, q, k, v):
    o, _ = _ring_scan_fwd(q, k, v, axis=axis, scale=scale, n_valid=n_valid)
    return o


def _ring_sdpa_fwd(axis, scale, n_valid, q, k, v):
    o, lse = _ring_scan_fwd(q, k, v, axis=axis, scale=scale, n_valid=n_valid)
    return o, (q, k, v, o, lse)


def _ring_sdpa_bwd(axis, scale, n_valid, res, do):
    """Backward ring (flash-attention adjoint run as its own ppermute
    ring): dK/dV accumulators travel WITH their K/V blocks, so after S
    rotations each block's gradient lands back on its home device with
    contributions from every query shard. Per-chip liveness is 1/S of
    the tokens — q/o/do/lse resident, four rotating (N/S) blocks, one
    (N/S, N/S) score block — matching the forward's scaling (the naive
    autodiff of the forward scan saved all S rotated KV shards)."""
    q, k, v, o, lse = res
    n_dev = jax.lax.axis_size(axis)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    dev = jax.lax.axis_index(axis)
    B, Nl, H, D = q.shape
    qf = q.astype(jnp.float32)
    dof = do.astype(jnp.float32)
    # delta_i = dO_i . O_i — the softmax-normalization adjoint term
    delta = jnp.sum(dof * o.astype(jnp.float32), axis=-1)  # (B, Nl, H)

    def step(carry, t):
        dq, k_blk, v_blk, dk_blk, dv_blk = carry
        kf = k_blk.astype(jnp.float32)
        s = jnp.einsum("bqhd,bkhd->bqhk", qf, kf) * scale
        if n_valid:
            s = _global_col_mask(s, t, dev, n_dev, Nl, n_valid)
        # probabilities reconstructed from the saved global lse
        p = jnp.exp(s - lse[..., None])
        dv_blk = dv_blk + jnp.einsum("bqhk,bqhd->bkhd", p, dof)
        dp = jnp.einsum("bqhd,bkhd->bqhk", dof, v_blk.astype(jnp.float32))
        ds = p * (dp - delta[..., None]) * scale
        dq = dq + jnp.einsum("bqhk,bkhd->bqhd", ds, kf)
        dk_blk = dk_blk + jnp.einsum("bqhk,bqhd->bkhd", ds, qf)
        k_blk = jax.lax.ppermute(k_blk, axis, perm)
        v_blk = jax.lax.ppermute(v_blk, axis, perm)
        dk_blk = jax.lax.ppermute(dk_blk, axis, perm)
        dv_blk = jax.lax.ppermute(dv_blk, axis, perm)
        return (dq, k_blk, v_blk, dk_blk, dv_blk), None

    dq0 = jnp.zeros((B, Nl, H, D), jnp.float32)
    z0 = jnp.zeros((B, Nl, H, D), jnp.float32)
    (dq, _, _, dk, dv), _ = jax.lax.scan(
        step, (dq0, k, v, z0, z0), jnp.arange(n_dev)
    )
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_ring_sdpa.defvjp(_ring_sdpa_fwd, _ring_sdpa_bwd)


def _ring_attention_local(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    axis: str,
    scale: float,
    n_valid: int = 0,
) -> jax.Array:
    """Per-device body (inside shard_map): q/k/v are (B, Nl, H, D)
    token shards; K/V rotate S times around the ring. ``n_valid`` masks
    GLOBAL key columns >= n_valid (token-alignment padding). Custom VJP:
    the backward runs its own KV ring (see :func:`_ring_sdpa_bwd`)."""
    return _ring_sdpa(axis, scale, n_valid, q, k, v)


def ring_supported(q: jax.Array, mesh, n_valid: int = 0) -> bool:
    """Whether (B, N, H, D) attention can ride the ring on ``mesh``:
    a ``seq`` axis > 1, token dim divisible by it, and batch divisible
    by any data axis so the outer shard_map splits cleanly. CP×TP
    composes (round-5): under a ``model`` axis > 1 the HEAD dim shards
    over it (heads are embarrassingly parallel — each (seq, model)
    shard runs the ring over its head subset), requiring
    ``H % model == 0``; the ppermute stays seq-only."""
    if mesh is None:
        return False
    n_seq = mesh_axis_size(mesh, SEQ_AXIS)
    if n_seq <= 1:
        return False
    n_model = mesh_axis_size(mesh, MODEL_AXIS)
    if n_model > 1 and q.shape[2] % n_model:
        return False
    if q.shape[1] % n_seq:
        return False
    n_data = mesh_axis_size(mesh, DATA_AXIS)
    if n_data > 1 and q.shape[0] % n_data:
        return False
    if n_valid < 0 or n_valid > q.shape[1]:
        # n_valid is a count of valid GLOBAL key columns; anything
        # outside [0, N] is a caller bug — refuse rather than mask wrong
        return False
    return True


def _cp_specs(q: jax.Array, mesh) -> P:
    """shard_map PartitionSpec for the CP arms: batch over ``data``
    (when divisible), tokens over ``seq``, heads over ``model`` (when
    the mesh carries TP — the gates require clean divisibility)."""
    n_data = mesh_axis_size(mesh, DATA_AXIS)
    b_axis = DATA_AXIS if (n_data > 1 and q.shape[0] % n_data == 0) else None
    h_axis = MODEL_AXIS if mesh_axis_size(mesh, MODEL_AXIS) > 1 else None
    return P(b_axis, SEQ_AXIS, h_axis, None)


def ring_attention_bnhd(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    mesh: Mesh,
    scale: Optional[float] = None,
    n_valid: int = 0,
) -> jax.Array:
    """Trace-context entry: shard_map (no jit wrapper — composes under
    an enclosing ``jit``) with batch over ``data`` (when present/divisible)
    and tokens over ``seq``. Callers gate on :func:`ring_supported`."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    spec = _cp_specs(q, mesh)
    body = partial(
        _ring_attention_local, axis=SEQ_AXIS, scale=scale, n_valid=n_valid
    )
    return jax.shard_map(
        body, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )(q, k, v)


def _ulysses_attention_local(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    axis: str,
    scale: float,
    n_valid: int = 0,
) -> jax.Array:
    """Per-device body (inside shard_map): Ulysses / DeepSpeed-style
    sequence parallelism (Jacobs et al. 2023, arXiv:2309.14509).

    Two all-to-alls re-shard (B, Nl, H, D) token shards into
    (B, N, H/S, D) head shards, so each device runs FULL-sequence
    attention over its head subset — one (N, N) score block per local
    head instead of S ppermute hops. Wins over the ring when the head
    dim divides the axis and N fits per chip (VTP's N <= a few
    thousand); the ring remains the unbounded-N arm."""
    n_dev = jax.lax.axis_size(axis)
    # tokens (axis 1, local Nl) gather; heads (axis 2) scatter
    q, k, v = (
        jax.lax.all_to_all(x, axis, split_axis=2, concat_axis=1, tiled=True)
        for x in (q, k, v)
    )
    s = jnp.einsum(
        "bqhd,bkhd->bqhk", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * scale
    if n_valid:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 3)
        s = jnp.where(col < n_valid, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bqhk,bkhd->bqhd", p, v.astype(jnp.float32))
    o = o.astype(q.dtype)
    # heads gather back; tokens scatter back to the seq shard
    return jax.lax.all_to_all(o, axis, split_axis=1, concat_axis=2, tiled=True)


def ulysses_supported(q: jax.Array, mesh, n_valid: int = 0) -> bool:
    """Ulysses needs everything the ring needs PLUS the PER-MODEL-SHARD
    head count divisible by the ``seq`` axis (the in-body all-to-all
    re-shards the local heads over it; under CP×TP each model shard
    already holds H/model heads)."""
    if not ring_supported(q, mesh, n_valid):
        return False
    h_local = q.shape[2] // max(mesh_axis_size(mesh, MODEL_AXIS), 1)
    return h_local % dict(mesh.shape)[SEQ_AXIS] == 0


def ulysses_attention_bnhd(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    mesh: Mesh,
    scale: Optional[float] = None,
    n_valid: int = 0,
) -> jax.Array:
    """Trace-context entry for the all-to-all CP arm; same contract as
    :func:`ring_attention_bnhd` (callers gate on
    :func:`ulysses_supported`)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    spec = _cp_specs(q, mesh)
    body = partial(
        _ulysses_attention_local, axis=SEQ_AXIS, scale=scale, n_valid=n_valid
    )
    return jax.shard_map(
        body, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )(q, k, v)


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    mesh: Mesh,
    axis: str = SEQ_AXIS,
    scale: Optional[float] = None,
    n_valid: int = 0,
) -> jax.Array:
    """Bidirectional SDPA with the token dim sharded over ``axis``.

    Args:
      q, k, v: ``(B, N, H, D)`` — the repo's canonical attention layout
        (models/blocks.sdpa_bnhd). ``N`` must divide by the ``axis``
        size; each device holds an ``N/S`` token shard and the score
        matrix never materializes beyond ``(N/S, N/S)`` per chip.
      mesh: mesh containing ``axis``.
      scale: defaults to ``D ** -0.5``.
      n_valid: mask trailing padded key columns (global index) like
        ``sdpa_bnhd``; 0 = all valid.

    Returns ``(B, N, H, D)``, numerically the full-attention result
    (online-softmax accumulation in fp32).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    n_dev = dict(mesh.shape)[axis]
    if q.shape[1] % n_dev:
        raise ValueError(f"N={q.shape[1]} must divide by {n_dev} ({axis})")
    return _jitted_ring(mesh, axis, scale, n_valid)(q, k, v)


@functools.lru_cache(maxsize=64)
def _jitted_ring(mesh: Mesh, axis: str, scale: float, n_valid: int):
    """Cached jit(shard_map) wrapper for the eager convenience entry —
    without this every :func:`ring_attention` call built a fresh closure
    and re-traced/re-compiled (round-4 advisor). Keyed on the static
    config; jit handles per-shape retracing inside one entry."""
    body = partial(
        _ring_attention_local, axis=axis, scale=scale, n_valid=n_valid
    )
    spec = P(None, axis, None, None)
    return jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    ))
