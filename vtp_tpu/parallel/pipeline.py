"""GPipe-style pipeline parallelism over depth-stacked block params.

The reference's only parallelism is DDP (SURVEY.md §2.8); DP/TP/FSDP/SP
live in mesh.py / sharding.py / fsdp.py. This module adds the remaining
classical axis — pipeline parallelism — as a TPU-native SPMD construct:

  * The stacked ``(depth, ...)`` per-layer parameters (the same layout
    ``lax.scan`` consumes in models/blocks.py) are sharded over a
    ``pipe`` mesh axis: each device holds ``depth / n_stages``
    contiguous layers. No parameter ever moves.
  * Activations flow stage-to-stage with ``jax.lax.ppermute`` over ICI
    inside ``jax.shard_map`` — the classic systolic schedule from the
    scaling-book pipelining recipe: ``n_micro + n_stages - 1`` ticks,
    each tick running every stage's local layers on its current
    microbatch (devices in the bubble compute on garbage, which is
    standard SPMD pipelining and contributes zero gradient — their
    outputs are never selected into the result).
  * The whole schedule is a ``lax.scan`` over ticks, so it is a single
    compiled loop — differentiable end-to-end (``ppermute`` transposes
    to the inverse permutation; the bubble's garbage paths get zero
    cotangents through the masked selects).

Memory: each stage stores the scan carries for its own layers only, so
peak activation memory scales 1/n_stages (plus the microbatch buffer);
combine with ``remat`` for the classic 1F1B-memory-like tradeoff.

Use ``pipeline_blocks`` for the packed-token transformer stack (the
``block_apply_flat`` body from models/blocks.py) or the generic
``pipeline_apply`` for any per-layer body.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

PIPE_AXIS = "pipe"


def make_pipeline_mesh(n_stages: Optional[int] = None, *, devices=None) -> Mesh:
    """A 1-D ``(pipe,)`` mesh over ``n_stages`` devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_stages is None:
        n_stages = len(devices)
    if n_stages > len(devices):
        raise ValueError(f"need {n_stages} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n_stages]), (PIPE_AXIS,))


def _stage_apply(body: Callable, local_params: Any, x: jax.Array) -> jax.Array:
    """Run this stage's local layers (leading local-depth axis) in order."""

    def step(carry, p_i):
        return body(p_i, carry), None

    out, _ = jax.lax.scan(step, x, local_params)
    return out


def pipeline_apply(
    body: Callable[[Any, jax.Array], jax.Array],
    stacked: Any,
    x_micro: jax.Array,
    *,
    mesh: Mesh,
    axis: str = PIPE_AXIS,
    remat: bool = False,
) -> jax.Array:
    """Run ``depth`` stacked layers as an ``n_stages``-deep pipeline.

    Args:
      body: single-layer apply, ``body(params_i, x) -> x`` (same
        contract as the ``lax.scan`` body in models/blocks.scan_blocks).
      stacked: pytree of per-layer params with a leading ``depth`` axis;
        ``depth`` must divide by the ``axis`` size.
      x_micro: ``(n_micro, micro_batch, ...)`` microbatched input.
      mesh: mesh containing ``axis`` (the pipeline stages).
      remat: checkpoint each stage's layer applications (recompute in
        the backward instead of saving per-tick activations).

    Returns:
      ``(n_micro, micro_batch, ...)`` outputs, replicated over ``axis``.
    """
    n_stages = dict(mesh.shape)[axis]
    depth = jax.tree.leaves(stacked)[0].shape[0]
    if depth % n_stages:
        raise ValueError(f"depth {depth} must divide by {n_stages} stages")
    n_micro = x_micro.shape[0]

    stage_fn = partial(_stage_apply, body)
    if remat:
        stage_fn = jax.checkpoint(stage_fn)

    # reshape (depth, ...) -> (n_stages, depth/n_stages, ...) so the
    # shard_map in_spec puts stage s's contiguous layer slab on device s
    per_stage = jax.tree.map(
        lambda a: a.reshape(n_stages, depth // n_stages, *a.shape[1:]), stacked
    )

    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def worker(local_params, x):
        # local_params: (1, depth/S, ...) slab; x: full (M, mB, ...) —
        # replicated in, only stage 0 ingests it
        local_params = jax.tree.map(lambda a: a[0], local_params)
        s = jax.lax.axis_index(axis)
        buf = jnp.zeros_like(x[0])
        outs = jnp.zeros_like(x)

        def tick(carry, t):
            buf, outs = carry
            x_t = jax.lax.dynamic_index_in_dim(
                x, jnp.clip(t, 0, n_micro - 1), 0, keepdims=False
            )
            inp = jnp.where(s == 0, x_t, buf)
            out = stage_fn(local_params, inp)
            # the last stage retires microbatch t-(S-1) when in range
            w = t - (n_stages - 1)
            w_c = jnp.clip(w, 0, n_micro - 1)
            valid = (s == n_stages - 1) & (w >= 0)
            cur = jax.lax.dynamic_index_in_dim(outs, w_c, 0, keepdims=False)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, jnp.where(valid, out, cur), w_c, 0
            )
            # systolic shift: stage s's output becomes stage s+1's input
            buf = jax.lax.ppermute(out, axis, perm)
            return (buf, outs), None

        (buf, outs), _ = jax.lax.scan(
            tick, (buf, outs), jnp.arange(n_micro + n_stages - 1)
        )
        # broadcast the retired outputs from the last stage to all
        # stages (one all-reduce of the output activations)
        outs = jax.lax.psum(
            jnp.where(s == n_stages - 1, outs, jnp.zeros_like(outs)), axis
        )
        return outs

    sharded = jax.shard_map(
        worker,
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(),
        check_vma=False,
    )
    # jit so the remat (closed_call) body works in eager contexts too;
    # inlined for free when the caller is already under jit
    return jax.jit(sharded)(per_stage, x_micro)


def pipeline_blocks(
    xs_micro: jax.Array,
    stacked: dict,
    cfg,
    ropes,
    shapes,
    *,
    mesh: Mesh,
    axis: str = PIPE_AXIS,
    compute_dtype=None,
    n_valids=None,
    remat: bool = False,
) -> jax.Array:
    """Pipeline the packed-token transformer stack.

    ``xs_micro``: ``(n_micro, rows/n_micro, D)`` microbatched packed
    tokens (split ``pack(xs)[0]`` rows into equal microbatches — rows
    are batch-major so any row split that keeps crops' (b, n) blocks
    intact is valid; with a single crop, split on the batch dim before
    packing). Mirrors ``scan_blocks``'s no-drop path (the
    ``block_apply_flat`` body, models/blocks.py) stage-sharded over
    ``axis``. Returns the packed output rows in microbatch layout.
    """
    from vtp_tpu.models.blocks import block_apply_flat

    def body(p_i, flat):
        return block_apply_flat(
            flat, p_i, cfg, ropes, shapes,
            compute_dtype=compute_dtype, n_valids=n_valids,
        )

    return pipeline_apply(
        body, stacked, xs_micro, mesh=mesh, axis=axis, remat=remat
    )
