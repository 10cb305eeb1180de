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

Training integration (round 5): under an ambient ``(data, pipe)`` mesh
(``make_pp_mesh`` + ``jax.set_mesh``) ``models/blocks.scan_blocks``
dispatches its no-drop-path depth loop here automatically
(:func:`maybe_pipeline_blocks`), so the full train step —
``TrainConfig.pipeline_stages`` / ``tools/train_vtp.py
--pipeline_parallel`` — pipelines every tower whose depth divides the
stage count; unsupported stacks fall back to the sequential scan on the
same mesh. The batch ("data") axis co-shards the microbatch rows inside
the same shard_map, so PP composes with DP.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from vtp_tpu.parallel.mesh import DATA_AXIS, PIPE_AXIS, mesh_axis_size


def make_pipeline_mesh(n_stages: Optional[int] = None, *, devices=None) -> Mesh:
    """A 1-D ``(pipe,)`` mesh over ``n_stages`` devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_stages is None:
        n_stages = len(devices)
    if n_stages > len(devices):
        raise ValueError(f"need {n_stages} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n_stages]), (PIPE_AXIS,))


def make_pp_mesh(n_pipe: int, n_data: int = 1, *, devices=None) -> Mesh:
    """A ``(data, pipe)`` mesh: batch over ``data``, transformer depth
    over ``pipe``. Under ``jax.set_mesh`` of such a mesh the block
    stacks pipeline automatically (models/blocks.scan_blocks →
    :func:`maybe_pipeline_blocks`)."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data * n_pipe != len(devices):
        raise ValueError(f"mesh {n_data}x{n_pipe} != {len(devices)} devices")
    arr = np.asarray(devices).reshape(n_data, n_pipe)
    return Mesh(arr, (DATA_AXIS, PIPE_AXIS))


def _remat_layer(body: Callable, remat: Union[bool, str]) -> Callable:
    """Apply a models/blocks.remat_wrap checkpoint policy to a
    ``body(params_i, x) -> x`` per-layer function."""
    if remat is False or remat is None:
        return body
    from vtp_tpu.models.blocks import remat_wrap

    wrapped = remat_wrap(lambda c, p: (body(p, c), None), remat)
    return lambda p, x: wrapped(x, p)[0]


def _stage_apply(body: Callable, local_params: Any, x: jax.Array) -> jax.Array:
    """Run this stage's local layers (leading local-depth axis) in order."""

    def step(carry, p_i):
        return body(p_i, carry), None

    out, _ = jax.lax.scan(step, x, local_params)
    return out


def pipeline_apply(
    body: Callable,
    stacked: Any,
    x_micro: jax.Array,
    *,
    mesh: Mesh,
    axis: str = PIPE_AXIS,
    data_axis: Optional[str] = None,
    remat: Union[bool, str] = False,
    extras: tuple = (),
) -> jax.Array:
    """Run ``depth`` stacked layers as an ``n_stages``-deep pipeline.

    Args:
      body: single-layer apply, ``body(params_i, x, *extras) -> x``
        (the ``lax.scan`` body contract of models/blocks.scan_blocks).
      stacked: pytree of per-layer params with a leading ``depth`` axis;
        ``depth`` must divide by the ``axis`` size.
      x_micro: ``(n_micro, micro_rows, ...)`` microbatched input.
      mesh: mesh containing ``axis`` (the pipeline stages).
      data_axis: optionally co-shard ``x_micro``'s second dim (the rows
        within a microbatch) over this mesh axis inside the same
        shard_map — the DP×PP composition. The caller must lay the rows
        out data-shard-major (see :func:`maybe_pipeline_blocks`).
      remat: checkpoint each layer application in the backward; accepts
        the same policy strings as models/blocks.remat_wrap
        (True/"full"/"dots"/"attn"/"dots_attn").
      extras: layer-invariant traced arrays the body needs (e.g. RoPE
        sin/cos tables). These MUST be shard_map inputs, not closure
        captures: differentiating a shard_map whose body closes over a
        traced value trips a context-mesh error when the zero cotangent
        is built (NamedSharding of the Auto mesh inside the Manual
        body); as explicit replicated inputs their cotangents flow
        through the standard psum transpose. Pytrees with None leaves
        are fine.

    Returns:
      ``(n_micro, micro_rows, ...)`` outputs, replicated over ``axis``.
    """
    n_stages = dict(mesh.shape)[axis]
    depth = jax.tree.leaves(stacked)[0].shape[0]
    if depth % n_stages:
        raise ValueError(f"depth {depth} must divide by {n_stages} stages")
    n_micro = x_micro.shape[0]

    # reshape (depth, ...) -> (n_stages, depth/n_stages, ...) so the
    # shard_map in_spec puts stage s's contiguous layer slab on device s
    per_stage = jax.tree.map(
        lambda a: a.reshape(n_stages, depth // n_stages, *a.shape[1:]), stacked
    )

    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def worker(local_params, x, *extras):
        # local_params: (1, depth/S, ...) slab; x: (M, local_rows, ...) —
        # microbatches replicated over the pipe axis (only stage 0
        # ingests them), rows sharded over data_axis when given
        stage_fn = partial(
            _stage_apply,
            _remat_layer(lambda p_i, c: body(p_i, c, *extras), remat),
        )
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

    x_spec = P(None, data_axis, *(None,) * (x_micro.ndim - 2))
    extras_specs = jax.tree.map(lambda _: P(), extras)
    sharded = jax.shard_map(
        worker,
        mesh=mesh,
        in_specs=(P(axis), x_spec, *extras_specs),
        out_specs=x_spec,
        check_vma=False,
    )
    try:
        from jax._src import core as _core

        tracing = not _core.trace_state_clean()
    except Exception:  # pragma: no cover - jax internals moved
        # Safe default is to JIT: a nested jit under an enclosing trace
        # is legal (it inlines), whereas skipping the jit in eager mode
        # breaks remat's closed_call outside a trace. The cost is only
        # the eager convenience path's per-call retrace.
        tracing = False
    if tracing:
        # already under an enclosing jit (the training step): no inner
        # jit needed — avoids the per-call retrace the round-4 advisor
        # flagged on the eager convenience path
        return sharded(per_stage, x_micro, *extras)
    # eager: jit so the remat (closed_call) body works outside a trace
    return jax.jit(sharded)(per_stage, x_micro, *extras)


def pipeline_blocks(
    xs_micro: jax.Array,
    stacked: dict,
    cfg,
    ropes,
    shapes,
    *,
    mesh: Mesh,
    axis: str = PIPE_AXIS,
    data_axis: Optional[str] = None,
    compute_dtype=None,
    n_valids=None,
    remat: Union[bool, str] = False,
) -> jax.Array:
    """Pipeline the packed-token transformer stack.

    ``xs_micro``: ``(n_micro, rows/n_micro, D)`` microbatched packed
    tokens; ``shapes`` gives the per-microbatch (and per-data-shard,
    when ``data_axis`` is set) crop shapes the worker body sees.
    Mirrors ``scan_blocks``'s no-drop path (the ``block_apply_flat``
    body, models/blocks.py) stage-sharded over ``axis``. Returns the
    packed output rows in microbatch layout.
    """
    from vtp_tpu.models.blocks import block_apply_flat

    def body(p_i, flat, ropes):
        return block_apply_flat(
            flat, p_i, cfg, ropes, shapes,
            compute_dtype=compute_dtype, n_valids=n_valids,
        )

    # ropes ride shard_map as explicit replicated inputs (see
    # pipeline_apply's `extras` note): they are traced values derived
    # from params, and their cotangents must flow the psum transpose
    return pipeline_apply(
        body, stacked, xs_micro, mesh=mesh, axis=axis, data_axis=data_axis,
        remat=remat, extras=(list(ropes),),
    )


# -------------------------------------------- model-level dispatch


def pp_supported(xs, mesh, depth: int) -> bool:
    """Whether scan_blocks' no-drop depth loop can pipeline on ``mesh``:
    a ``pipe`` axis > 1 whose size divides ``depth``, and every crop's
    batch divisible by (n_micro × data axis) so the microbatch/row
    layout splits cleanly (n_micro = the pipe-axis size)."""
    n_pipe = mesh_axis_size(mesh, PIPE_AXIS)
    if mesh is None or n_pipe <= 1:
        return False
    if depth % n_pipe:
        return False
    n_data = mesh_axis_size(mesh, DATA_AXIS)
    return all(x.shape[0] % (n_pipe * n_data) == 0 for x in xs)


def maybe_pipeline_blocks(
    xs,
    stacked: dict,
    cfg,
    ropes,
    *,
    depth: int,
    compute_dtype=None,
    n_valids=None,
    remat: Union[bool, str] = False,
):
    """Pipeline-parallel arm of ``models/blocks.scan_blocks``: under an
    ambient mesh with a ``pipe`` axis, split each crop's batch into
    n_micro = n_stages microbatches (GPipe bubble (S-1)/(M+S-1)), pack
    the rows data-shard-major so the ``data`` axis co-shards them, run
    the systolic ppermute schedule, and reassemble the crops in original
    order. Returns the xs tuple, or None when the layout is unsupported
    (caller falls back to the sequential scan).

    Numerics: microbatching a no-drop block stack is exact — every
    sample's path through the stack is independent (attention never
    mixes batch entries), so the result matches the sequential scan
    bit-for-bit up to XLA scheduling."""
    from vtp_tpu.parallel.mesh import active_mesh

    mesh = active_mesh()
    if mesh is None or not pp_supported(xs, mesh, depth):
        return None
    n_pipe = mesh_axis_size(mesh, PIPE_AXIS)
    n_data = mesh_axis_size(mesh, DATA_AXIS)
    n_micro = n_pipe
    d_model = xs[0].shape[-1]

    # per-(micro, data-shard) crop pieces, rows laid out so that
    # in_spec P(None, data, None) hands shard d exactly its rows:
    # (M, n_data * sum_i b_loc_i * N_i, D) with the second dim d-major
    pieces = []
    shapes = []
    for x in xs:
        B, N, _ = x.shape
        b_loc = B // (n_data * n_micro)
        # (B, N, D) -> (n_data, M, b_loc, N, D) -> (M, n_data, b_loc*N, D)
        p = x.reshape(n_data, n_micro, b_loc, N, d_model)
        p = p.transpose(1, 0, 2, 3, 4).reshape(n_micro, n_data, b_loc * N, d_model)
        pieces.append(p)
        shapes.append((b_loc, N))
    xm = jnp.concatenate(pieces, axis=2)  # (M, n_data, rows_md, D)
    rows_md = xm.shape[2]
    xm = xm.reshape(n_micro, n_data * rows_md, d_model)

    out = pipeline_blocks(
        xm, stacked, cfg, ropes, shapes,
        mesh=mesh, data_axis=DATA_AXIS if n_data > 1 else None,
        compute_dtype=compute_dtype, n_valids=n_valids, remat=remat,
    )

    # inverse: (M, n_data, rows_md, D) -> per-crop (B, N, D)
    out = out.reshape(n_micro, n_data, rows_md, d_model)
    res = []
    off = 0
    for x, (b_loc, N) in zip(xs, shapes):
        seg = out[:, :, off:off + b_loc * N, :]
        off += b_loc * N
        seg = seg.reshape(n_micro, n_data, b_loc, N, d_model)
        seg = seg.transpose(1, 0, 2, 3, 4).reshape(x.shape[0], N, d_model)
        res.append(seg)
    return tuple(res)
