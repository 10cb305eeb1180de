"""Fused DINO/iBOT cross-entropy over the 65536-wide prototype logits.

The SSL objectives (train/losses.py dino_loss / ibot_loss) reduce
``-sum(softmax((t - center)/T_t) * log_softmax(s/T_s))`` over rows of
(R, 65536) logits. XLA materializes the teacher probabilities and makes
several full passes over the ~1 GB tensors (softmax max/sum, CE
product, backward), which dominates the SSL-loss wall time on v5e
(PERF.md). This kernel computes the per-row CE in ONE streaming pass
per operand using flash-style online rescaling:

    ce_row = -(U / Z_t) + (m_s + log l_s)
    U   = sum_c exp((t[c]-center[c])/T_t - m_t) * (s[c]/T_s)
    Z_t = sum_c exp((t[c]-center[c])/T_t - m_t)
    l_s = sum_c exp(s[c]/T_s - m_s)

with running maxima m_t / m_s updated per column block (the shared
rescale factor cancels in U/Z_t). The custom VJP saves only the four
per-row scalars and emits ``ds = g_row * (p_s - p_t) / T_s`` in a
second one-pass kernel; the teacher/center/weight sides are
non-differentiable by construction (EMA teacher, state buffer).

Loss semantics match train/losses.py exactly: the python wrappers do
the same mean / masked-sum reductions over the per-row CE.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from vtp_tpu.ops.dispatch import kernel_dispatch

BLOCK_R = 256
BLOCK_C = 2048


def _active_mesh():
    """The ambient nontrivial mesh at trace time (``jax.set_mesh``), or
    None. ``pallas_call`` has no SPMD partitioning rule, so under a
    multi-device mesh the kernel must run inside ``jax.shard_map`` over
    the (independent) row axis — otherwise XLA replicates the full
    (R, 65536) logits on every device, defeating the kernel's purpose."""
    from vtp_tpu.parallel.mesh import active_mesh

    return active_mesh()


def _mesh_row_shards(mesh) -> int:
    from vtp_tpu.parallel.mesh import DATA_AXIS, mesh_axis_size

    return mesh_axis_size(mesh, DATA_AXIS)


def fused_ce_supported(t: jax.Array, s: jax.Array) -> bool:
    d = kernel_dispatch()
    if d.disable_fused_ce:
        return False
    if jax.default_backend() != "tpu" and not d.interpret:
        return False
    if t.ndim != 2 or t.shape != s.shape:
        return False
    R, C = t.shape
    if R % 8 or C % BLOCK_C:
        return False
    mesh = _active_mesh()
    if mesh is not None:
        # need a clean row split over the data axis (rows independent);
        # any other mesh layout falls back to the XLA path, which GSPMD
        # shards correctly.
        n = _mesh_row_shards(mesh)
        if n > 1 and (R % n or (R // n) % 8):
            return False
    return True


def fused_ce_rows_auto(t: jax.Array, s: jax.Array, center: jax.Array,
                       t_temp: float, s_temp: float) -> jax.Array:
    """`fused_ce_rows`, mesh-aware: under a multi-device mesh the kernel
    runs per-shard via ``jax.shard_map`` over the row (data) axis so the
    (R, 65536) logits are never replicated. Callers must have checked
    :func:`fused_ce_supported` first."""
    mesh = _active_mesh()
    if mesh is None or _mesh_row_shards(mesh) == 1:
        return fused_ce_rows(t, s, center, t_temp, s_temp)
    from jax.sharding import PartitionSpec as P

    from vtp_tpu.parallel.mesh import DATA_AXIS

    fn = functools.partial(fused_ce_rows, t_temp=t_temp, s_temp=s_temp)
    return jax.shard_map(
        lambda t_, s_, c_: fn(t_, s_, c_),
        mesh=mesh,
        in_specs=(P(DATA_AXIS, None), P(DATA_AXIS, None), P(None)),
        out_specs=P(DATA_AXIS),
        # pallas_call's out ShapeDtypeStruct carries no vma annotation
        check_vma=False,
    )(t, s, center)


# ------------------------------------------------------------------ fwd


def _fwd_kernel(t_ref, s_ref, c_ref, ce_ref, mt_out, zt_out, ms_out, ls_out,
                mt, zt, u, ms, ls,
                *, t_temp: float, s_temp: float, n_cblocks: int):
    from jax.experimental import pallas as pl

    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        mt[:, :] = jnp.full_like(mt[:, :], -jnp.inf)
        zt[:, :] = jnp.zeros_like(zt[:, :])
        u[:, :] = jnp.zeros_like(u[:, :])
        ms[:, :] = jnp.full_like(ms[:, :], -jnp.inf)
        ls[:, :] = jnp.zeros_like(ls[:, :])

    t = (t_ref[:, :].astype(jnp.float32) - c_ref[:, :].astype(jnp.float32)) / t_temp
    s = s_ref[:, :].astype(jnp.float32) / s_temp

    # teacher online: running max + rescaled Z and U
    mt_new = jnp.maximum(mt[:, :], jnp.max(t, axis=-1, keepdims=True))
    scale_t = jnp.exp(mt[:, :] - mt_new)
    e_t = jnp.exp(t - mt_new)
    zt[:, :] = zt[:, :] * scale_t + jnp.sum(e_t, axis=-1, keepdims=True)
    u[:, :] = u[:, :] * scale_t + jnp.sum(e_t * s, axis=-1, keepdims=True)
    mt[:, :] = mt_new

    # student online logsumexp
    ms_new = jnp.maximum(ms[:, :], jnp.max(s, axis=-1, keepdims=True))
    ls[:, :] = ls[:, :] * jnp.exp(ms[:, :] - ms_new) + jnp.sum(
        jnp.exp(s - ms_new), axis=-1, keepdims=True
    )
    ms[:, :] = ms_new

    @pl.when(j == n_cblocks - 1)
    def _finish():
        ce_ref[:, :] = -(u[:, :] / zt[:, :]) + ms[:, :] + jnp.log(ls[:, :])
        mt_out[:, :] = mt[:, :]
        zt_out[:, :] = zt[:, :]
        ms_out[:, :] = ms[:, :]
        ls_out[:, :] = ls[:, :]


def _run_fwd(t, s, center, t_temp: float, s_temp: float, save_stats: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, C = t.shape
    # same halving rule as _run_bwd: start at BLOCK_R and halve until it
    # divides R (R % 8 == 0 guarantees termination at bR >= 8) — never
    # fall back to bR = R, which overflows VMEM for large non-divisible R
    bR = min(BLOCK_R, R)
    while R % bR:
        bR //= 2
    n_cblocks = C // BLOCK_C
    grid = (R // bR, n_cblocks)

    in_specs = [
        pl.BlockSpec((bR, BLOCK_C), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((bR, BLOCK_C), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, BLOCK_C), lambda i, j: (0, j), memory_space=pltpu.VMEM),
    ]
    scratch = [pltpu.VMEM((bR, 1), jnp.float32) for _ in range(5)]
    kernel = functools.partial(
        _fwd_kernel, t_temp=t_temp, s_temp=s_temp, n_cblocks=n_cblocks
    )
    row_spec = pl.BlockSpec((bR, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    row_shape = jax.ShapeDtypeStruct((R, 1), jnp.float32)
    ce, mt, zt, ms, ls = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[row_spec] * 5,
        out_shape=[row_shape] * 5,
        scratch_shapes=scratch,
        interpret=kernel_dispatch().interpret,
    )(t, s, center.reshape(1, C))
    if save_stats:
        return ce[:, 0], (mt[:, 0], zt[:, 0], ms[:, 0], ls[:, 0])
    return ce[:, 0]


# ------------------------------------------------------------------ bwd


def _bwd_kernel(t_ref, s_ref, c_ref, g_ref, mt_ref, zt_ref, ms_ref, ls_ref,
                ds_ref, *, t_temp: float, s_temp: float):
    t = (t_ref[:, :].astype(jnp.float32) - c_ref[:, :].astype(jnp.float32)) / t_temp
    s = s_ref[:, :].astype(jnp.float32) / s_temp
    p_t = jnp.exp(t - mt_ref[:, :]) / zt_ref[:, :]
    p_s = jnp.exp(s - ms_ref[:, :]) / ls_ref[:, :]
    ds = g_ref[:, :] * (p_s - p_t) / s_temp
    ds_ref[:, :] = ds.astype(ds_ref.dtype)


def _run_bwd(t, s, center, g, stats, t_temp: float, s_temp: float):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, C = t.shape
    bR = min(BLOCK_R, R)
    while R % bR:
        bR //= 2
    grid = (R // bR, C // BLOCK_C)
    mt, zt, ms, ls = stats

    row_spec = pl.BlockSpec((bR, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    blk_spec = pl.BlockSpec((bR, BLOCK_C), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(_bwd_kernel, t_temp=t_temp, s_temp=s_temp)
    ds = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            blk_spec, blk_spec,
            pl.BlockSpec((1, BLOCK_C), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            row_spec, row_spec, row_spec, row_spec, row_spec,
        ],
        out_specs=blk_spec,
        out_shape=jax.ShapeDtypeStruct((R, C), s.dtype),
        interpret=kernel_dispatch().interpret,
    )(t, s, center.reshape(1, C), g.reshape(R, 1),
      mt.reshape(R, 1), zt.reshape(R, 1), ms.reshape(R, 1), ls.reshape(R, 1))
    return ds


# ---------------------------------------------------------------- public


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_ce_rows(t: jax.Array, s: jax.Array, center: jax.Array,
                  t_temp: float, s_temp: float) -> jax.Array:
    """Per-row CE of centered/sharpened teacher vs student log-softmax.

    Differentiable in ``s`` only (teacher/center are stop-grad by the
    DINO construction)."""
    return _run_fwd(t, s, center, t_temp, s_temp, save_stats=False)


def _fused_ce_fwd(t, s, center, t_temp, s_temp):
    ce, stats = _run_fwd(t, s, center, t_temp, s_temp, save_stats=True)
    return ce, (t, s, center, stats)


def _fused_ce_bwd(t_temp, s_temp, res, g):
    t, s, center, stats = res
    ds = _run_bwd(t, s, center, g.astype(jnp.float32), stats, t_temp, s_temp)
    return jnp.zeros_like(t), ds, jnp.zeros_like(center)


fused_ce_rows.defvjp(_fused_ce_fwd, _fused_ce_bwd)
