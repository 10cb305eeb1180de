"""Device-mesh construction.

The reference's only parallelism is DDP over NCCL (SURVEY.md section
2.8). The TPU-native equivalent is SPMD under jit over a named mesh:
a ``data`` axis for batch sharding (DP) and an optional ``model`` axis
for tensor parallelism of the FFN/attention projections. Collectives
are inserted by XLA from sharding annotations — no process groups.

Multi-host: ``jax.distributed.initialize()`` then the same code; the
mesh spans all global devices and ICI/DCN routing is XLA's job.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"
SEQ_AXIS = "seq"  # context parallelism: attention token dim (ring attention)


def active_mesh():
    """The ambient nontrivial mesh at trace time (``jax.set_mesh``), or
    None. Pallas ``pallas_call`` has no SPMD partitioning rule, so every
    kernel dispatch consults this to decide whether it must run inside
    ``jax.shard_map`` (ops/fused_ce.py, ops/flash_attention.py) —
    otherwise GSPMD would replicate the kernel's full operands on every
    device."""
    try:
        m = jax.sharding.get_abstract_mesh()
    except Exception:  # pragma: no cover - very old jax
        return None
    if m is None or m.empty or m.size == 1:
        return None
    return m


def mesh_axis_size(mesh, axis: str) -> int:
    """Size of ``axis`` in ``mesh`` (1 when absent or mesh is None)."""
    if mesh is None:
        return 1
    return dict(mesh.shape).get(axis, 1)


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ``(data, model)`` mesh. Defaults to all devices on the
    data axis (pure DP — the reference's parallelism)."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data * n_model != len(devices):
        raise ValueError(f"mesh {n_data}x{n_model} != {len(devices)} devices")
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def make_cp_mesh(
    n_seq: int,
    n_data: int = 1,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ``(data, seq)`` context-parallel mesh: batch over ``data``,
    attention token dim over ``seq`` (ring attention —
    ops/ring_attention.py). Under ``jax.set_mesh`` of such a mesh the
    model forward dispatches its attention to the ring automatically
    (models/blocks.sdpa_bnhd)."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data * n_seq != len(devices):
        raise ValueError(f"mesh {n_data}x{n_seq} != {len(devices)} devices")
    arr = np.asarray(devices).reshape(n_data, n_seq)
    return Mesh(arr, (DATA_AXIS, SEQ_AXIS))
