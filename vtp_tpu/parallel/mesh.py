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

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"
SEQ_AXIS = "seq"  # context parallelism: attention token dim (ring attention)
PIPE_AXIS = "pipe"  # pipeline parallelism: transformer depth (parallel/pipeline.py)

# context-parallel arm preference per mesh signature (axis-name/size
# tuple), set by make_cp_mesh(mode=...). Keyed on the signature because
# trace-time dispatch sees the ambient ABSTRACT mesh (jax.set_mesh),
# which carries names/sizes, not the concrete Mesh object. VTP_CP_MODE
# is honored ONCE at import as the process-wide default; runtime changes
# go through make_cp_mesh, which clears the jit caches on a flip so a
# cached trace can never silently keep the old arm (round-4 verdict:
# trace-time env reads were a jit-cache hazard).
_CP_MODES: dict = {}
_CP_DEFAULT = os.environ.get("VTP_CP_MODE", "auto")


def _mesh_signature(mesh) -> tuple:
    return tuple(dict(mesh.shape).items())


def cp_mode_for(mesh) -> str:
    """The context-parallel arm preference for ``mesh`` (works on both
    concrete and abstract meshes): "auto" (Ulysses when heads divide the
    seq axis, else ring), "ring", or "ulysses"."""
    return _CP_MODES.get(_mesh_signature(mesh), _CP_DEFAULT)


def active_mesh():
    """The ambient nontrivial mesh at trace time (``jax.set_mesh``), or
    None. Pallas ``pallas_call`` has no SPMD partitioning rule, so every
    kernel dispatch consults this to decide whether it must run inside
    ``jax.shard_map`` (ops/fused_ce.py, ops/flash_attention.py) —
    otherwise GSPMD would replicate the kernel's full operands on every
    device.

    INSIDE a ``jax.shard_map`` body every mesh axis is Manual — the
    program is already per-shard there, so dispatch must not re-engage
    (e.g. block_apply_flat running inside the pipeline-parallel worker,
    parallel/pipeline.py, would otherwise try a nested shard_map).
    A mesh whose axes are all Manual therefore reads as None."""
    try:
        m = jax.sharding.get_abstract_mesh()
    except Exception:  # pragma: no cover - very old jax
        return None
    if m is None or m.empty or m.size == 1:
        return None
    try:
        from jax.sharding import AxisType

        if all(t == AxisType.Manual for t in m.axis_types):
            return None
    except ImportError:  # pragma: no cover - older jax
        pass
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
    n_model: int = 1,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
    mode: Optional[str] = None,
) -> Mesh:
    """Build a ``(data, seq[, model])`` context-parallel mesh: batch over
    ``data``, attention token dim over ``seq``, and — when
    ``n_model > 1`` — attention heads (and the Megatron weight columns)
    over ``model`` as well (CP×TP, round 5: requires ``heads % n_model
    == 0``; Ulysses additionally ``(heads / n_model) % n_seq == 0``).
    Under ``jax.set_mesh`` of such a mesh the model forward dispatches
    its attention to a CP arm automatically (models/blocks.sdpa_bnhd;
    ops/ring_attention.py).

    ``mode`` picks the arm: "auto" (default: Ulysses all-to-all when the
    per-model-shard head count divides ``n_seq``, else the ppermute KV
    ring), "ring", or "ulysses". The preference is registered for this
    mesh signature; if it CHANGES an already-registered signature, the
    jax compilation caches are cleared so previously-traced functions
    re-trace under the new arm instead of silently keeping the old one."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data * n_seq * n_model != len(devices):
        raise ValueError(f"mesh {n_data}x{n_seq}x{n_model} != "
                         f"{len(devices)} devices")
    if n_model > 1:
        arr = np.asarray(devices).reshape(n_data, n_seq, n_model)
        mesh = Mesh(arr, (DATA_AXIS, SEQ_AXIS, MODEL_AXIS))
    else:
        arr = np.asarray(devices).reshape(n_data, n_seq)
        mesh = Mesh(arr, (DATA_AXIS, SEQ_AXIS))
    mode = _CP_DEFAULT if mode is None else mode
    if mode not in ("auto", "ring", "ulysses"):
        raise ValueError(f"cp mode {mode!r} not in (auto, ring, ulysses)")
    sig = _mesh_signature(mesh)
    if _CP_MODES.get(sig, _CP_DEFAULT) != mode:
        _CP_MODES[sig] = mode
        jax.clear_caches()
    else:
        _CP_MODES[sig] = mode
    return mesh
