"""Sharding rules: param pytree -> PartitionSpec pytree.

Megatron-style tensor parallelism expressed purely as GSPMD sharding
hints — XLA inserts the all-reduces:

  * column-parallel (shard the output features over ``model``):
    qkv, ffn up-projections (w1/w2/fc1/c_fc), attention in_proj;
  * row-parallel (shard the input features): attention out
    projections (proj/out_proj), ffn down-projections (w3/fc2/c_proj);
  * token embedding sharded over the vocab;
  * everything else (norms, cls tokens, rope, biases of row-parallel
    layers, small heads) replicated.

The per-layer ``depth`` axis of scanned blocks is never sharded.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vtp_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

# kernels whose *output* features are model-sharded
_COLUMN = {"qkv", "w1", "w2", "fc1", "c_fc", "in_proj"}
# kernels whose *input* features are model-sharded
_ROW = {"proj", "w3", "fc2", "c_proj", "out_proj"}


def _spec_for(path: Tuple[str, ...], leaf: Any) -> P:
    names = [p for p in path]
    ndim = getattr(leaf, "ndim", 0)
    owner = names[-2] if len(names) >= 2 else ""
    kind = names[-1]

    if kind == "kernel":
        # stacked block kernels have a leading depth axis
        lead = (None,) * (ndim - 2)
        if owner in _COLUMN:
            return P(*lead, None, MODEL_AXIS)
        if owner in _ROW:
            return P(*lead, MODEL_AXIS, None)
        return P(*((None,) * ndim))
    if kind == "bias" and owner in _COLUMN:
        return P(*((None,) * (ndim - 1)), MODEL_AXIS)
    if kind == "token_embedding":
        return P(MODEL_AXIS, None)
    return P(*((None,) * ndim))


def param_partition_specs(params: Any) -> Any:
    """PartitionSpec pytree mirroring ``params``."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    specs = []
    for path, leaf in flat:
        names = tuple(
            k.key if hasattr(k, "key") else str(k) for k in path
        )
        specs.append(_spec_for(names, leaf))
    return jax.tree_util.tree_unflatten(treedef, specs)


def shard_params(params: Any, mesh: Mesh) -> Any:
    specs = param_partition_specs(params)
    return jax.tree.map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)), params, specs
    )


def maybe_constrain(x: Any, *spec) -> Any:
    """``with_sharding_constraint`` against the ambient mesh
    (``jax.set_mesh``); a no-op when single-device / no mesh.

    Axis names in ``spec`` that are absent from the ambient mesh are
    dropped (e.g. a ``model`` annotation under a pure-data mesh), so
    call sites can state the full (data, model) intent once. Used at
    block boundaries in models/blocks.py, ops/ffn.py and
    models/text_encoder.py to pin the Megatron activation layout —
    without these, GSPMD propagation through the scan/remat backward
    loses the batch sharding and emits "[SPMD] Involuntary full
    rematerialization" (replicated activation traffic; VERDICT r3)."""
    from vtp_tpu.parallel.mesh import active_mesh

    mesh = active_mesh()
    if mesh is None:
        return x
    try:
        from jax.sharding import AxisType

        # constraints are GSPMD hints for Auto-mode meshes only; under
        # Explicit axes (jax.make_mesh's default) sharding lives in the
        # types and with_sharding_constraint acts as an assert instead
        if any(t != AxisType.Auto for t in mesh.axis_types):
            return x
    except ImportError:  # pragma: no cover - older jax
        pass
    axes = set(dict(mesh.shape))
    clean = tuple(s if (s is None or s in axes) else None for s in spec)
    return jax.lax.with_sharding_constraint(x, P(*clean))


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS, *((None,) * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
