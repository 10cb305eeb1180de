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
    call sites can state the full (data, model) intent once. A spec
    entry may also be a tuple of axis names (sharding one dim over
    several mesh axes); absent names are dropped from the tuple. Used at
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

    def _clean(s):
        if s is None:
            return None
        if isinstance(s, tuple):
            kept = tuple(a for a in s if a in axes)
            return kept if kept else None
        return s if s in axes else None

    return jax.lax.with_sharding_constraint(x, P(*(_clean(s) for s in spec)))


# ------------------------------------------------- sequence parallelism
#
# Megatron-style sequence parallelism (Korthikanti et al. 2022, §4.2.2,
# arXiv:2205.05198): between the column/row-parallel GEMM pairs the
# activations are full-featured and — without SP — replicated over the
# ``model`` axis, so every TP rank redundantly computes the norms,
# residual adds and drop paths on the full token stream and holds the
# full (rows, D) activations. With SP the residual stream's token rows
# are sharded over ``model`` as well: GSPMD turns the row-parallel
# GEMM's all-reduce into reduce-scatter + (at the next column-parallel
# GEMM) all-gather — identical bytes on the wire, but the elementwise
# region computes 1/tp of the rows per chip and the saved activations
# shrink by tp. Expressed purely as a different sharding constraint at
# the residual boundaries; XLA places the collectives.

_SEQUENCE_PARALLEL = False


def sequence_parallel_enabled() -> bool:
    """True when residual token rows should shard over (data, model)."""
    return _SEQUENCE_PARALLEL


class sequence_parallel:
    """Context manager enabling the SP activation layout at trace time.

    Trace-scoped (affects the constraints emitted while tracing), so
    enter it around the jitted function's *definition/trace*, e.g. the
    loss_fn body in train/step.py (``TrainConfig.sequence_parallel``)."""

    def __init__(self, enable: bool = True):
        self.enable = bool(enable)

    def __enter__(self):
        global _SEQUENCE_PARALLEL
        self._saved = _SEQUENCE_PARALLEL
        _SEQUENCE_PARALLEL = self.enable
        return self

    def __exit__(self, *exc):
        global _SEQUENCE_PARALLEL
        _SEQUENCE_PARALLEL = self._saved
        return False


def constrain_residual(x: Any, token_axis: int = 0) -> Any:
    """Pin the residual token stream at a block boundary.

    Default layout: token rows over ``data``, features replicated. Under
    ``sequence_parallel()`` the rows also shard over ``model``
    (``token_axis=0``: packed (rows, D) — rows over (data, model);
    ``token_axis=1``: (B, N, D) — batch over data, tokens over model).
    Falls back to the non-SP layout when the token dim does not divide
    by the mesh (GSPMD would pad unevenly)."""
    from vtp_tpu.parallel.mesh import active_mesh, mesh_axis_size

    spec: list = [DATA_AXIS] + [None] * (x.ndim - 1)
    if _SEQUENCE_PARALLEL:
        mesh = active_mesh()
        n_model = mesh_axis_size(mesh, MODEL_AXIS)
        if n_model > 1:
            n_data = mesh_axis_size(mesh, DATA_AXIS)
            if token_axis == 0 and x.shape[0] % (n_data * n_model) == 0:
                spec[0] = (DATA_AXIS, MODEL_AXIS)
            elif token_axis == 1 and x.ndim >= 2 and x.shape[1] % n_model == 0:
                spec[1] = MODEL_AXIS
    return maybe_constrain(x, *spec)


# ------------------------------------------- head-major TP qkv layout
#
# The train hot path's fused qkv+rope+attention kernel
# (ops/flash_attention.py) consumes the packed (B, N, [Q|K|V]) qkv GEMM
# output. GSPMD column-shards that GEMM over ``model`` in contiguous
# chunks, which straddle the Q/K/V thirds (rank 0 of a 2-way mesh holds
# [all of Q | first half of K]) — so under canonical weights the fused
# kernels must fall back to XLA under TP (measured +47% step time,
# PERF.md round 5). The fix is a PARAMETER layout, not a collective:
# permute the qkv output columns from [Q|K|V] (head h at h*d within
# each third) into ``tp`` rank-major groups [Q_r|K_r|V_r] — then each
# rank's contiguous column shard is itself a canonical packed qkv for
# its H/tp heads, the GEMM emits every rank's microlayout directly,
# and the fused kernels engage per-shard with ZERO extra collectives.
# Rank r holds the contiguous heads [r*H/tp, (r+1)*H/tp), so the
# attention OUTPUT feature order stays canonical and the row-parallel
# out-projection needs no change. Consumers declare the layout via
# ``BlockConfig.qkv_head_major`` (models/blocks.py).


def qkv_head_major(w: Any, num_heads: int, tp: int, *,
                   inverse: bool = False) -> Any:
    """Permute packed-qkv output columns between the canonical [Q|K|V]
    layout and the ``tp``-rank-major head-aligned layout (see above).

    Works on kernels ``(..., in_dim, 3D)`` and biases ``(..., 3D)`` —
    the permutation acts on the last (packed feature) dim, so stacked
    (depth, ...) block parameters pass through unchanged elsewhere.
    ``inverse=True`` maps head-major back to canonical (export /
    checkpoint canonicalization)."""
    if tp <= 1:
        return w
    c = int(w.shape[-1])
    D = c // 3
    if 3 * D != c or D % num_heads or num_heads % tp:
        raise ValueError(
            f"qkv feature dim {c} not permutable: needs 3*H*d columns "
            f"with num_heads={num_heads} divisible by tp={tp}")
    lead = w.shape[:-1]
    if inverse:
        t = w.reshape(*lead, tp, 3, D // tp).swapaxes(-3, -2)
    else:
        t = w.reshape(*lead, 3, tp, D // tp).swapaxes(-3, -2)
    return t.reshape(*lead, c)


def permute_trunk_qkv(trunk: dict, num_heads: int, tp: int, *,
                      inverse: bool = False) -> dict:
    """Copy of a ViT trunk param tree (models/vit.init_vit_params) with
    the stacked blocks' qkv kernel+bias permuted to (``inverse=False``)
    or from (``inverse=True``) the head-major TP layout. Every other
    leaf is shared, not copied."""
    if tp <= 1:
        return trunk
    trunk = dict(trunk)
    blocks = dict(trunk["blocks"])
    attn = dict(blocks["attn"])
    qkv = dict(attn["qkv"])
    qkv["kernel"] = qkv_head_major(qkv["kernel"], num_heads, tp,
                                   inverse=inverse)
    if qkv.get("bias") is not None:
        qkv["bias"] = qkv_head_major(qkv["bias"], num_heads, tp,
                                     inverse=inverse)
    attn["qkv"] = qkv
    blocks["attn"] = attn
    trunk["blocks"] = blocks
    return trunk


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS, *((None,) * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
