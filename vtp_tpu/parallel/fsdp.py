"""FSDP/ZeRO-style parameter + optimizer-state sharding.

The reference tops out at DDP (SURVEY.md section 2.8): every rank holds
a full replica of params and Adam moments. That caps the trainable
model at one device's HBM — fine for VTP-L (0.9 GB fp32 trunk), fatal
for the `vit_7b` factory the reference also ships
(vision_transformer.py:401-410; ~29 GB of fp32 params + 2x that in
Adam moments vs 16 GB/chip on v5e).

TPU-native answer: express ZeRO-3 as GSPMD sharding hints. Params and
optimizer moments live sharded over the ``data`` axis; XLA inserts the
all-gathers before each use and reduce-scatters the gradients — no
wrapper classes, no manual bucketing, the train step stays a pure jitted
function. Composes with the Megatron ``model``-axis rules in
``parallel/sharding.py`` (a leaf already model-sharded gets its data
shard on a different axis when divisible).

Usage::

    specs = fsdp_state_specs(state, n_shards=mesh.shape["data"])
    state = jax.device_put(state, tree_shardings(mesh, specs))
    step = jax.jit(step_fn, donate_argnums=(0,))   # shardings propagate
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vtp_tpu.parallel.mesh import DATA_AXIS
from vtp_tpu.parallel.sharding import param_partition_specs

# leaves smaller than this stay replicated: the all-gather latency for
# tiny tensors (norm scales, biases) outweighs the bytes saved
DEFAULT_MIN_ELEMS = 2**16


def _add_data_axis(spec: P, shape, n_shards: int, min_elems: int) -> P:
    """Assign DATA_AXIS to the largest unsharded, divisible dim of
    ``shape`` (largest first, so depth-stacked block kernels shard their
    big feature axes, not the depth axis — which ``lax.scan`` slices)."""
    if int(np.prod(shape)) < min_elems or not shape:
        return spec
    entries = list(spec) + [None] * (len(shape) - len(spec))
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for i in order:
        if entries[i] is None and shape[i] % n_shards == 0 and shape[i] >= n_shards:
            entries[i] = DATA_AXIS
            return P(*entries)
    return spec


def fsdp_partition_specs(
    tree: Any,
    n_shards: int,
    *,
    base_specs: Optional[Any] = None,
    min_elems: int = DEFAULT_MIN_ELEMS,
) -> Any:
    """PartitionSpec pytree sharding every large leaf over ``data``.

    ``base_specs``: an existing spec tree (e.g. the tensor-parallel
    rules) to compose with; FSDP picks a *different* axis for its shard.
    Works on any params-shaped tree (params, Adam mu/nu) because the
    rule is shape-based.
    """
    if base_specs is None:
        base_specs = jax.tree.map(lambda l: P(*((None,) * getattr(l, "ndim", 0))), tree)
    return jax.tree.map(
        lambda leaf, spec: _add_data_axis(
            spec, getattr(leaf, "shape", ()), n_shards, min_elems
        ),
        tree,
        base_specs,
    )


def fsdp_state_specs(
    state: Any,
    n_shards: int,
    *,
    tensor_parallel: bool = False,
    min_elems: int = DEFAULT_MIN_ELEMS,
) -> Any:
    """Spec tree for a full TrainState dict (params / teacher / Adam
    moments sharded; step counters and centers replicated).

    ``tensor_parallel``: also apply the Megatron ``model``-axis rules to
    params/teacher before the data-axis shard (parallel/sharding.py).
    """

    def specs_for_params(p: Any) -> Any:
        base = param_partition_specs(p) if tensor_parallel else None
        return fsdp_partition_specs(p, n_shards, base_specs=base, min_elems=min_elems)

    def walk(key: str, node: Any) -> Any:
        if key in ("params", "teacher"):
            return specs_for_params(node)
        if key == "opt_state":
            # optax states nest params-shaped subtrees (mu/nu); the
            # shape-based rule applies uniformly, tiny leaves (counts,
            # schedules) stay replicated via min_elems
            return fsdp_partition_specs(node, n_shards, min_elems=min_elems)
        return jax.tree.map(lambda l: P(*((None,) * getattr(l, "ndim", 0))), node)

    return {k: walk(k, v) for k, v in state.items()}


def tree_shardings(mesh: Mesh, specs: Any) -> Any:
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_state(state: Any, mesh: Mesh, specs: Any) -> Any:
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        state,
        specs,
        is_leaf=None,
    )


def sharded_bytes(tree: Any, specs: Any, mesh: Mesh) -> int:
    """Per-device bytes under ``specs`` (for HBM planning / tests)."""
    total = 0
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))

    def leaf_bytes(leaf, spec):
        nonlocal total
        n = int(np.prod(getattr(leaf, "shape", ()) or (1,)))
        denom = 1
        for entry in spec:
            if entry is None:
                continue
            names = entry if isinstance(entry, tuple) else (entry,)
            for name in names:
                denom *= axis_sizes.get(name, 1)
        total += n * np.dtype(leaf.dtype).itemsize // denom

    jax.tree.map(leaf_bytes, tree, specs)
    return total
