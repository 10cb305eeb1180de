"""Multi-host SPMD initialization.

TPU-native replacement for the reference's torchrun/NCCL process-group
launch (scripts/*.sh, SURVEY.md section 2.8): one python process per
host, ``jax.distributed.initialize`` wires the hosts, and the same
single-program code then sees the global device mesh. No rank-conditional
control flow is needed — SPMD replicates control flow on all hosts.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize JAX distributed. On TPU pods all arguments are
    auto-detected from the environment; pass them explicitly on other
    platforms (coordinator 'host:port', world size, this host's index —
    the analogues of MASTER_ADDR / WORLD_SIZE / RANK in the reference's
    launchers)."""
    # Do NOT probe jax.process_count() here — any device/process query
    # initializes the XLA backend, after which distributed.initialize
    # refuses to run (this very function used to do that).
    try:
        from jax._src import distributed as _dist

        if _dist.global_state.client is not None:
            return  # already initialized
    except ImportError:  # pragma: no cover - private API moved
        pass
    kwargs = {}
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def host_shard_info() -> tuple[int, int]:
    """(this host's index, number of hosts) — for sharded ingest."""
    return jax.process_index(), jax.process_count()


def is_main_process() -> bool:
    return jax.process_index() == 0
