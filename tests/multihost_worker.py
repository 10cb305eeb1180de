"""Worker for tests/test_multihost.py: one of two local 'hosts' in a
jax.distributed CPU cluster (2 processes x 2 virtual devices = a 4-device
global mesh). Exercises initialize_multihost, ShardedSampler host-slice
ingest, global-array assembly from per-host data, and a cross-host psum.

Run: python tests/multihost_worker.py <process_id> <port>
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from vtp_tpu.data import ShardedSampler  # noqa: E402
from vtp_tpu.parallel.multihost import (  # noqa: E402
    host_shard_info,
    initialize_multihost,
    is_main_process,
)


def main() -> None:
    pid, port = int(sys.argv[1]), sys.argv[2]
    initialize_multihost(f"localhost:{port}", num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()
    shard, num_shards = host_shard_info()
    assert (shard, num_shards) == (pid, 2)
    assert is_main_process() == (pid == 0)

    # --- ShardedSampler: the two host slices exactly partition the data
    n = 19  # not divisible: exercises wrap-around padding
    mine = ShardedSampler(n, shard, num_shards).indices()
    assert len(mine) == 10  # ceil(19/2)
    other = ShardedSampler(n, 1 - shard, num_shards).indices()
    union = np.union1d(mine, other)
    assert np.array_equal(union, np.arange(n)), union

    # --- global array from per-host local data + cross-host reduction
    mesh = Mesh(np.asarray(jax.devices()).reshape(4), ("data",))
    data = np.arange(16, dtype=np.float32)  # the notional global dataset
    local = data[pid * 8:(pid + 1) * 8]  # this host's contiguous ingest
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), local, (16,)
    )

    total = jax.jit(
        jnp.sum, out_shardings=NamedSharding(mesh, P())
    )(arr)

    psum_total = jax.jit(jax.shard_map(
        lambda x: jax.lax.psum(jnp.sum(x), "data"),
        mesh=mesh, in_specs=P("data"), out_specs=P(),
    ))(arr)

    assert float(total) == float(np.sum(data)), float(total)
    assert float(psum_total) == float(np.sum(data)), float(psum_total)

    # --- DiT training step across the cluster: per-host latent shards
    # assemble into a global data-sharded batch, replicated state, one
    # jitted step (tools/train_dit.py's layout over DCN)
    from vtp_tpu.dit.model import make_dit_config
    from vtp_tpu.dit.train import (
        DiTTrainConfig,
        build_dit_train_step,
        init_dit_state,
    )

    dcfg = make_dit_config("DiT-B/1", depth=2, dim=128, num_heads=4,
                           in_channels=8, input_size=4)
    dtcfg = DiTTrainConfig(remat=False, unroll_layers=True)
    dstate = init_dit_state(jax.random.key(0), dcfg, dtcfg)
    dstate = jax.device_put(dstate, NamedSharding(mesh, P()))
    step = jax.jit(build_dit_train_step(dcfg, dtcfg), donate_argnums=(0,))
    B = 8  # global batch; each host contributes 4 rows
    rng = np.random.default_rng(0)  # same stream; hosts slice their rows
    lat_global = rng.normal(size=(B, 8, 4, 4)).astype(np.float32)
    lab_global = rng.integers(0, dcfg.num_classes, B)
    lat = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data", None, None, None)),
        lat_global[pid * 4:(pid + 1) * 4], (B, 8, 4, 4))
    lab = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), lab_global[pid * 4:(pid + 1) * 4],
        (B,))
    losses = []
    for i in range(2):
        dstate, m = step(dstate, lat, lab, jax.random.key(3 + i))
        losses.append(float(m["loss/transport"]))
    assert all(np.isfinite(v) for v in losses), losses

    print(f"MULTIHOST-OK pid={pid} sum={float(total)} "
          f"dit_loss={losses[-1]:.4f}", flush=True)


if __name__ == "__main__":
    main()
