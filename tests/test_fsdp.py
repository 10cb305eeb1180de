"""FSDP/ZeRO sharding: specs shard the big leaves over `data`, memory
accounting matches, and a train step under fully-sharded state is
numerically identical to the replicated run (XLA inserts the
gathers/reduce-scatters; results must not change)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from vtp_tpu.config import VTPConfig
from vtp_tpu.parallel import make_mesh
from vtp_tpu.parallel.fsdp import (
    fsdp_partition_specs,
    fsdp_state_specs,
    shard_state,
    sharded_bytes,
    tree_shardings,
)
from vtp_tpu.train.step import TrainConfig, build_train_step, init_state

TINY = VTPConfig(
    image_size=32,
    vision_patch_size=16,
    vision_embed_dim=64,
    vision_depth=2,
    vision_num_heads=2,
    vision_feature_bottleneck=16,
    text_context_length=8,
    text_vocab_size=128,
    text_embed_dim=64,
    text_num_heads=2,
    text_depth=2,
    decoder_embed_dim=64,
    decoder_num_heads=2,
    decoder_depth=2,
)

TTINY = TrainConfig(
    train_ssl=False,  # keep the comparison step fast; ssl covered elsewhere
    dino_out_dim=64,
    learning_rate=1e-2,
    warmup_steps=0,
    total_steps=10,
    compute_dtype=None,  # fp32: the replicated-vs-sharded check needs
    remat=False,         # bitwise-comparable numerics
)


def _batch(b=8):
    k = jax.random.key(1)
    k1, k2 = jax.random.split(k)
    return {
        "image": jax.random.normal(k1, (b, 3, 32, 32)),
        "text": jax.random.randint(k2, (b, 8), 1, 127),
        "rec_image": jax.random.normal(k1, (b, 3, 32, 32)),
    }


def test_fsdp_specs_shard_large_leaves():
    state = init_state(jax.random.key(0), TINY, TTINY)
    specs = fsdp_state_specs(state, n_shards=8, min_elems=1024)
    # qkv kernel (depth, 64, 192): feature axis sharded, depth axis not
    qkv = specs["params"]["trunk"]["blocks"]["attn"]["qkv"]["kernel"]
    assert "data" in tuple(qkv)
    assert qkv[0] is None
    # tiny norm scales stay replicated
    norm = specs["params"]["trunk"]["norm"]["scale"]
    assert tuple(norm) == (None,)
    # Adam moments shard like params
    leaves = jax.tree_util.tree_leaves(
        specs["opt_state"], is_leaf=lambda x: isinstance(x, P)
    )
    assert any("data" in tuple(s) for s in leaves if isinstance(s, P))


def test_fsdp_reduces_per_device_bytes():
    mesh = make_mesh()  # 8 devices on data
    state = init_state(jax.random.key(0), TINY, TTINY)
    params = state["params"]
    rep_specs = jax.tree.map(lambda l: P(*((None,) * l.ndim)), params)
    specs = fsdp_partition_specs(params, n_shards=8, min_elems=1024)
    full = sharded_bytes(params, rep_specs, mesh)
    shard = sharded_bytes(params, specs, mesh)
    assert shard < full * 0.35  # most of the tiny model is shardable


def test_fsdp_step_matches_replicated():
    mesh = make_mesh()
    batch = _batch()
    step = build_train_step(TINY, TTINY)

    # replicated run
    state_r = jax.device_put(
        init_state(jax.random.key(0), TINY, TTINY), NamedSharding(mesh, P())
    )
    out_r, metrics_r = jax.jit(step)(state_r, batch, jax.random.key(3))

    # fully-sharded run
    state_f = init_state(jax.random.key(0), TINY, TTINY)
    specs = fsdp_state_specs(state_f, n_shards=8, min_elems=1024)
    state_f = shard_state(state_f, mesh, specs)
    out_f, metrics_f = jax.jit(step)(state_f, batch, jax.random.key(3))

    np.testing.assert_allclose(
        float(metrics_f["loss/total"]), float(metrics_r["loss/total"]), rtol=1e-5
    )
    pr = jax.device_get(out_r["params"])
    pf = jax.device_get(out_f["params"])
    # Adam divides by sqrt(v); where grads are ~0 that amplifies fp32
    # reduction-order drift across shardings. Updates are ~lr=1e-2, so
    # atol 1e-3 (10% of an update) still catches any semantic error
    # (a wrong/missing collective diverges by O(update) or more).
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-3, rtol=5e-3), pr, pf
    )
