"""Probe: per-leaf optax optimizer vs flat (raveled) variant on the
real VTP-B CLIP+rec state (59 leaves, 295.6M params).

Trace shows ~22.9 ms/step of optimizer/EMA fp32 fusions vs an 11.6 ms
bandwidth floor (clip+adamw: 8 fp32 passes over 1.18 GB). A flat
optimizer pays 2-3 extra full copies (ravel grads/params, unravel
updated params) but runs clip+adam as a handful of giant vector ops.
This measures both in isolation to decide integration."""
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

from vtp_tpu.utils.env import apply_jax_platforms_env

apply_jax_platforms_env()

import jax
import jax.numpy as jnp
import optax
from jax.flatten_util import ravel_pytree

from vtp_tpu.config import PRESETS
from vtp_tpu.train.step import TrainConfig, init_state, make_optimizer

print(f"device: {jax.devices()[0]}", flush=True)
cfg = PRESETS["vtp-base"]()
tcfg = TrainConfig(train_ssl=False, warmup_steps=0, total_steps=1000)
state = init_state(jax.random.key(0), cfg, tcfg)
params = state["params"]
grads = jax.tree.map(lambda p: jnp.ones_like(p) * 1e-4, params)

opt = make_optimizer(tcfg)


@partial(jax.jit, donate_argnums=(0, 1))
def per_leaf(params, opt_state, grads, tick):
    grads = jax.tree.map(lambda g: g * tick, grads)  # defeat dedup
    updates, opt_state = opt.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    gn = optax.global_norm(grads)
    return params, opt_state, gn


flat_p, unravel = ravel_pytree(params)
del flat_p


@partial(jax.jit, donate_argnums=(0, 1))
def flat(params, opt_state, grads, tick):
    grads = jax.tree.map(lambda g: g * tick, grads)
    fg, _ = ravel_pytree(grads)
    fp, _ = ravel_pytree(params)
    updates, opt_state = opt.update(fg, opt_state, fp)
    new_flat = fp + updates
    gn = jnp.linalg.norm(fg)
    return unravel(new_flat), opt_state, gn


def bench(name, fn, make_state):
    p = jax.tree.map(jnp.copy, params)
    s = make_state(p)
    p, s, gn = fn(p, s, grads, jnp.float32(1.0))
    _ = float(gn)
    t0 = time.perf_counter()
    n = 20
    for i in range(n):
        p, s, gn = fn(p, s, grads, jnp.float32(1.0 + i * 1e-6))
    _ = float(gn)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name}: {dt:.2f} ms/update", flush=True)
    return dt


bench("per-leaf optax (current)", per_leaf, lambda p: opt.init(p))
bench("flat (ravel->update->unravel)", flat,
      lambda p: opt.init(ravel_pytree(p)[0]))
print("DONE", flush=True)
