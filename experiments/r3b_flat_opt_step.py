"""A/B: CLIP+rec train step with the optimizer run per-leaf (current)
vs over one raveled vector. Isolated probe said 160.7 vs 45.8 ms for
the optimizer alone (suspiciously high both ways — harness overhead);
this measures the real step end to end."""
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
from vtp_tpu.train import step as step_mod
from vtp_tpu.train.step import TrainConfig, build_train_step, init_state, make_optimizer

BATCH = 32
print(f"device: {jax.devices()[0]}", flush=True)
cfg = PRESETS["vtp-base"]()


def flat_wrap(inner):
    def init(params):
        flat, _ = ravel_pytree(params)
        return (inner.init(flat),)

    def update(grads, state, params=None):
        fg, unravel = ravel_pytree(grads)
        fp, _ = ravel_pytree(params)
        upd, inner_state = inner.update(fg, state[0], fp)
        return unravel(upd), (inner_state,)

    return optax.GradientTransformation(init, update)


def bench(name, wrap):
    orig = step_mod.make_optimizer
    if wrap:
        step_mod.make_optimizer = lambda tcfg: flat_wrap(orig(tcfg))
    try:
        tcfg = TrainConfig(train_ssl=False, warmup_steps=0, total_steps=1000,
                           remat=False, unroll_layers=True)
        state = init_state(jax.random.key(0), cfg, tcfg)
        step = jax.jit(build_train_step(cfg, tcfg), donate_argnums=(0,))
        k1, k2 = jax.random.split(jax.random.key(1))
        batch = {
            "image": jax.random.normal(k1, (BATCH, 3, 256, 256)),
            "text": jax.random.randint(k2, (BATCH, 77), 1, 49000),
            "rec_image": jax.random.normal(k1, (BATCH, 3, 256, 256)),
        }
        t0 = time.perf_counter()
        state, m = step(state, batch, jax.random.key(2))
        print(f"  compile+first {time.perf_counter()-t0:.1f}s "
              f"loss={float(m['loss/total']):.4f} "
              f"gnorm={float(m['grad_norm']):.3f}", flush=True)
        t0 = time.perf_counter()
        n = 12
        for i in range(n):
            state, m = step(state, batch, jax.random.key(3 + i))
        _ = float(m["loss/total"])
        dt = (time.perf_counter() - t0) / n
        print(f"{name}: {dt*1e3:.1f} ms/step = {BATCH/dt:.1f} img/s", flush=True)
    finally:
        step_mod.make_optimizer = orig


bench("per-leaf (current)", False)
bench("flat optimizer", True)
print("DONE", flush=True)
