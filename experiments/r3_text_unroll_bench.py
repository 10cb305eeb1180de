"""Round 3: measure the text-tower unroll win on the train steps.

Baseline (text tower scanning, round-3 trace): CLIP+rec 158.5 ms/step
(201.9 img/s), SSL 344.0 ms/step (93.0 img/s); the text scan cost
~19.6 ms/step vs a ~6.4 ms matmul floor.

Run ON TPU: nohup python -u experiments/r3_text_unroll_bench.py > log &
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from vtp_tpu.utils.env import bootstrap

bootstrap()

import jax

from vtp_tpu.config import PRESETS
from vtp_tpu.train.step import (TrainConfig, build_train_step, init_state,
                                make_ssl_batch)

BATCH = 32
ITERS = 10
print(f"device: {jax.devices()[0]}", flush=True)

cfg = PRESETS["vtp-base"]()


def run(tag, ssl, trace=None):
    tcfg = TrainConfig(train_ssl=ssl, warmup_steps=0, total_steps=1000,
                       remat=False, unroll_layers=True)
    state = init_state(jax.random.key(0), cfg, tcfg)
    step = jax.jit(build_train_step(cfg, tcfg), donate_argnums=(0,))
    k1, k2 = jax.random.split(jax.random.key(1))
    batch = {
        "image": jax.random.normal(k1, (BATCH, 3, 256, 256)),
        "text": jax.random.randint(k2, (BATCH, 77), 1, 49000),
        "rec_image": jax.random.normal(k1, (BATCH, 3, 256, 256)),
    }
    if ssl:
        batch["ssl"] = make_ssl_batch(jax.random.key(4), BATCH,
                                      global_size=256, patch=16)
    t0 = time.perf_counter()
    state, m = step(state, batch, jax.random.key(2))
    _ = float(m["loss/total"])
    print(f"{tag}: compile+first {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for i in range(ITERS):
        state, m = step(state, batch, jax.random.key(3 + i))
    _ = float(m["loss/total"])
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{tag}: {dt*1e3:.1f} ms/step  {BATCH/dt:.1f} img/s", flush=True)
    if trace:
        jax.profiler.start_trace(trace)
        for i in range(3):
            state, m = step(state, batch, jax.random.key(100 + i))
        _ = float(m["loss/total"])
        jax.profiler.stop_trace()
        print(f"  trace -> {trace}", flush=True)
    del state


run("CLIP+rec  text-unroll", False)
run("CLIP+SSL+rec text-unroll", True,
    trace="/root/repo/traces/r3_ssl_textunroll")
