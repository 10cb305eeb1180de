"""Round 4: xplane trace of the SSL train step AFTER the pack-once
block-stack refactor (blocks.block_apply_flat), to locate the new
exclusive-time breakdown (r3 buckets: 13.8 ms pack/unpack — expected
gone; ~33 ms bias/scale-grad column reductions — next target).

Run ON TPU, exclusive host:
nohup python -u experiments/r4_ssl_trace.py > /tmp/r4_trace.log 2>&1 &
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
tcfg = TrainConfig(train_ssl=True, warmup_steps=0, total_steps=1000,
                   remat=False, unroll_layers=True)
state = init_state(jax.random.key(0), cfg, tcfg)
step = jax.jit(build_train_step(cfg, tcfg), donate_argnums=(0,))
k1, k2 = jax.random.split(jax.random.key(1))
batch = {
    "image": jax.random.normal(k1, (BATCH, 3, 256, 256)),
    "text": jax.random.randint(k2, (BATCH, 77), 1, 49000),
    "rec_image": jax.random.normal(k1, (BATCH, 3, 256, 256)),
    "ssl": make_ssl_batch(jax.random.key(4), BATCH, global_size=256, patch=16),
}

t0 = time.perf_counter()
state, m = step(state, batch, jax.random.key(2))
_ = float(m["loss/total"])
print(f"compile+first {time.perf_counter() - t0:.1f}s", flush=True)

t0 = time.perf_counter()
for i in range(ITERS):
    state, m = step(state, batch, jax.random.key(3 + i))
_ = float(m["loss/total"])
dt = (time.perf_counter() - t0) / ITERS
print(f"ssl step {dt*1e3:.1f} ms/step  {BATCH/dt:.1f} img/s", flush=True)

jax.profiler.start_trace("/root/repo/traces/r4_ssl_pack_once")
for i in range(3):
    state, m = step(state, batch, jax.random.key(100 + i))
_ = float(m["loss/total"])
jax.profiler.stop_trace()
print("trace -> /root/repo/traces/r4_ssl_pack_once", flush=True)
