"""Round 3: fresh xplane trace of the current-best CLIP+rec train step
(no remat + unrolled, VTP-B, B=32) to re-pin where the remaining
201-vs-431-img/s gap lives. Also times the chunked-scan configs
(unroll=k) for the compile-time/throughput Pareto (VERDICT #5).

Run ON TPU: nohup python -u experiments/r3_train_trace.py > log &
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from vtp_tpu.utils.env import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from vtp_tpu.config import PRESETS
from vtp_tpu.train.step import TrainConfig, build_train_step, init_state

BATCH = 32
ITERS = 10
print(f"device: {jax.devices()[0]}", flush=True)

cfg = PRESETS["vtp-base"]()


def make(remat, unroll, ssl=False):
    tcfg = TrainConfig(train_ssl=ssl, warmup_steps=0, total_steps=1000,
                       remat=remat, unroll_layers=unroll)
    state = init_state(jax.random.key(0), cfg, tcfg)
    step = jax.jit(build_train_step(cfg, tcfg), donate_argnums=(0,))
    k1, k2 = jax.random.split(jax.random.key(1))
    batch = {
        "image": jax.random.normal(k1, (BATCH, 3, 256, 256)),
        "text": jax.random.randint(k2, (BATCH, 77), 1, 49000),
        "rec_image": jax.random.normal(k1, (BATCH, 3, 256, 256)),
    }
    if ssl:
        from vtp_tpu.train.step import make_ssl_batch

        batch["ssl"] = make_ssl_batch(jax.random.key(4), BATCH,
                                      global_size=256, patch=16)
    return step, state, batch


def run(tag, remat, unroll, ssl=False, trace=None):
    try:
        step, state, batch = make(remat, unroll, ssl)
        t0 = time.perf_counter()
        state, m = step(state, batch, jax.random.key(2))
        _ = float(m["loss/total"])
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for i in range(ITERS):
            state, m = step(state, batch, jax.random.key(3 + i))
        _ = float(m["loss/total"])
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{tag:32s} compile {compile_s:6.1f}s  {dt*1e3:7.1f} ms/step  "
              f"{BATCH/dt:6.1f} img/s", flush=True)
        if trace:
            jax.profiler.start_trace(trace)
            for i in range(3):
                state, m = step(state, batch, jax.random.key(100 + i))
            _ = float(m["loss/total"])
            jax.profiler.stop_trace()
            print(f"  trace -> {trace}", flush=True)
        del state
        return dt
    except Exception as e:
        print(f"{tag:32s} FAILED: {str(e)[:160]}", flush=True)
        return None


# Pareto: chunked vs full unroll vs scan (CLIP+rec). scan+no-remat OOMs
# (18.17G/15.75G, PERF.md round 2) — the question is where the chunked
# middle ground lands on both axes.
run("unroll     remat=off", False, True,
    trace="/root/repo/traces/r3_cliprec_unroll")
run("chunk k=6  remat=off", False, 6)
run("chunk k=4  remat=off", False, 4)
run("chunk k=2  remat=off", False, 2)
run("chunk k=4  remat=attn", "attn", 4)
run("scan       remat=full", True, False)
