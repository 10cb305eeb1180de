"""Round-4: why is the remat=attn B=32 x accum-8 VTP-L leg ~4x slower
per microbatch than the plain remat=attn B=32 step?

Hypothesis: HBM pressure — fp32 Adam moments (2x 1.2 GB) + the bf16
grad accumulator (0.6 GB) + metric sums live NEXT TO the remat-attn
B=32 activation plan, pushing the step into allocator thrash. Probe:
the same leg with bf16 moments (frees 1.2 GB) and with a smaller
microbatch.

Run ON TPU, exclusive host:
nohup python -u experiments/r4_vtpl_attn_accum_probe.py > /tmp/r4_attn_probe.log 2>&1 &
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from vtp_tpu.utils.env import bootstrap

bootstrap()

import jax
import jax.numpy as jnp

from vtp_tpu.config import PRESETS
from vtp_tpu.train.step import (TrainConfig, build_train_step, init_state,
                                run_host_accum_step)

print(f"device: {jax.devices()[0]}", flush=True)
cfg = PRESETS["vtp-large"]()
results = {}


def make_batch(B):
    return {
        "image": jax.random.normal(jax.random.key(1), (B, 3, 256, 256)),
        "text": jax.random.randint(jax.random.key(2), (B, 77), 1, 49000),
        "rec_image": jax.random.normal(jax.random.key(1), (B, 3, 256, 256)),
    }


def measure(remat, B, accum, moment_dtype, iters=4):
    tcfg = TrainConfig(train_ssl=False, remat=remat, unroll_layers=True,
                       warmup_steps=0, total_steps=100,
                       moment_dtype=moment_dtype,
                       accum_steps=accum, accum_dtype="bf16")
    state = init_state(jax.random.key(0), cfg, tcfg)
    ts = build_train_step(cfg, tcfg)
    micro = jax.jit(ts.micro_step, donate_argnums=(1, 2, 3))
    apply_ = jax.jit(ts.apply_accum, donate_argnums=(0, 1, 2, 3))
    b1 = make_batch(B)
    batch = jax.tree.map(lambda x: jnp.broadcast_to(x, (accum,) + x.shape), b1)

    def run(state, key):
        return run_host_accum_step(ts, tcfg, state, batch, key,
                                   micro_jit=micro, apply_jit=apply_)

    t0 = time.perf_counter()
    state, m = run(state, jax.random.key(3))
    print(f"  compile+first {time.perf_counter()-t0:.1f}s "
          f"loss={float(m['loss/total']):.4f}", flush=True)
    # per-iteration walls so a grant wedge is visible as one outlier
    walls = []
    for i in range(iters):
        t0 = time.perf_counter()
        state, m = run(state, jax.random.key(4 + i))
        _ = float(m["loss/total"])
        walls.append(time.perf_counter() - t0)
    print(f"  walls: {[f'{w:.2f}' for w in walls]}", flush=True)
    dt = min(walls)  # min = least-disturbed step
    imgs = B * accum / dt
    print(f"  remat={remat} B={B} accum={accum} mom={moment_dtype}: "
          f"best {dt*1e3:.1f} ms/step, {imgs:.1f} img/s", flush=True)
    del state
    return imgs


for name, remat, B, accum, mom in [
    ("attn_b32_a8_fp32mom", "attn", 32, 8, "fp32"),
    ("attn_b32_a8_bf16mom", "attn", 32, 8, "bf16"),
]:
    print(f"== {name}", flush=True)
    try:
        results[name] = round(measure(remat, B, accum, mom), 2)
    except Exception as e:  # noqa: BLE001
        print(f"  FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
        results[name] = None

print(json.dumps(results, indent=2), flush=True)
