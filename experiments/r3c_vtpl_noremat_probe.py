"""Does bf16 Adam moment storage (train/optim.py) let VTP-L CLIP+rec
train with remat=off on one 16 GB v5e?

Round-2 finding: VTP-L no-remat OOMs (bench defaults it to remat='attn',
62 img/s). bf16 m/v free ~1.2 GB of the ~3.5 GB optimizer state at
VTP-L's ~300M params — probe whether the no-remat activation plan now
fits, and what it buys.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from vtp_tpu.utils.env import bootstrap

bootstrap()

import jax

from vtp_tpu.config import PRESETS
from vtp_tpu.train.step import TrainConfig, build_train_step, init_state

print(f"device: {jax.devices()[0]}", flush=True)

cfg = PRESETS["vtp-large"]()
results = {}


def measure(remat, moment_dtype, B=32, iters=8):
    tcfg = TrainConfig(train_ssl=False, remat=remat, unroll_layers=True,
                       warmup_steps=0, total_steps=100,
                       moment_dtype=moment_dtype)
    state = init_state(jax.random.key(0), cfg, tcfg)
    step = jax.jit(build_train_step(cfg, tcfg), donate_argnums=(0,))
    batch = {
        "image": jax.random.normal(jax.random.key(1), (B, 3, 256, 256)),
        "text": jax.random.randint(jax.random.key(2), (B, 77), 1, 49000),
        "rec_image": jax.random.normal(jax.random.key(1), (B, 3, 256, 256)),
    }
    t0 = time.perf_counter()
    state, m = step(state, batch, jax.random.key(3))
    print(f"  compile+first {time.perf_counter()-t0:.1f}s "
          f"loss={float(m['loss/total']):.4f}", flush=True)
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, batch, jax.random.key(4 + i))
    _ = float(m["loss/total"])
    dt = (time.perf_counter() - t0) / iters
    print(f"  remat={remat} mom={moment_dtype} B={B}: {dt*1e3:.1f} ms/step, "
          f"{B/dt:.1f} img/s", flush=True)
    del state, step, batch
    return B / dt


for name, remat, mom in [
    ("attn_fp32_baseline", "attn", "fp32"),
    ("attn_bf16", "attn", "bf16"),
    ("noremat_bf16", False, "bf16"),
]:
    print(f"== {name}", flush=True)
    try:
        results[name] = round(measure(remat, mom), 1)
    except Exception as e:
        print(f"  FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
        results[name] = None

print(json.dumps(results), flush=True)
print("DONE", flush=True)
