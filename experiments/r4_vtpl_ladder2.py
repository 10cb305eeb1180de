"""Round-4 VTP-L accumulation ladder, part 2: the accum legs re-run
after fixing zero_accumulators.

The first ladder run (/tmp/r4_vtpl.log) measured the accum legs at
5.7 / 21.2 img/s — 12x/3x below their microbatch rate. Root cause was
NOT the device: train/step.py zero_accumulators ran a jax.eval_shape
over _loss_and_grads (the FULL unrolled VTP-L backward) on every
optimizer step — tens of seconds of pure host tracing per step. Fixed
by enumerating the metric keys statically (the DiT trainer,
dit/train.py zero_grad_accumulators, always did it this way — which is
why DiT accumulation measured +40% while VTP's measured a pathology).

Re-measured legs (vtp-large, CLIP+rec; plain-step baselines from the
first run are kept for the PERF.md table):
  off_b16_a16 : host accum, no-remat, B=16 x 16 -> global 256, bf16 acc
  attn_b32_a8 : host accum, remat=attn, B=32 x 8 -> global 256

Run ON TPU, exclusive host:
nohup python -u experiments/r4_vtpl_ladder2.py > /tmp/r4_vtpl2.log 2>&1 &
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


def measure(remat, B, accum, moment_dtype="fp32", iters=6):
    tcfg = TrainConfig(train_ssl=False, remat=remat, unroll_layers=True,
                       warmup_steps=0, total_steps=100,
                       moment_dtype=moment_dtype,
                       accum_steps=accum, accum_dtype="bf16")
    state = init_state(jax.random.key(0), cfg, tcfg)
    ts = build_train_step(cfg, tcfg)
    micro = jax.jit(ts.micro_step, donate_argnums=(1, 2, 3))
    apply_ = jax.jit(ts.apply_accum, donate_argnums=(0, 1, 2, 3))
    b1 = make_batch(B)
    batch = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (accum,) + x.shape), b1)

    def run(state, key):
        return run_host_accum_step(ts, tcfg, state, batch, key,
                                   micro_jit=micro, apply_jit=apply_)

    t0 = time.perf_counter()
    state, m = run(state, jax.random.key(3))
    print(f"  compile+first {time.perf_counter()-t0:.1f}s "
          f"loss={float(m['loss/total']):.4f}", flush=True)
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = run(state, jax.random.key(4 + i))
    _ = float(m["loss/total"])
    dt = (time.perf_counter() - t0) / iters
    imgs = B * max(accum, 1) / dt
    print(f"  remat={remat} B={B} accum={accum}: {dt*1e3:.1f} ms/step, "
          f"{imgs:.1f} img/s", flush=True)
    del state
    return imgs


for name, remat, B, accum, mom in [
    ("off_b16_a16", False, 16, 16, "bf16"),
    ("attn_b32_a8", "attn", 32, 8, "fp32"),
]:
    print(f"== {name}", flush=True)
    try:
        results[name] = round(measure(remat, B, accum, mom), 2)
    except Exception as e:  # noqa: BLE001
        print(f"  FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
        results[name] = None

print(json.dumps(results, indent=2), flush=True)
