"""Train-step throughput with the dedicated flash-attention backward
kernel. Round-1 baselines (recompute VJP): CLIP+rec 121 img/s,
full CLIP+SSL+rec 63 samples/s (VTP-B, batch 32, 1 chip)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vtp_tpu.config import PRESETS
from vtp_tpu.train.step import TrainConfig, build_train_step, init_state, make_ssl_batch

BATCH = 32


def run(tag, tcfg, with_ssl):
    cfg = PRESETS["vtp-base"]()
    state = init_state(jax.random.key(0), cfg, tcfg)
    step = jax.jit(build_train_step(cfg, tcfg), donate_argnums=(0,))
    k1, k2, k3 = jax.random.split(jax.random.key(1), 3)
    batch = {
        "image": jax.random.normal(k1, (BATCH, 3, cfg.image_size, cfg.image_size)),
        "text": jax.random.randint(k2, (BATCH, cfg.text_context_length), 1,
                                   cfg.text_vocab_size - 1),
        "rec_image": jax.random.normal(k1, (BATCH, 3, cfg.image_size, cfg.image_size)),
    }
    if with_ssl:
        batch["ssl"] = make_ssl_batch(k3, BATCH)

    t0 = time.perf_counter()
    state, metrics = step(state, batch, jax.random.key(2))
    _ = float(metrics["loss/total"])
    print(f"[{tag}] compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step(state, batch, jax.random.key(3 + i))
    _ = float(metrics["loss/total"])
    dt = (time.perf_counter() - t0) / iters
    print(f"[{tag}] {dt*1e3:.1f} ms/step  {BATCH/dt:.1f} samples/s  "
          f"loss {float(metrics['loss/total']):.4f}", flush=True)


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    run("clip+rec", TrainConfig(train_ssl=False, warmup_steps=0, total_steps=1000), False)
    run("full", TrainConfig(warmup_steps=0, total_steps=1000,
                            clip_drop_rate=0.1, ssl_drop_rate=0.1), True)
    print("JOB-DONE", flush=True)


if __name__ == "__main__":
    main()
