"""Round-5 VERDICT item 7: quantify the TP disengagement story.

Under any model-parallel mesh (model axis > 1) the Pallas attention
kernels fall back to XLA (`ops/flash_attention._mesh_ok`) and context
parallelism refuses to engage (`ops/ring_attention.ring_supported`).
This probe bounds what that costs by measuring, on the one real chip,
the vtp-base CLIP+rec train step with kernels ON vs the XLA fallback
(`configure_kernels(disable_flash=True, disable_fused_ce=True)`) — the
single-chip compute delta IS the per-chip disengagement cost a TP mesh
would pay, since the fallback path is exactly what GSPMD runs per shard
under `model > 1`.

Usage: nohup python -u experiments/r5_tp_disengage.py \
           > /tmp/r5_tp_disengage.log 2>&1 &
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vtp_tpu.utils.env import bootstrap

bootstrap()

import jax
import jax.numpy as jnp

from vtp_tpu.config import PRESETS
from vtp_tpu.ops.dispatch import configure_kernels
from vtp_tpu.train.step import TrainConfig, build_train_step, init_state


def measure(fallback: bool, *, preset="vtp-base", batch=32, iters=8) -> dict:
    configure_kernels(disable_flash=fallback, disable_fused_ce=fallback)
    cfg = PRESETS[preset]()
    tcfg = TrainConfig(train_ssl=False, warmup_steps=0, total_steps=1000,
                       remat=False, unroll_layers=True)
    state = init_state(jax.random.key(0), cfg, tcfg)
    k1, k2 = jax.random.split(jax.random.key(1))
    batch_data = {
        "image": jax.random.normal(k1, (batch, 3, cfg.image_size, cfg.image_size)),
        "text": jax.random.randint(k2, (batch, cfg.text_context_length), 1,
                                   cfg.text_vocab_size - 1),
        "rec_image": jax.random.normal(
            k1, (batch, 3, cfg.image_size, cfg.image_size)),
    }
    step = jax.jit(build_train_step(cfg, tcfg), donate_argnums=(0,))
    t0 = time.perf_counter()
    state, m = step(state, batch_data, jax.random.key(2))
    _ = float(m["loss/total"])
    print(f"arm fallback={fallback} compile+first "
          f"{time.perf_counter() - t0:.1f}s", flush=True)
    walls = []
    for i in range(iters):
        t0 = time.perf_counter()
        state, m = step(state, batch_data, jax.random.key(3 + i))
        _ = float(m["loss/total"])
        walls.append(time.perf_counter() - t0)
        print(f"  iter {i + 1}: {walls[-1]*1e3:.1f} ms", flush=True)
    del state
    configure_kernels(disable_flash=False, disable_fused_ce=False)
    return {"fallback": fallback, "min_ms": min(walls) * 1e3,
            "imgs_per_sec": batch / min(walls),
            "walls_ms": [round(w * 1e3, 1) for w in walls]}


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    kern = measure(False)
    xla = measure(True)
    out = {"kernel": kern, "xla_fallback": xla,
           "tp_disengage_cost_pct": round(
               100 * (xla["min_ms"] / kern["min_ms"] - 1), 1)}
    print(json.dumps(out, indent=2), flush=True)
    with open("traces/r5_tp_disengage.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
