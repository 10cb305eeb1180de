"""Round-5 VERDICT item 3: ladder the flagship SSL step — VTP-L
CLIP+SSL+rec (the actual pre-training configuration of the BASELINE.md
north star; reference objective set: vtp/models/vtp.py:323-338).

Same grid that found the CLIP+rec operating point in round 4
(PERF.md "VTP-L accumulation ladder"): remat ∈ {off, attn} × microbatch
{8, 16, 32} × host accumulation to global 256, bf16 Adam moments.
Per-iteration walls, min-based rates (grant-wedge hygiene — the
r4_vtpl_attn_accum_probe pattern).

Usage: nohup python -u experiments/r5_vtpl_ssl_ladder.py \
           > /tmp/r5_ssl_ladder.log 2>&1 &
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

GLOBAL_BATCH = 256


def leg(*, micro: int, remat, iters: int = 4) -> dict:
    import gc

    from vtp_tpu.config import PRESETS
    from vtp_tpu.train.step import (
        TrainConfig, build_train_step, init_state, make_ssl_batch,
        run_host_accum_step,
    )

    accum = GLOBAL_BATCH // micro
    cfg = PRESETS["vtp-large"]()
    tcfg = TrainConfig(train_ssl=True, warmup_steps=0, total_steps=1000,
                       remat=remat, unroll_layers=True,
                       accum_steps=accum, accum_dtype="bf16",
                       moment_dtype="bf16")
    state = init_state(jax.random.key(0), cfg, tcfg)
    ts = build_train_step(cfg, tcfg)
    k1, k2 = jax.random.split(jax.random.key(1))
    b = {
        "image": jax.random.normal(k1, (micro, 3, cfg.image_size, cfg.image_size)),
        "text": jax.random.randint(k2, (micro, cfg.text_context_length), 1,
                                   cfg.text_vocab_size - 1),
        "rec_image": jax.random.normal(
            k1, (micro, 3, cfg.image_size, cfg.image_size)),
        "ssl": make_ssl_batch(jax.random.key(4), micro,
                              global_size=cfg.image_size,
                              patch=cfg.vision_patch_size),
    }
    if accum > 1:
        micro_jit = jax.jit(ts.micro_step, donate_argnums=(1, 2, 3))
        apply_jit = jax.jit(ts.apply_accum, donate_argnums=(0, 1, 2, 3))
        batch_a = jax.tree.map(lambda x: jnp.broadcast_to(x, (accum,) + x.shape), b)

        def run(state, key):
            return run_host_accum_step(ts, tcfg, state, batch_a, key,
                                       micro_jit=micro_jit, apply_jit=apply_jit)
    else:
        step = jax.jit(ts, donate_argnums=(0,))

        def run(state, key):
            return step(state, b, key)

    t0 = time.perf_counter()
    state, m = run(state, jax.random.key(2))
    _ = float(m["loss/total"])
    print(f"[micro={micro} accum={accum} remat={remat}] compile+first "
          f"{time.perf_counter() - t0:.1f}s", flush=True)
    walls = []
    for i in range(iters):
        t0 = time.perf_counter()
        state, m = run(state, jax.random.key(3 + i))
        _ = float(m["loss/total"])
        walls.append(time.perf_counter() - t0)
        print(f"  iter {i + 1}: {walls[-1]:.2f} s "
              f"({GLOBAL_BATCH / walls[-1]:.1f} img/s)", flush=True)
    rate = GLOBAL_BATCH / min(walls)
    print(f"  => min-based {rate:.1f} img/s", flush=True)
    del state, ts
    gc.collect()
    return {"micro": micro, "accum": accum, "remat": str(remat),
            "imgs_per_sec": round(rate, 1),
            "walls_s": [round(w, 3) for w in walls]}


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    rows = []
    grid = [
        dict(micro=32, remat="attn"),
        dict(micro=16, remat="attn"),
        dict(micro=8, remat="attn"),
        dict(micro=8, remat=False),
        dict(micro=16, remat=False),
    ]
    for g in grid:
        try:
            rows.append(leg(**g))
        except Exception as e:
            print(f"[micro={g['micro']} remat={g['remat']}] FAILED: "
                  f"{str(e)[:200]}", flush=True)
            rows.append({**{k: str(v) for k, v in g.items()},
                         "error": str(e)[:200]})
    print(json.dumps(rows, indent=2), flush=True)
    with open("traces/r5_vtpl_ssl_ladder.json", "w") as f:
        json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
