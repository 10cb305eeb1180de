"""Round-5 VERDICT item 3: ladder the flagship SSL step — VTP-L
CLIP+SSL+rec (the actual pre-training configuration of the BASELINE.md
north star; reference objective set: vtp/models/vtp.py:323-338).

Same grid that found the CLIP+rec operating point in round 4
(PERF.md "VTP-L accumulation ladder"): remat ∈ {off, attn} × microbatch
{8, 16, 32} × host accumulation to global 256, bf16 Adam moments.
Per-iteration walls, min-based rates (grant-wedge hygiene — the
r4_vtpl_attn_accum_probe pattern).

Round-5 triage facts:
- experiments/r5_ssl_triage{,2}.py: the UNROLLED depth-24 VTP-L SSL
  step fails remote compile (tpu_compile_helper HTTP 500) even with
  every Pallas kernel disabled — a pure XLA program-size limit of the
  tunnel's compile helper, not a kernel bug (vtp-base SSL and VTP-L
  CLIP+rec unrolled compile fine). The whole grid therefore runs the
  lax.scan depth loop (unroll_layers=False).
- First ladder attempt (all legs one process, full (accum, micro, ...)
  batch stack on-chip) hit RESOURCE_EXHAUSTED on every leg: the ~1.1 GB
  materialized global batch + bf16 accumulators tipped the SSL state
  over, and the first OOM poisoned the rest of the process. This
  version runs ONE LEG PER SUBPROCESS (fresh grant, fresh HBM) and
  reuses a single microbatch per accum step (stacked=False).

Usage: nohup python -u experiments/r5_vtpl_ssl_ladder.py \
           > /tmp/r5_ssl_ladder.log 2>&1 &
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GLOBAL_BATCH = 256
MARK = "LADDER_ROW:"


def leg(*, micro: int, remat, iters: int = 4) -> dict:
    from vtp_tpu.utils.env import bootstrap

    bootstrap()

    import jax
    import jax.numpy as jnp  # noqa: F401

    from vtp_tpu.config import PRESETS
    from vtp_tpu.train.step import (
        TrainConfig, build_train_step, init_state, make_ssl_batch,
        run_host_accum_step,
    )

    print(f"device: {jax.devices()[0]}", flush=True)
    accum = GLOBAL_BATCH // micro
    cfg = PRESETS["vtp-large"]()
    tcfg = TrainConfig(train_ssl=True, warmup_steps=0, total_steps=1000,
                       remat=remat, unroll_layers=False,
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
    micro_jit = jax.jit(ts.micro_step, donate_argnums=(1, 2, 3))
    apply_jit = jax.jit(ts.apply_accum, donate_argnums=(0, 1, 2, 3))

    def run(state, key):
        return run_host_accum_step(ts, tcfg, state, b, key,
                                   micro_jit=micro_jit, apply_jit=apply_jit,
                                   stacked=False)

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
    return {"micro": micro, "accum": accum, "remat": str(remat),
            "imgs_per_sec": round(rate, 1),
            "walls_s": [round(w, 3) for w in walls]}


def main():
    rows = []
    grid = [
        dict(micro=8, remat="attn"),
        dict(micro=16, remat="attn"),
        dict(micro=32, remat="attn"),
        dict(micro=8, remat=False),
        dict(micro=16, remat=False),
    ]
    for g in grid:
        print(f"=== leg {g} ===", flush=True)
        proc = subprocess.run(
            [sys.executable, "-u", os.path.abspath(__file__),
             "--leg", str(g["micro"]), str(g["remat"])],
            cwd=REPO, capture_output=True, text=True, timeout=1800,
        )
        sys.stdout.write(proc.stdout)
        row = None
        for line in proc.stdout.splitlines():
            if line.startswith(MARK):
                row = json.loads(line[len(MARK):])
        if row is None:
            tail = (proc.stderr.strip().splitlines() or ["no stderr"])[-1]
            print(f"[micro={g['micro']} remat={g['remat']}] FAILED "
                  f"(rc={proc.returncode}): {tail[:300]}", flush=True)
            row = {**{k: str(v) for k, v in g.items()},
                   "error": f"rc={proc.returncode}: {tail[:300]}"}
        rows.append(row)
        with open(os.path.join(REPO, "traces/r5_vtpl_ssl_ladder.json"),
                  "w") as f:
            json.dump(rows, f, indent=2)
    print(json.dumps(rows, indent=2), flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--leg":
        micro = int(sys.argv[2])
        remat = False if sys.argv[3] == "False" else sys.argv[3]
        try:
            row = leg(micro=micro, remat=remat)
        except Exception as e:  # noqa: BLE001
            row = {"micro": str(micro), "remat": str(remat),
                   "error": str(e)[:300]}
        print(MARK + json.dumps(row), flush=True)
    else:
        main()
