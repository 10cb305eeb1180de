"""bf16 Adam moments (train/optim.py) vs fp32, measured on the real chip.

Targets the two measured optimizer/EMA HBM-floor buckets:
- DiT-XL/1 train step (675M fp32 state; optimizer bucket ~35 ms/step
  of 266.8 — PERF.md round 3b),
- VTP-B CLIP+rec step (295.6M state; optimizer bucket ~23 ms of 149.6).

Also probes whether the 2.7 GB of freed state lets the fp32 grad
accumulator fit at DiT-XL (it OOMed with fp32 moments — PERF.md).
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from vtp_tpu.utils.env import apply_jax_platforms_env

apply_jax_platforms_env()

import jax

print(f"device: {jax.devices()[0]}", flush=True)

results = {}


def bench_dit(moment_dtype, B=64, iters=12):
    from vtp_tpu.dit.model import make_dit_config
    from vtp_tpu.dit.train import DiTTrainConfig, build_dit_train_step, init_dit_state

    cfg = make_dit_config("DiT-XL/1")
    tcfg = DiTTrainConfig(remat="attn", unroll_layers=True,
                          moment_dtype=moment_dtype)
    state = init_dit_state(jax.random.key(0), cfg, tcfg)
    step = jax.jit(build_dit_train_step(cfg, tcfg), donate_argnums=(0,))
    lat = jax.random.normal(jax.random.key(1), (B, cfg.in_channels,
                                                cfg.input_size, cfg.input_size))
    lab = jax.random.randint(jax.random.key(2), (B,), 0, cfg.num_classes)
    t0 = time.perf_counter()
    state, m = step(state, lat, lab, jax.random.key(3))
    print(f"  compile+first {time.perf_counter()-t0:.1f}s "
          f"loss={float(m['loss/transport']):.4f}", flush=True)
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, lat, lab, jax.random.key(4 + i))
    _ = float(m["loss/transport"])
    dt = (time.perf_counter() - t0) / iters
    print(f"  dit moment={moment_dtype} B={B}: {dt*1e3:.1f} ms/step, "
          f"{B/dt:.1f} img/s", flush=True)
    del state, step, lat, lab
    return B / dt


def bench_cliprec(moment_dtype, B=32, iters=10):
    from vtp_tpu.config import PRESETS
    from vtp_tpu.train.step import TrainConfig, build_train_step, init_state

    cfg = PRESETS["vtp-base"]()
    tcfg = TrainConfig(train_ssl=False, remat=False, unroll_layers=True,
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
    print(f"  cliprec moment={moment_dtype} B={B}: {dt*1e3:.1f} ms/step, "
          f"{B/dt:.1f} img/s", flush=True)
    del state, step, batch
    return B / dt


def probe_fp32_accum_with_bf16_moments(B=32, accum=4):
    """With bf16 moments, does the fp32 accumulator fit at DiT-XL?"""
    from vtp_tpu.dit.model import make_dit_config
    from vtp_tpu.dit.train import (
        DiTTrainConfig, build_dit_microbatch_steps, init_dit_state,
        run_accum_step, zero_grad_accumulators,
    )
    import numpy as np

    cfg = make_dit_config("DiT-XL/1")
    tcfg = DiTTrainConfig(remat="attn", unroll_layers=True,
                          accum_steps=accum, accum_dtype="fp32",
                          moment_dtype="bf16")
    state = init_dit_state(jax.random.key(0), cfg, tcfg)
    micro_raw, apply_raw = build_dit_microbatch_steps(cfg, tcfg)
    micro = jax.jit(micro_raw, donate_argnums=(1, 2))
    apply_ = jax.jit(apply_raw, donate_argnums=(0, 1, 2))
    lat = np.random.default_rng(0).normal(
        size=(accum, B, cfg.in_channels, cfg.input_size, cfg.input_size)
    ).astype("float32")
    lab = np.zeros((accum, B), dtype="int32")
    t0 = time.perf_counter()
    state, m = run_accum_step(micro, apply_, tcfg, state, lat, lab,
                              jax.random.key(1))
    print(f"  accum fp32+bf16mom compile+first {time.perf_counter()-t0:.1f}s "
          f"loss={float(m['loss/transport']):.4f}", flush=True)
    iters = 4
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = run_accum_step(micro, apply_, tcfg, state, lat, lab,
                                  jax.random.key(2 + i))
    _ = float(m["loss/transport"])
    dt = (time.perf_counter() - t0) / iters
    imgs = accum * B / dt
    print(f"  dit accum={accum} fp32-accum bf16-moments: {dt*1e3:.1f} ms, "
          f"{imgs:.1f} img/s", flush=True)
    return imgs


for name, fn in [
    ("dit_b64_fp32", lambda: bench_dit("fp32")),
    ("dit_b64_bf16", lambda: bench_dit("bf16")),
    ("cliprec_b32_fp32", lambda: bench_cliprec("fp32")),
    ("cliprec_b32_bf16", lambda: bench_cliprec("bf16")),
    ("dit_accum4_fp32accum_bf16mom", probe_fp32_accum_with_bf16_moments),
]:
    print(f"== {name}", flush=True)
    try:
        results[name] = round(fn(), 1)
    except Exception as e:
        print(f"  FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
        results[name] = None

print(json.dumps(results), flush=True)
print("DONE", flush=True)
