"""DiT-XL/1 gradient-accumulation bench (round 3b).

The train-step trace shows ~35 ms/step of fp32 optimizer/EMA fusions at
the HBM bandwidth floor (675M-param state). The reference trains at
global batch 1024 (generation/configs/train_vtp_l_dit_xl.yaml); on an
8-chip pod that's B=32 x accum 4 per chip, so accumulation is the
realistic shape — and it amortizes the optimizer: per-image cost
asymptotes to the microbatch compute (232 ms / 32 img ≈ 138 img/s).
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from vtp_tpu.utils.env import apply_jax_platforms_env

apply_jax_platforms_env()

import jax

from vtp_tpu.dit.model import make_dit_config
from vtp_tpu.dit.train import DiTTrainConfig, build_dit_train_step, init_dit_state

print(f"device: {jax.devices()[0]}", flush=True)
cfg = make_dit_config("DiT-XL/1")
B = 32


def measure(accum, iters=6, unroll=True, accum_dtype="bf16"):
    """Host-driven accumulation (build_dit_microbatch_steps): the
    in-jit scan variant OOMs XLA's HBM plan at DiT-XL (both unrolled
    and scanned depth — scanned measured 23.9 MB over), and the fp32
    host accumulator (2.7 GB) next to the 10.8 GB train state makes
    XLA drop donation aliasing and OOM too — bf16 accumulation fits."""
    from vtp_tpu.dit.train import (
        build_dit_microbatch_steps,
        zero_grad_accumulators,
    )

    tcfg = DiTTrainConfig(remat="attn", unroll_layers=unroll,
                          accum_steps=accum, accum_dtype=accum_dtype)
    state = init_dit_state(jax.random.key(0), cfg, tcfg)
    shape = (B, cfg.in_channels, cfg.input_size, cfg.input_size)
    lat = jax.random.normal(jax.random.key(1), shape)
    lab = jax.random.randint(jax.random.key(2), (B,), 0, cfg.num_classes)

    if accum == 1:
        step = jax.jit(build_dit_train_step(cfg, tcfg), donate_argnums=(0,))

        def run(state, key):
            return step(state, lat, lab, key)
    else:
        micro, apply_ = build_dit_microbatch_steps(cfg, tcfg)
        micro = jax.jit(micro, donate_argnums=(1, 2))
        apply_ = jax.jit(apply_, donate_argnums=(0, 1, 2))

        def run(state, key):
            keys = jax.random.split(key, accum)
            g_sum, m_sum = zero_grad_accumulators(state["params"], tcfg)
            for i in range(accum):
                g_sum, m_sum = micro(state["params"], g_sum, m_sum,
                                     lat, lab, keys[i])
            return apply_(state, g_sum, m_sum)

    t0 = time.perf_counter()
    state, m = run(state, jax.random.key(3))
    print(f"  compile+first {time.perf_counter()-t0:.1f}s "
          f"loss={float(m['loss/transport']):.4f}", flush=True)
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = run(state, jax.random.key(4 + i))
    _ = float(m["loss/transport"])
    dt = (time.perf_counter() - t0) / iters
    imgs = B * accum
    print(f"  accum={accum} unroll={unroll}: {dt*1e3:.1f} ms/step "
          f"({imgs} img) = {imgs/dt:.1f} img/s", flush=True)
    return imgs / dt


results = {}
for accum in [1, 2, 4, 8]:
    tag = f"accum{accum}"
    print(f"== {tag}", flush=True)
    try:
        results[tag] = measure(accum)
    except Exception as e:
        print(f"  FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
        results[tag] = None
print(json.dumps(results), flush=True)
print("DONE", flush=True)
