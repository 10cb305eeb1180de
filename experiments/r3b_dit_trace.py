"""Trace the DiT-XL/1 sampling forward on v5e (round 3b).

r3_dit_sample_bench measured 65.1 ms per euler step at B=32 (~112 TF/s,
57% of bf16 peak). head_dim = 1152/16 = 72 misses the fused attention
kernel (32/64/128 only), so sampling runs the unfused SDPA fallback
with sub-128-lane (B,H,N,72) layouts — the exact dataflow tax the VTP
towers paid before the fused kernel (CLAUDE.md). This traces a short
sampler run and prints the per-euler-step op breakdown to see where
the 43% headroom actually is.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vtp_tpu.utils.env import apply_jax_platforms_env

apply_jax_platforms_env()

import jax
import jax.numpy as jnp
import numpy as np

from vtp_tpu.dit.model import init_dit_params, make_dit_config
from vtp_tpu.dit.sample import make_sampler
from vtp_tpu.utils.params import cast_matmul_params

NUM_STEPS = 25
BATCH = 32
TRACE_DIR = "/root/repo/traces/r3b_dit_sample"


def main():
    print("devices:", jax.devices())
    cfg = make_dit_config("DiT-XL/1")
    params = init_dit_params(jax.random.key(0), cfg)
    params = cast_matmul_params(params, jnp.bfloat16)
    params = jax.device_put(params)

    sampler = make_sampler(cfg, num_steps=NUM_STEPS)
    labels = jnp.asarray(np.arange(BATCH) % cfg.num_classes)
    key = jax.random.key(0)

    out = sampler(params, key, labels)
    _ = float(out.ravel()[0].astype(jnp.float32))
    print("compiled + first run done")

    with jax.profiler.trace(TRACE_DIR):
        out = sampler(params, jax.random.fold_in(key, 1), labels)
        _ = float(out.ravel()[0].astype(jnp.float32))
    print("trace written to", TRACE_DIR)

    import glob

    from vtp_tpu.utils.xplane import exclusive_op_summary, parse_xspace

    pb = sorted(glob.glob(TRACE_DIR + "/**/*.xplane.pb", recursive=True))[-1]
    planes = parse_xspace(open(pb, "rb").read())
    rows = exclusive_op_summary(planes)
    total = sum(r["total_ms"] for r in rows)
    print(f"\ntotal exclusive: {total:.1f} ms over {NUM_STEPS} euler steps "
          f"= {total/NUM_STEPS:.2f} ms/step (bench said 65.1)")
    print(f"\ntop ops (ms per euler step):")
    for r in rows[:45]:
        print(f"{r['total_ms']/NUM_STEPS:8.3f} x{r['count']//NUM_STEPS:<4} "
              f"{r['mean_us']:7.1f}us  {r['name'][:120]}")


if __name__ == "__main__":
    main()
